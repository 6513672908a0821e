"""Scalar function surface (SURVEY.md §2.9) — string/datetime/math/array/
map/json/conditional suites, each oracle-checked.

All expressions are JVM built-ins inside whole-stage codegen — no Python
in the hot path.  Parity notes: dayofweek differs by one between engines
(Spark 1=Sunday, DuckDB 0=Sunday); doubles only flow through IEEE-exact
ops (+,-,*,/, sqrt, abs, floor, ceil) so values are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register


@register(
    "fn_string_suite",
    oracle="""
    SELECT doc_id,
           upper(lang) AS lang_u,
           length(text) AS len_chars,
           len(string_split(text, ' ')) AS n_tokens,
           substr(text, 1, 12) AS prefix,
           CASE WHEN text LIKE '%spark%' THEN TRUE ELSE FALSE END AS has_spark,
           len(regexp_extract_all(text, 'data')) AS n_data,
           trim(concat(source, ' ', lang)) AS src_lang,
           replace(lang, 'e', 'E') AS lang_repl
    FROM documents WHERE doc_id < 200
    """,
    doc="String suite: split/upper/length/substr/like/regexp/trim/concat/"
    "replace (reference string ops: factory.py:14 split, book_utils.py:29 "
    "upper, storage.py:57-59 concat).",
    tags=("scalar",),
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_u"),
        F.length("text").alias("len_chars"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.substring("text", 1, 12).alias("prefix"),
        F.col("text").like("%spark%").alias("has_spark"),
        F.size(F.expr("regexp_extract_all(text, 'data', 0)")).alias("n_data"),
        F.trim(F.concat_ws(" ", "source", "lang")).alias("src_lang"),
        F.regexp_replace("lang", "e", "E").alias("lang_repl"),
    )


@register(
    "fn_datetime_suite",
    oracle="""
    SELECT event_id,
           epoch_ms(ts) AS ts_ms,
           epoch_us(date_trunc('hour', ts)) AS hour_us,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS d,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(minute(ts) AS INT) AS minute_of_hour,
           strftime(ts, '%Y-%m-%d') AS date_str,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS date_only
    FROM events WHERE event_id < 2000
    """,
    doc="Datetime suite: epoch conversion (reference ms-epoch arithmetic, "
    "base.py:52, spot_depth_etl.py:116), truncation, field extraction, "
    "formatting. Engine policy: event time is TimestampType UTC; "
    "ms-epoch longs at the edges.",
    tags=("scalar",),
)
def fn_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.dayofweek("ts").alias("dow"),
        F.minute("ts").alias("minute_of_hour"),
        F.date_format("ts", "yyyy-MM-dd").alias("date_str"),
        # ISO string, not DateType: engine-native DATE objects normalize
        # differently across the two clients' pandas paths (the round-1
        # decimal-hash lesson applied to dates).
        F.to_date("ts").cast("string").alias("date_only"),
    )


@register(
    "fn_math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           abs(l_discount - 0.05) AS abs_delta,
           CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
           l_orderkey % 7 AS key_mod,
           sqrt(l_quantity) AS qty_sqrt,
           greatest(l_quantity, 25.0) AS qty_hi,
           least(l_quantity, 25.0) AS qty_lo,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE l_quantity / (l_linenumber - 1) END AS safe_div
    FROM lineitem WHERE l_orderkey < 500
    """,
    doc="Math suite over IEEE-exact ops (+,-,*,/, sqrt, abs, floor, ceil, "
    "mod, greatest/least) plus try_divide null-on-zero (reference id "
    "arithmetic, spot_depth_etl.py:86,116).",
    tags=("scalar",),
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_delta"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_lo"),
        F.try_divide(F.col("l_quantity"), F.col("l_linenumber") - 1).alias("safe_div"),
    )


@register(
    "fn_array_suite",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_val,
           embedding[len(embedding)] AS last_val,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000000) AS BIGINT)))
                AS BIGINT) AS sq_norm_e12,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings WHERE vec_id < 200
    """,
    doc="Array suite: size/element_at/aggregate/transform/filter over the "
    "embedding vector column. Sum-of-squares accumulates in DECIMAL so "
    "the fold is order-independent and engine-exact.",
    tags=("scalar", "array"),
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.element_at("embedding", -1).alias("last_val"),
        # Sum-of-squares in e-12 integer units: floor on IEEE-exact double
        # products is engine-portable; long addition is order-independent.
        F.expr(
            "aggregate(embedding, CAST(0 AS BIGINT), "
            "(acc, x) -> acc + CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000000) AS BIGINT))"
        ).alias("sq_norm_e12"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "fn_map_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           1 AS n_keys
    FROM events WHERE event_id < 2000
    """,
    doc="Map suite: props JSON parsed to MapType; element_at + map_keys "
    "(events.props is a one-key object in the fixtures).",
    tags=("scalar", "map"),
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "fn_json_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_extracted,
           json_extract_string(props, '$.k') AS k_str,
           CAST(to_json(struct_pack(event_id := event_id, k := CAST(json_extract(props, '$.k') AS BIGINT)))
             AS VARCHAR) AS packed
    FROM events WHERE event_id < 1000
    """,
    doc="JSON suite: from_json/get_json_object/to_json (the reference's "
    "whole parse layer is json.loads, spot_trades_etl.py:45).",
    tags=("scalar", "json"),
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id",
        k.alias("k_extracted"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.to_json(F.struct(F.col("event_id"), k.alias("k"))).alias("packed"),
    )


@register(
    "fn_cond_suite",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'P'), 'unknown') AS status_or_unknown,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS size_bucket,
           if(o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%', TRUE, FALSE) AS is_urgent
    FROM orders WHERE o_orderkey < 3000
    """,
    doc="Conditional suite: coalesce/nullif/multi-branch case/if.",
    tags=("scalar",),
)
def fn_cond_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("unknown")).alias(
            "status_or_unknown"
        ),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_bucket"),
        (
            F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%")
        ).alias("is_urgent"),
    )


@register(
    "fn_from_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
    doc="from_json with explicit schema -> typed aggregation over an "
    "extracted field (the engine's version of the reference's "
    "deserialize-then-use pattern).",
    tags=("scalar", "json", "agg"),
)
def fn_from_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT")["k"]
    return e.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


@register(
    "explode_levels",
    oracle="""
    WITH pos AS (
      SELECT vec_id, embedding,
             UNNEST(generate_series(1, len(embedding))) AS i
      FROM embeddings WHERE vec_id < 50
    )
    SELECT vec_id, CAST(i - 1 AS INT) AS pos, embedding[i] AS val
    FROM pos
    """,
    doc="Array explode with position — the reference's levels-to-rows "
    "flattening (spot_depth_etl.py:93-110: each [price,qty] pair becomes "
    "a row). posexplode is a generator inside codegen; no shuffle.",
    tags=("explode",),
)
def explode_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))


@register(
    "udf_scalar_parse",
    oracle="""
    WITH raw(id, price) AS (
      VALUES (1, '598.10000000'), (2, '0.00050000'), (3, '600.00000000'),
             (4, '1234.56789000'), (5, '42.00000000'), (6, '0.12345678')
    )
    SELECT id,
           CASE WHEN contains(price, '.')
                THEN rtrim(rtrim(price, '0'), '.')
                ELSE price END AS price_norm,
           CAST(price AS DOUBLE) AS price_dec
    FROM raw
    """,
    doc="Arrow-vectorized pandas UDF normalizing Binance decimal strings "
    "(reference keeps p/q verbatim, spot_trades_etl.py:52-53). The UDF is "
    "the Python-extension path; the DECIMAL cast beside it is the "
    "engine-preferred JVM path.",
    tags=("udf",),
)
def udf_scalar_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _norm_series(s):
        def norm(v: str) -> str:
            if "." in v:
                v = v.rstrip("0").rstrip(".")
            return v

        return s.map(norm)

    # `from __future__ import annotations` stringifies hints, which the
    # pandas_udf hint-inference rejects — set real annotations explicitly.
    _norm_series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    norm_decimal_str = pandas_udf(_norm_series, "string")

    rows = [
        (1, "598.10000000"),
        (2, "0.00050000"),
        (3, "600.00000000"),
        (4, "1234.56789000"),
        (5, "42.00000000"),
        (6, "0.12345678"),
    ]
    df = spark.createDataFrame(rows, "id INT, price STRING")
    return df.select(
        "id",
        norm_decimal_str("price").alias("price_norm"),
        F.col("price").cast("decimal(38,18)").cast("decimal(27,8)").cast("double").alias("price_dec"),
    )
