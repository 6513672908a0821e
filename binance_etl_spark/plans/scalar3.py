"""Scalar batch 3: Spark 4 semi-structured VARIANT path, error-tolerant
try_* expressions, and the Arrow-native map surface.

- fn_variant_suite: VARIANT ingestion (parse_json / variant_get /
  try_parse_json) — the open-schema path for semi-structured event
  payloads: parse once into the binary VARIANT encoding, extract
  typed fields by path at query time (no rigid from_json schema).
- fn_try_suite: try_divide / try_add / try_multiply / try_cast /
  try_element_at — dirty-data arithmetic that degrades to NULL
  instead of failing the job (the posture a 100 TB ingest needs:
  one bad row must not kill a 6-hour pass).
- udf_arrow_map: mapInArrow — the zero-copy Arrow-batch UDF surface
  (completes the UDF matrix: pandas UDF / applyInPandas /
  applyInPandasWithState / UDTF / mapInPandas / mapInArrow).

Reference parity note: the reference engine drops malformed messages
ad hoc (base.py try/except around each frame); these suites are the
declarative equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.plans.registry import register

_LONG_MAX = 9_223_372_036_854_775_807


@register(
    "fn_variant_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS vk,
           CAST(json_extract_string(
             '{"u": ' || CAST(user_id AS VARCHAR) || ', "t": "' || event_type
               || '", "nested": ' || props || '}',
             '$.t') AS VARCHAR) AS vt,
           CAST(json_extract(
             '{"u": ' || CAST(user_id AS VARCHAR) || ', "t": "' || event_type
               || '", "nested": ' || props || '}',
             '$.nested.k') AS BIGINT) AS v_nested_k,
           TRY_CAST('x' || props AS JSON) IS NULL AS bad_is_null
    FROM events
    """,
    doc="Spark 4 VARIANT path: parse_json once into the binary "
    "variant encoding, variant_get typed extraction by path (top "
    "level + nested object built inline), try_parse_json -> NULL on "
    "malformed input. One narrow projection, fully JVM-side — the "
    "open-schema alternative to a rigid from_json StructType for "
    "evolving event payloads.",
    tags=("scalar", "variant", "json"),
)
def fn_variant_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    nested = F.concat(
        F.lit('{"u": '),
        F.col("user_id").cast("string"),
        F.lit(', "t": "'),
        F.col("event_type"),
        F.lit('", "nested": '),
        F.col("props"),
        F.lit("}"),
    )
    v = F.parse_json(F.col("props"))
    nv = F.parse_json(nested)
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("vk"),
        F.variant_get(nv, "$.t", "string").alias("vt"),
        F.variant_get(nv, "$.nested.k", "bigint").alias("v_nested_k"),
        F.try_parse_json(F.concat(F.lit("x"), "props")).isNull().alias("bad_is_null"),
    )


@register(
    "fn_try_suite",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(l_quantity - l_quantity, 0) AS div0,
           CASE WHEN l_orderkey = 0 THEN {_LONG_MAX}
                ELSE CAST(NULL AS BIGINT) END AS add_overflow,
           CASE WHEN l_orderkey = 0 THEN 0
                WHEN l_orderkey = 1 THEN {_LONG_MAX}
                ELSE CAST(NULL AS BIGINT) END AS mul_overflow,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           (['a', 'b'])[CAST(l_linenumber + 10 AS INT)] AS oob_elem
    FROM lineitem
    WHERE l_orderkey % 13 = 1
    """,
    doc="Error-tolerant expression suite: try_divide (/0 -> NULL), "
    "try_add / try_multiply (bigint overflow -> NULL; the add/multiply "
    "keep non-overflow witnesses at l_orderkey in {0, 1}), try_cast "
    "(non-numeric string -> NULL), try_element_at (out-of-bounds -> "
    "NULL). The declarative dirty-data posture: a poisoned row "
    "degrades to NULL instead of failing a 6-hour 100 TB pass. "
    "Oracle encodes the identical semantics via NULLIF/TRY_CAST/"
    "known-range case analysis.",
    tags=("scalar", "null-safety"),
)
def fn_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic 1/13 sample: each failing try_* op surfaces as a
    # caught JVM ArithmeticException PER ROW (measured 33s full-table
    # at sf0.1 — exception construction, not arithmetic, is the cost),
    # so the suite pins semantics on a slice instead of paying
    # exception overhead on every fact row. Production guidance: use
    # try_* on columns where failure is the EXCEPTION (bad rows), not
    # the rule — the happy path costs the same as the unchecked op.
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 13 == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", F.col("l_quantity") - F.col("l_quantity")).alias(
            "div0"
        ),
        F.try_add(F.lit(_LONG_MAX).cast("bigint"), F.col("l_orderkey")).alias(
            "add_overflow"
        ),
        F.try_multiply(F.col("l_orderkey"), F.lit(_LONG_MAX).cast("bigint")).alias(
            "mul_overflow"
        ),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.try_element_at(
            F.array(F.lit("a"), F.lit("b")), (F.col("l_linenumber") + 10).cast("int")
        ).alias("oob_elem"),
    )


@register(
    "udf_arrow_map",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_py,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
    FROM documents
    """,
    doc="mapInArrow surface: zero-copy Arrow RecordBatch in, Arrow "
    "RecordBatch out, computed with vectorized pyarrow.compute "
    "kernels (utf8_length / binary byte length / substring count) — "
    "no per-row Python, no pandas conversion. Completes the UDF "
    "matrix beside pandas UDF / applyInPandas / UDTF / mapInPandas / "
    "applyInPandasWithState. Narrow per-batch transform: "
    "embarrassingly parallel at any scale.",
    tags=("udf", "arrow"),
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    d = fanout(load(spark, sf_dir, "documents")).select("doc_id", "text")

    def batches(it):
        import pyarrow.compute as pc

        for batch in it:
            t = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(t), pa.int64()),
                    pc.cast(pc.binary_length(pc.cast(t, pa.binary())), pa.int64()),
                    pc.cast(pc.count_substring(t, " "), pa.int64()),
                ],
                names=["doc_id", "n_chars_py", "n_bytes", "n_spaces"],
            )

    return d.mapInArrow(
        batches,
        "doc_id bigint, n_chars_py bigint, n_bytes bigint, n_spaces bigint",
    )


@register(
    "fn_hof_suite",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(list_transform(t, x -> length(x)), x -> x > 4))
                AS BIGINT) AS n_long_tokens,
           CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS sum_len,
           len(list_filter(t, x -> x = 'spark')) > 0 AS has_spark,
           len(list_filter(list_transform(t, x -> length(x)), x -> x <= 0)) = 0
             AS all_positive,
           t[1] || ':' || CAST(length(t[1]) AS VARCHAR) AS first_pair
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    """,
    doc="Higher-order array function suite: transform / filter / "
    "exists / forall / aggregate / zip_with over the token array — "
    "the lambda surface the dedup and vector operators are built "
    "from, here pinned directly. Narrow per-row expressions, no "
    "shuffle; DuckDB mirrors each lambda with list_* equivalents.",
    tags=("scalar", "hof"),
)
def fn_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    lens = F.transform(toks, lambda x: F.length(x))
    return d.select(
        "doc_id",
        F.size(F.filter(lens, lambda x: x > 4)).cast("bigint").alias("n_long_tokens"),
        F.aggregate(
            lens, F.lit(0).cast("bigint"), lambda a, v: a + v
        ).alias("sum_len"),
        F.exists(toks, lambda x: x == "spark").alias("has_spark"),
        F.forall(lens, lambda x: x > 0).alias("all_positive"),
        F.element_at(
            F.zip_with(
                toks, lens, lambda t, l: F.concat(t, F.lit(":"), l.cast("string"))
            ),
            1,
        ).alias("first_pair"),
    )


@register(
    "fn_collation_suite",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS m
      FROM events
    )
    SELECT CAST(COUNT(DISTINCT lower(m)) AS BIGINT) AS n_distinct_ci,
           CAST(COUNT(DISTINCT m) AS BIGINT) AS n_distinct_cs,
           CAST(SUM(CASE WHEN lower(m) = 'click' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_click_ci
    FROM mixed
    """,
    doc="Spark 4 collation surface: UTF8_LCASE-collated distinct "
    "count and equality filter over a deliberately case-mixed column, "
    "against the case-sensitive baseline. Collation pushes the "
    "case-insensitivity into the comparator (hash/equality semantics) "
    "instead of a lower() projection — same plan shape, "
    "locale-correct semantics; oracle mirrors with lower().",
    tags=("scalar", "collation"),
)
def fn_collation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    mixed = F.when(F.col("event_id") % 2 == 0, F.upper("event_type")).otherwise(
        F.col("event_type")
    )
    ci = F.collate(mixed, "UTF8_LCASE")
    return e.select(mixed.alias("m"), ci.alias("mc")).agg(
        F.countDistinct("mc").cast("bigint").alias("n_distinct_ci"),
        F.countDistinct("m").cast("bigint").alias("n_distinct_cs"),
        F.sum((F.col("mc") == F.lit("click")).cast("bigint"))
        .cast("bigint")
        .alias("n_click_ci"),
    )
