"""Scalar/window surface extensions: distribution window functions,
string-distance functions, extended array ops, decimal VWAP over the
replay trades table."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register


@register(
    "win_dist_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(dense_rank() OVER (PARTITION BY o_orderstatus
                ORDER BY o_orderpriority) AS BIGINT) AS prio_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution window functions: ntile/percent_rank/cume_dist/"
    "dense_rank. percent_rank = (rank-1)/(n-1): identical integer-"
    "derived doubles in both engines.",
    tags=("window",),
)
def win_dist_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wp = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.dense_rank().over(wp).cast("bigint").alias("prio_rank"),
    )


@register(
    "fn_string_distance",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INT) AS edit_dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 4
    """,
    doc="String-distance candidate pairing: levenshtein over nation-name "
    "pairs (typo-dedup primitive; at corpus scale run behind a "
    "length/prefix blocking key, same pattern as minhash banding).",
    tags=("scalar", "dedup"),
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    a = n.select(F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_nationkey").alias("kb"), F.col("n_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, F.col("ka") < F.col("kb"))
        .where(dist <= 4)
        .select("name_a", "name_b", dist.cast("int").alias("edit_dist"))
    )


@register(
    "fn_array_suite2",
    oracle="""
    SELECT vec_id,
           CAST(list_sort(embedding[1:5])[1] AS DOUBLE) AS sorted_head_min,
           CAST(list_reverse_sort(embedding[1:3])[1] AS DOUBLE) AS rev_head_max,
           CAST(list_sum(list_transform(embedding[1:3] || embedding[62:64],
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
             AS BIGINT) AS head_tail_sum_e6,
           list_contains(list_transform(embedding, x -> x > 0.2), TRUE) AS any_big,
           len(list_filter(generate_series(1, len(embedding)),
               i -> embedding[i] > 0.0 AND i % 2 = 0)) AS n_pos_even
    FROM embeddings WHERE vec_id < 100
    """,
    doc="Extended array ops: sort_array asc/desc, concat/slice, "
    "exists-predicate, index-aware filter. Array results leave the "
    "query as scalar witnesses (sorted extrema + an e6 checksum of "
    "the concat/slice) so the output schema stays in the "
    "double/bigint/string set the driver hasher is proven on.",
    tags=("scalar", "array"),
)
def fn_array_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.element_at(F.sort_array(F.slice(emb, 1, 5)), 1)
        .cast("double")
        .alias("sorted_head_min"),
        F.element_at(F.sort_array(F.slice(emb, 1, 3), asc=False), 1)
        .cast("double")
        .alias("rev_head_max"),
        F.aggregate(
            F.transform(
                F.concat(F.slice(emb, 1, 3), F.slice(emb, 62, 3)),
                lambda x: F.floor(x.cast("double") * 1_000_000).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda a, v: a + v,
        ).alias("head_tail_sum_e6"),
        F.exists(emb, lambda x: x > 0.2).alias("any_big"),
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.size(emb)),
                lambda i: (F.element_at(emb, i) > 0.0) & (i % 2 == 0),
            )
        ).alias("n_pos_even"),
    )


@register(
    "trades_vwap",
    oracle="""
    WITH frames(frame, arrival_ms) AS {values},
    ok AS (SELECT CASE WHEN json_valid(frame) THEN frame END AS f, arrival_ms FROM frames),
    trades AS (
      -- DECIMAL(19,8): one digit wider than Spark's (18,8) so DuckDB
      -- stores the mantissa in int128 (width 18 = int64, whose product
      -- overflows); the product (38,16) is exact in both engines.
      SELECT CASE WHEN CAST(json_extract(f, '$.m') AS BOOLEAN) THEN 'sell' ELSE 'buy' END AS side,
             CAST(json_extract_string(f, '$.p') AS DECIMAL(19,8)) AS price,
             CAST(json_extract_string(f, '$.q') AS DECIMAL(19,8)) AS quantity
      FROM ok WHERE json_extract_string(f, '$.e') = 'trade'
    )
    SELECT side,
           CAST(SUM(CAST(price * quantity AS DECIMAL(38,16))) AS DOUBLE) AS turnover,
           CAST(SUM(quantity) AS DOUBLE) AS volume,
           CAST(SUM(CAST(price * quantity AS DECIMAL(38,16))) AS DOUBLE)
                / CAST(SUM(quantity) AS DOUBLE) AS vwap
    FROM trades GROUP BY side
    """,
    doc="Decimal VWAP per side over the replay trades table — the "
    "money-type policy (reference spot_trades_etl.py:52-53) proven "
    "through source -> parse -> exact-decimal aggregation. Binance "
    "decimals are 8-fractional-digit, so DECIMAL(18,8) products are "
    "EXACT (36 digits) in both engines — no rounding anywhere.",
    tags=("market", "agg", "streaming-analog"),
)
def trades_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.sources import fixtures as FX
    from binance_etl_spark.sources.replay import read_replay
    from binance_etl_spark.streaming.parse import parse_trades

    paths = FX.write_fixtures(tempfile.mkdtemp(prefix="besk_vwap_"))
    trades = parse_trades(read_replay(spark, paths["trades"]))
    p8 = F.col("price").cast("decimal(18,8)")
    q8 = F.col("quantity").cast("decimal(18,8)")
    turnover = F.sum((p8 * q8).cast("decimal(38,16)"))
    volume = F.sum(q8)
    return trades.groupBy("side").agg(
        turnover.cast("double").alias("turnover"),
        volume.cast("double").alias("volume"),
        (turnover.cast("double") / volume.cast("double")).alias("vwap"),
    )


@register(
    "trades_twap",
    oracle="""
    WITH frames(frame, arrival_ms) AS {values},
    ok AS (SELECT CASE WHEN json_valid(frame) THEN frame END AS f FROM frames),
    trades AS (
      SELECT CASE WHEN CAST(json_extract(f, '$.m') AS BOOLEAN) THEN 'sell' ELSE 'buy' END AS side,
             CAST(json_extract(f, '$.E') AS BIGINT) AS ts_ms,
             CAST(json_extract(f, '$.t') AS BIGINT) AS id,
             CAST(json_extract_string(f, '$.p') AS DECIMAL(19,8)) AS price
      FROM ok WHERE json_extract_string(f, '$.e') = 'trade'
    ), spans AS (
      SELECT side, price,
             LEAD(ts_ms) OVER (PARTITION BY side ORDER BY ts_ms, id) - ts_ms AS dt_ms
      FROM trades
    )
    SELECT side,
           CAST(SUM(dt_ms) AS BIGINT) AS held_ms,
           CAST(SUM(CAST(price * dt_ms AS DECIMAL(38,8))) AS DOUBLE)
             / CAST(SUM(dt_ms) AS DOUBLE) AS twap
    FROM spans WHERE dt_ms IS NOT NULL
    GROUP BY side
    """,
    doc="Time-weighted average price per side: each trade's price is "
    "weighted by how long it stood (lead(ts) - ts within side, trade-id "
    "tie-break; the still-open last span is excluded). The companion to "
    "trades_vwap (volume-weighted): TWAP is the execution-quality "
    "benchmark, VWAP the liquidity one. price DECIMAL(18,8) x BIGINT "
    "ms is exact in both engines, so the weighted sum is order-free; "
    "one window pass + one aggregate.",
    tags=("market", "window", "agg", "streaming-analog"),
)
def trades_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.sources import fixtures as FX
    from binance_etl_spark.sources.replay import read_replay
    from binance_etl_spark.streaming.parse import parse_trades

    paths = FX.write_fixtures(tempfile.mkdtemp(prefix="besk_twap_"))
    trades = parse_trades(read_replay(spark, paths["trades"]))
    w = Window.partitionBy("side").orderBy("timestamp", "id")
    spans = trades.select(
        "side",
        F.col("price").cast("decimal(18,8)").alias("price"),
        (F.lead("timestamp").over(w) - F.col("timestamp")).alias("dt_ms"),
    ).where(F.col("dt_ms").isNotNull())
    wsum = F.sum((F.col("price") * F.col("dt_ms")).cast("decimal(38,8)"))
    held = F.sum("dt_ms")
    return spans.groupBy("side").agg(
        held.cast("bigint").alias("held_ms"),
        (wsum.cast("double") / held.cast("double")).alias("twap"),
    )


def _patch_market_oracles() -> None:
    from binance_etl_spark.plans.registry import REGISTRY
    from binance_etl_spark.plans.streaming_analog import _sql_frame_values
    from binance_etl_spark.sources import fixtures as FX

    values = _sql_frame_values(FX.trade_frames())
    for name in ("trades_vwap", "trades_twap"):
        q = REGISTRY[name]
        q.oracle = q.oracle.format(values=values)


_patch_market_oracles()
