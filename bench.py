"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed twice: a warm-up pass is NOT taken (we measure
first-run, plan+execute, like the driver would see), but the session,
JVM, and file-system cache are shared across queries — matching how a
long-lived engine serves a query stream.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from binance_etl_spark.session import get_spark


def materialize(df) -> int:
    """Force FULL execution of every output column, returning the row
    count. A bare count() lets Catalyst prune projections the count
    does not need (a scan-style query can degrade to a metadata-ish
    count), understating the work — so reduce a checksum over all
    columns instead, keeping the reduction distributed (no driver
    collect of the result set).
    """
    cols = [
        F.col(c).cast("string") if t.startswith("map") else F.col(c)
        for c, t in df.dtypes
    ]
    row = df.select(F.xxhash64(*cols).alias("__h")).agg(
        F.count("__h").alias("n"), F.expr("bit_xor(__h)").alias("checksum")
    ).first()
    return row["n"]

# Headline set: one per operator family, weighted toward the plans that
# dominate at 100 TB (scan-agg, multi-join, window, asof, dedup, ann).
HEADLINE = [
    "agg_pricing_summary",
    "join_inner_broadcast",
    "join_asof_events",
    "win_running_sum",
    "stream_ohlcv_bars",
    "book_rebuild",
    "win_session",
    "agg_pivot_case",
    "sort_topk",
    "scan_lineitem",
]
# LLM-pipeline headliners are appended once implemented (kept in one
# place so bench + SURVEY stay in sync).
HEADLINE_LLM = [
    "dedup_exact",
    "dedup_near_jaccard",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "sim_ann_ivf",
    "text_token_stats",
    "text_pack_sequences",
    "sql_q3_topk",
    # round-1 late additions: decorrelated scalar subquery, gap-fill
    # resample, iterative CC dedup clustering, vector centroids.
    "sub_scalar_corr",
    "ts_resample_ffill",
    "dedup_cluster_cc",
    "emb_centroid_label",
    "sql_q5_region_volume",
    "upsert_latest",
    "curate_corpus_e2e",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    spark = get_spark("besk-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup: trivial jobs only — no headline query or test
    # table is pre-executed, so per-query numbers are honest first runs.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(1, "x")], "a INT, b STRING").groupBy("b").count().collect()

    names = [n for n in HEADLINE + HEADLINE_LLM if n in REGISTRY]
    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = materialize(df)  # full-column execution, distributed reduce
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
