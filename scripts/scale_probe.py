"""Scale probe: replicate the sf0.1 tables 10x (~sf1) into a scratch
dir with shifted keys, then time the heaviest headline queries at both
scales on identical session conf.

The point is the SLOPE, not the absolute numbers: a plan that survives
100 TB shows ~linear wall-clock in input size (scan-bound, map-side
combinable aggregation, broadcast or banded joins), while an
accidentally quadratic or shuffle-fat plan blows past 10x. Results are
recorded in PERFORMANCE.md.

Usage: python scripts/scale_probe.py [--rebuild] [--x100]

--x100 adds a third decade: a 100x replica (~sf10, lineitem 60M rows)
built from the 10x replica by a second-level key shift, probed with
the TOP-5 heaviest plans only (the local[32]/128 GiB box holds it; the
full query list would just repeat the sf1 evidence at 10x the wait).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from binance_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_probe_sf1"
DST100 = "/tmp/scale_probe_sf10"
COPIES = 10

# --x100 probes this subset (the five heaviest/most shuffle-exposed
# batch plans: scan-agg, broadcast dim chain, 3-table SQL join-agg,
# keyed window, full-corpus hash dedup).
TOP5 = [
    "agg_pricing_summary",
    "join_inner_broadcast",
    "sql_q3_topk",
    "win_running_sum",
    "dedup_exact",
]

# Key columns to shift per replica so joins/dedup keep realistic
# cardinality instead of 10 exact copies of every key.
KEY_SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": [],  # doc_id is a string key; replicas get a suffix
    "embeddings": ["vec_id"],
    # dims stay as-is: 10x replicated dims would break FK semantics
}

QUERIES = [
    "agg_pricing_summary",
    "join_inner_broadcast",
    "sql_q3_topk",
    "win_running_sum",
    "dedup_exact",  # full corpus, no cap
    "text_inverted_index",  # full corpus
    "stats_chi2_drift",
    # round-3 additions: substring-level dedup and the n-gram
    # decontamination check, both uncapped full-corpus token streams.
    "text_substring_dedup",
    "dedup_decontaminate",
    "text_quality_classifier",
]


def minhash_full(spark, sf_dir: str):
    """UNCAPPED minhash-LSH self-dedup via the operator layer (the
    registry query caps doc_id for oracle tractability; the operators
    are the scale path)."""
    from binance_etl_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", D.shingles(F.col("text")).alias("sh")
    )
    sig = D.minhash_signature(docs.select("doc_id", "sh"), "doc_id", "sh")
    bands = D.lsh_bands(sig, "doc_id")
    a = bands.select(
        F.col("doc_id").alias("a_id"), "band_no", "band_val"
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), "band_no", "band_val"
    )
    return (
        a.join(b, ["band_no", "band_val"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def build(spark) -> None:
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    for t in ["region", "nation", "supplier", "part"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    # ONE shift for every key column: FK pairs (o_custkey = c_custkey,
    # l_orderkey = o_orderkey) must move together or replica i's facts
    # dangle against replica i's dims and the join output collapses to
    # 1x — which would fake sub-linear slopes. 10^8 clears every key
    # range at sf0.1 (max key ~600k).
    shift = 100_000_000
    for t, keys in KEY_SHIFT.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        n = base.count()
        parts = []
        for i in range(COPIES):
            d = base
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(i * shift))
            if t == "documents":
                # doc_id is a numeric string compared as int downstream;
                # shift numerically and re-stringify.
                d = d.withColumn(
                    "doc_id",
                    (F.col("doc_id").cast("bigint") + F.lit(i * shift)).cast(
                        "string"
                    ),
                )
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"built {t}: {n} -> {n * COPIES} rows")


def build_x100(spark) -> None:
    """100x replica from the 10x one: second-level key shift (stride
    10^10 clears the 10x key range of ~9x10^8 + 600k), same FK-pair
    discipline — replica (i, j) facts join replica (i, j) dims only."""
    shutil.rmtree(DST100, ignore_errors=True)
    os.makedirs(DST100, exist_ok=True)
    for t in ["region", "nation", "supplier", "part"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST100}/{t}.parquet")
    shift2 = 10_000_000_000
    for t, keys in KEY_SHIFT.items():
        base = spark.read.parquet(f"{DST}/{t}.parquet")
        for j in range(COPIES):
            d = base
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(j * shift2))
            if t == "documents":
                d = d.withColumn(
                    "doc_id",
                    (F.col("doc_id").cast("bigint") + F.lit(j * shift2)).cast("string"),
                )
            d.write.mode("append").parquet(f"{DST100}/{t}.parquet")
        n = spark.read.parquet(f"{DST100}/{t}.parquet").count()
        print(f"built x100 {t}: {n} rows")


def run(spark, sf_dir: str, names=None) -> dict[str, tuple[float, int]]:
    """(best-of-3 wall clock, output rows) per query — the row count
    proves the replicated FK joins actually produce 10x output rather
    than dangling."""
    out = {}
    fns = {name: REGISTRY[name].fn for name in (names or QUERIES)}
    if names is None:
        fns["minhash_lsh_fullcorpus"] = minhash_full
    for name, fn in fns.items():
        rows = fn(spark, sf_dir).count()  # warm (plan + page cache)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.select([F.xxhash64(c).alias(c) for c in df.columns]).agg(
                F.count(F.lit(1))
            ).collect()
            best = min(best, time.time() - t0)
        out[name] = (round(best, 2), rows)
    return out


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_loaded()
    if "--rebuild" in sys.argv or not os.path.isdir(DST):
        build(spark)
    if "--x100" in sys.argv:
        if "--rebuild" in sys.argv or not os.path.isdir(DST100):
            build_x100(spark)
        mid = run(spark, DST, TOP5)
        big = run(spark, DST100, TOP5)
        hdr = f"\n{'query':30s} {'sf~1':>7s} {'sf~10':>7s} {'slope':>6s} {'rows~1':>10s} {'rows~10':>11s}"
        print(hdr)
        for name in mid:
            (t0, r0), (t1, r1) = mid[name], big[name]
            slope = t1 / max(t0, 0.01)
            print(f"{name:30s} {t0:7.2f} {t1:7.2f} {slope:5.1f}x {r0:10d} {r1:11d}")
        return
    small = run(spark, SRC)
    big = run(spark, DST)
    hdr = f"\n{'query':30s} {'sf0.1':>7s} {'sf~1':>7s} {'slope':>6s} {'rows0.1':>10s} {'rows~1':>11s}"
    print(hdr)
    for name in small:
        (t0, r0), (t1, r1) = small[name], big[name]
        slope = t1 / max(t0, 0.01)
        print(f"{name:30s} {t0:7.2f} {t1:7.2f} {slope:5.1f}x {r0:10d} {r1:11d}")


if __name__ == "__main__":
    main()
