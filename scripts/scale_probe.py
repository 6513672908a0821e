"""Scale probe: replicate the sf0.1 tables 10x (~sf1) into a scratch
dir with shifted keys, then time the heaviest headline queries at both
scales on identical session conf.

The point is the SLOPE, not the absolute numbers: a plan that survives
100 TB shows ~linear wall-clock in input size (scan-bound, map-side
combinable aggregation, broadcast or banded joins), while an
accidentally quadratic or shuffle-fat plan blows past 10x. Results are
recorded in PERFORMANCE.md.

Usage: python scripts/scale_probe.py [--rebuild] [--x100] [--stages] [--llm10] [--ann] [--lake] [--sync]

--lake probes the lakehouse DELETE strategies at sf0.1 vs 10x docs:
bloom-pruned delete_keys (near-constant files opened), CoW full-scan
delete_where, and MOR delete_where_mor vs CoW under a spread
predicate (the rewrite-everything worst case).

--ann probes the ANN tier (sim_ann_pq / sim_ann_ivfpq /
sim_ann_recall) at sf0.1 vs 10x embeddings: the shuffle-free
encode/ADC scan must stay flat per row and recall@10 must hold.

--x100 adds a third decade: a 100x replica (~sf10, lineitem 60M rows)
built from the 10x replica by a second-level key shift, probed with
the TOP-5 heaviest plans only (the local[32]/128 GiB box holds it; the
full query list would just repeat the sf1 evidence at 10x the wait).

--stages runs the two second-decade >=3x-slope plans
(join_inner_broadcast, sql_q3_topk) at sf~1 AND sf~10 with the Spark
UI REST API on, and prints a PER-STAGE table (executor run time, input
bytes, shuffle read/write bytes). This is the scan-bound proof: if the
slope came from a shuffle blow-up, shuffle bytes would grow
superlinearly; if it is the fact-table scan, input bytes grow ~10x,
shuffle bytes stay ~linear, and the scan stage dominates run time.

--llm10 probes the LLM tier at second-decade document scale
(sf~1 -> sf~10 documents: 50k -> 500k docs): uncapped minhash-LSH
banding, substring-level gram dedup, and the inverted-index build.
"""

from __future__ import annotations

import json
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
    # round-6 assembly ops (documents-based, so the 10x replica applies)
    "corpus_shuffle_shards",
    "sample_mixture_weights",
    # round-6 microstructure tier (events-based keyed-window estimators)
    "ms_realized_vol",
    "ms_ofi_forward_returns",
    "ms_amihud_illiq",
    "ms_kyle_lambda",
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
                # shift numerically, then restore the SOURCE dtype —
                # downstream snapshot/DML probes key on doc_id and a
                # dtype flip vs sf0.1 breaks their key joins.
                d = d.withColumn(
                    "doc_id",
                    (F.col("doc_id").cast("bigint") + F.lit(i * shift)).cast(
                        dict(base.dtypes)["doc_id"]
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
                    (F.col("doc_id").cast("bigint") + F.lit(j * shift2)).cast(
                        dict(base.dtypes)["doc_id"]
                    ),
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


def _rest_json(spark, path: str):
    import json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def stage_breakdown(spark, name: str, sf_dir: str) -> list[dict]:
    """Run the named query once (measured, warm) under a job group and
    return per-stage metrics from the UI REST API."""
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).count()  # warm: plan + page cache
    group = f"probe-{name}-{os.path.basename(sf_dir)}"
    sc = spark.sparkContext
    sc.setJobGroup(group, name)
    try:
        df = fn(spark, sf_dir)
        df.select([F.xxhash64(c).alias(c) for c in df.columns]).agg(
            F.count(F.lit(1))
        ).collect()
    finally:
        sc.setJobGroup(None, None)
    stage_ids = set()
    for job in _rest_json(spark, "/jobs?status=succeeded"):
        if job.get("jobGroup") == group:
            stage_ids.update(job["stageIds"])
    rows = []
    for s in _rest_json(spark, "/stages?status=complete"):
        if s["stageId"] in stage_ids:
            rows.append(
                {
                    "stage": s["stageId"],
                    "tasks": s["numCompleteTasks"],
                    "run_ms": s["executorRunTime"],
                    "input_mb": round(s["inputBytes"] / 1e6, 1),
                    "shuf_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                    "shuf_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                    "name": s["name"].split("\n")[0][:40],
                }
            )
    return sorted(rows, key=lambda r: r["stage"])


def stages_main(spark) -> None:
    for name in ("join_inner_broadcast", "sql_q3_topk"):
        print(f"\n=== {name} ===")
        for sf_dir, label in ((DST, "sf~1"), (DST100, "sf~10")):
            rows = stage_breakdown(spark, name, sf_dir)
            tot = sum(r["run_ms"] for r in rows)
            print(f"-- {label} (total executor run {tot} ms)")
            print(
                f"{'stage':>5s} {'tasks':>5s} {'run_ms':>8s} {'input_MB':>9s} "
                f"{'shufR_MB':>9s} {'shufW_MB':>9s}  name"
            )
            for r in rows:
                print(
                    f"{r['stage']:5d} {r['tasks']:5d} {r['run_ms']:8d} "
                    f"{r['input_mb']:9.1f} {r['shuf_read_mb']:9.1f} "
                    f"{r['shuf_write_mb']:9.1f}  {r['name']}"
                )


# --llm10 probes: uncapped operator-layer paths at document scale
# (the registry twins cap doc_id for oracle tractability).
def substring_dedup_full(spark, sf_dir: str):
    """Uncapped gram-hash substring dedup (plans/llm_ops10.py op)."""
    from binance_etl_spark.plans.llm_ops10 import _gram_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    grams = _gram_stream(docs)
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
    )
    return grams.join(dup, "gram").select("doc_id", "gram").distinct()


def inverted_index_full(spark, sf_dir: str):
    """Full-corpus posting-list build via the registered plan."""
    return REGISTRY["text_inverted_index"].fn(spark, sf_dir)


def dsir_full(spark, sf_dir):
    """sample_dsir_select unmodified: output is top-50 capped but the
    WORK is O(corpus tokens) — the slope shows whether the fixed
    1024-bucket feature space keeps the two aggregates per-row flat."""
    return REGISTRY["sample_dsir_select"].fn(spark, sf_dir)


LLM10 = {
    "minhash_lsh_fullcorpus": minhash_full,
    "substring_dedup_full": substring_dedup_full,
    "inverted_index_full": inverted_index_full,
    "dsir_select_full": dsir_full,
}


def llm10_main(spark) -> None:
    out = {}
    for label, sf_dir in (("sf~1", DST), ("sf~10", DST100)):
        for name, fn in LLM10.items():
            rows = fn(spark, sf_dir).count()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.select([F.xxhash64(c).alias(c) for c in df.columns]).agg(
                    F.count(F.lit(1))
                ).collect()
                best = min(best, time.time() - t0)
            out[(name, label)] = (round(best, 2), rows)
    print(f"\n{'query':30s} {'sf~1':>8s} {'sf~10':>8s} {'slope':>6s} {'rows~1':>10s} {'rows~10':>11s}")
    for name in LLM10:
        (t0, r0) = out[(name, "sf~1")]
        (t1, r1) = out[(name, "sf~10")]
        print(f"{name:30s} {t0:8.2f} {t1:8.2f} {t1 / max(t0, 0.01):5.1f}x {r0:10d} {r1:11d}")


ANN = [
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "sim_ann_recall",
    "sim_ann_recall_learned",
    # persistent index lifecycle: 2 encode passes + 2 snapshot commits
    # + the codes-only serve scan — expected per-row-flat like the
    # inline PQ scan it shares the encode with.
    "sim_ann_index_lifecycle",
]


def ann_main(spark) -> None:
    """ANN-tier slope probe (VERDICT r5 item 5): PQ ADC scan, IVFPQ
    composite, and the recall gate at sf0.1 vs 10x embeddings.
    Healthy = the encode/ADC scan is shuffle-free and per-row flat
    (wall <= ~10x at 10x vectors; the fixed costs — K-row codebook
    collect, bounded centroid agg — amortize, so sub-10x slopes are
    expected), and recall@10 HOLDS at 10x (the approx arm must not
    degrade as lists deepen)."""
    out = {}
    recalls = {}
    for label, sf_dir in (("sf0.1", SRC), ("sf~1", DST)):
        for name in ANN:
            fn = REGISTRY[name].fn
            rows = fn(spark, sf_dir).count()  # warm (plan + page cache)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.select([F.xxhash64(c).alias(c) for c in df.columns]).agg(
                    F.count(F.lit(1))
                ).collect()
                best = min(best, time.time() - t0)
            out[(name, label)] = (round(best, 2), rows)
        for gate in ("sim_ann_recall", "sim_ann_recall_learned"):
            recalls[(gate, label)] = REGISTRY[gate].fn(spark, sf_dir).first()[
                "recall_pct"
            ]
    print(f"\n{'query':24s} {'sf0.1':>7s} {'sf~1':>7s} {'slope':>6s}")
    for name in ANN:
        (t0, _), (t1, _) = out[(name, "sf0.1")], out[(name, "sf~1")]
        print(f"{name:24s} {t0:7.2f} {t1:7.2f} {t1 / max(t0, 0.01):5.1f}x")
    for gate in ("sim_ann_recall", "sim_ann_recall_learned"):
        print(
            f"recall@10 [{gate}]: sf0.1 = {recalls[(gate, 'sf0.1')]}%, "
            f"sf~1(10x) = {recalls[(gate, 'sf~1')]}%"
        )


def lake_main(spark) -> None:
    """Lakehouse-tier slope probe: the three DELETE strategies at
    sf0.1 vs 10x documents. Healthy =
    - `delete_keys` (bloom-pruned) opens a near-constant number of
      files regardless of table size (the prune is driver-side over
      manifest bitmaps), so its wall grows far slower than the table;
    - `delete_where` (CoW full scan) scales with table bytes — the
      baseline the blooms beat;
    - `delete_where_mor` under a SPREAD predicate (every file holds a
      match, the CoW worst case) avoids the full-table rewrite: its
      wall tracks the scan, while CoW pays scan + rewrite of every
      affected file."""
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    def build_table(sf_dir: str, bloom: bool) -> str:
        d = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "lang", "n_chars", "text")
            .repartitionByRange(16, "doc_id")
        )
        t = tempfile.mkdtemp(prefix="lake_probe_") + "/docs"
        SNAP.write_version(d, t, bloom_cols=["doc_id"] if bloom else None)
        return t

    keys = [3, 7, 11]
    spread = "doc_id % 97 = 3"
    print(f"\n{'op':26s} {'sf0.1':>7s} {'sf~1':>7s} {'slope':>6s}  evidence")
    rows = {}
    for label, sf_dir in (("sf0.1", SRC), ("sf~1", DST)):
        t = build_table(sf_dir, bloom=True)
        t0 = time.time()
        v = SNAP.delete_keys(spark, t, "doc_id", keys)
        m = SNAP._load_manifest(t, v)
        n_files = len(SNAP._load_manifest(t, 1)["files"])
        rows[("delete_keys(bloom)", label)] = (
            time.time() - t0,
            f"pruned {m['bloom_pruned']}/{n_files} files, rewrote {m['rewrote']}",
        )
        t = build_table(sf_dir, bloom=False)
        t0 = time.time()
        v = SNAP.delete_where(spark, t, f"doc_id IN ({', '.join(map(str, keys))})")
        m = SNAP._load_manifest(t, v)
        rows[("delete_where(CoW scan)", label)] = (
            time.time() - t0,
            f"scanned all, rewrote {m['rewrote']}",
        )
        t = build_table(sf_dir, bloom=False)
        t0 = time.time()
        v = SNAP.delete_where_mor(spark, t, spread)
        m = SNAP._load_manifest(t, v)
        rows[("delete_mor(spread)", label)] = (
            time.time() - t0,
            f"dv_rows {m['dv_rows']}, rewrote 0",
        )
        t = build_table(sf_dir, bloom=False)
        t0 = time.time()
        v = SNAP.delete_where(spark, t, spread)
        m = SNAP._load_manifest(t, v)
        rows[("delete_cow(spread)", label)] = (
            time.time() - t0,
            f"rewrote {m['rewrote']} files (worst case)",
        )
    for op in (
        "delete_keys(bloom)",
        "delete_where(CoW scan)",
        "delete_mor(spread)",
        "delete_cow(spread)",
    ):
        (t0, e0), (t1, e1) = rows[(op, "sf0.1")], rows[(op, "sf~1")]
        print(
            f"{op:26s} {t0:7.2f} {t1:7.2f} {t1 / max(t0, 0.01):5.1f}x  "
            f"sf0.1: {e0} | sf~1: {e1}"
        )



_LAKE_SCALES = {"base": 16, "10x": 160, "100x": 1600}


def _lake_docs_df(spark, label: str):
    if label == "100x":
        # third decade (--lake100x): 10 key-shifted copies of the
        # 10x replica — documents only, the probe needs no dims
        base = spark.read.parquet(
            os.path.join(DST, "documents.parquet")
        ).select("doc_id", "lang", "n_chars", "text")
        parts = [
            base.withColumn(
                "doc_id", F.col("doc_id") + F.lit(j * 10_000_000_000)
            )
            for j in range(COPIES)
        ]
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        return d
    sf_dir = SRC if label == "base" else DST
    return spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "lang", "n_chars", "text")


def _lake_build(spark, label: str) -> str:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    n_files = _LAKE_SCALES[label]
    d = _lake_docs_df(spark, label).repartitionByRange(n_files, "doc_id")
    t = tempfile.mkdtemp(prefix="lake10x_") + "/docs"
    SNAP.write_version(d, t, bloom_cols=["doc_id"], stats_cols=["doc_id"])
    return t


def _lake_op(spark, op: str, label: str) -> tuple[float, str]:
    """Build a fresh table at `label` scale and run ONE timed op —
    shared by the in-sequence sweep and the --lake-solo fresh-process
    re-measurement (r10 verdict item 6: in-sequence numbers can carry
    page-cache artifacts; any >2x slope re-measures solo)."""
    from binance_etl_spark.operators import snapshots as SNAP

    n_files = _LAKE_SCALES[label]
    keys32 = list(range(0, 3200, 100))
    keys320 = list(range(0, 3200, 10))

    def merge_src(t: str, keys: list[int], n_new: int):
        head = SNAP.read_version(spark, t)
        upd = head.where(F.col("doc_id").isin(keys)).withColumn(
            "n_chars", F.col("n_chars") + F.lit(1)
        )
        ins = (
            spark.range(n_new)
            .select(
                (F.col("id") + 50_000_000).alias("doc_id"),
                F.lit("xx").alias("lang"),
                F.lit(1).cast("bigint").alias("n_chars"),
                F.lit("synthetic").alias("text"),
            )
            .select(*head.columns)
        )
        return upd.unionByName(ins)

    t = _lake_build(spark, label)
    if op in ("merge_into(32 keys)", "merge_into(320 keys)"):
        src = merge_src(t, keys32 if "32 " in op else keys320, n_new=8)
        t0 = time.time()
        v = SNAP.merge_into(spark, t, src, ["doc_id"])
        m = SNAP._load_manifest(t, v)
        ev = f"rewrote {m['rewrote']}/{n_files}, pruned {m.get('bloom_pruned')}"
    elif op == "merge_into(5k wide keys)":
        # WIDE CDC merge (round-11): 5,000 contiguous keys — far past
        # the 1024-key driver cap that used to force a full 160/160
        # (1600/1600) scan. The distributed zone+bloom probe
        # (select_files_keys) must keep the scan O(files actually
        # holding the key range).
        head = SNAP.read_version(spark, t)
        src = head.where(F.col("doc_id") < 5000).withColumn(
            "n_chars", F.col("n_chars") + F.lit(1)
        )
        t0 = time.time()
        v = SNAP.merge_into(spark, t, src, ["doc_id"])
        m = SNAP._load_manifest(t, v)
        ev = f"rewrote {m['rewrote']}/{n_files}, pruned {m.get('bloom_pruned')}"
    elif op in ("delete_keys(16)", "delete_keys(160)"):
        keys = keys32[:16] if "(16)" in op else keys320[:160]
        t0 = time.time()
        v = SNAP.delete_keys(spark, t, "doc_id", keys)
        m = SNAP._load_manifest(t, v)
        ev = f"rewrote {m['rewrote']}/{n_files}, pruned {m['bloom_pruned']}"
    elif op == "read_changes(1k delta)":
        delta = spark.range(1000).select(
            (F.col("id") + 60_000_000).alias("doc_id"),
            F.lit("yy").alias("lang"),
            F.lit(2).cast("bigint").alias("n_chars"),
            F.lit("delta").alias("text"),
        )
        v = SNAP.write_version(delta, t)
        t0 = time.time()
        n = SNAP.read_changes(spark, t, v - 1, v).count()
        ev = f"{n} changes, delta files only"
    elif op == "compact(8 small)":
        for i in range(8):
            SNAP.write_version(
                spark.createDataFrame(
                    [(70_000_000 + i, "zz", 1, "tiny")],
                    "doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING",
                ),
                t,
            )
        t0 = time.time()
        # threshold BELOW the ~40 KB data files and above the ~2 KB
        # tiny appends, so only the appended tail classifies as small
        v = SNAP.compact(spark, t, min_file_bytes=8 * 1024)
        m = SNAP._load_manifest(t, v)
        ev = f"rewrote {m['rewrote']}, carried {m['carried']}"
    else:
        raise ValueError(f"unknown lake op {op!r}")
    return time.time() - t0, ev


_LAKE_BASE_OPS = [
    "merge_into(32 keys)",
    "delete_keys(16)",
    "read_changes(1k delta)",
    "compact(8 small)",
]
_LAKE_BIG_OPS = [  # only meaningful at 10x/100x (vs-base_op comparisons)
    ("merge_into(320 keys)", "merge_into(32 keys)"),
    ("merge_into(5k wide keys)", "merge_into(32 keys)"),
    ("delete_keys(160)", "delete_keys(16)"),
]


def _lake_solo(op: str, label: str) -> float | None:
    """Re-measure one (op, scale) in a FRESH PROCESS (cold JVM, no
    page-cache pressure from the in-sequence build history)."""
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--lake-solo", op, label],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in r.stdout.splitlines():
        if line.startswith("SOLO_RESULT "):
            return json.loads(line[len("SOLO_RESULT "):])["sec"]
    return None


def dedupidx_main(spark) -> None:
    """Incremental dedup-index probe (round 11): build the UNCAPPED
    MinHash-LSH index over the full documents table, then refresh with
    a FIXED 500-doc variant delta, at sf0.1 (5k docs) vs the 10x
    replica (50k docs). Healthy = build wall ~linear in corpus
    (shingle + 6 md5 min-hashes per doc dominate), refresh wall well
    under build at BOTH scales with the gap WIDENING at 10x — refresh
    re-shingles only the delta; its only corpus-sized costs are the
    column-pruned stored-bands scan feeding the candidate equi-join
    and the pairs-MERGE bloom probe."""
    import tempfile as _tempfile

    from binance_etl_spark.catalog import load as _load
    from binance_etl_spark.plans.dedup_index import build_dedup_index

    print(f"\n{'scale':6s} {'docs':>6s} {'build':>7s} {'refresh':>8s} "
          f"{'ratio':>6s} {'cand':>6s} {'pairs':>6s}")
    for label, sf_dir in (("sf0.1", SRC), ("sf~1", DST)):
        docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
        n_docs = docs.count()
        delta = (
            docs.orderBy("doc_id")
            .limit(500)
            .select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
            )
        )
        root = _tempfile.mkdtemp(prefix="besk_dedupidx_probe_") + "/t"
        t0 = time.time()
        build_dedup_index(docs, root)
        t_build = time.time() - t0
        t0 = time.time()
        ev = build_dedup_index(delta, root)
        t_refresh = time.time() - t0
        print(
            f"{label:6s} {n_docs:6d} {t_build:6.2f}s {t_refresh:7.2f}s "
            f"{t_refresh / max(t_build, 0.01):5.2f}x "
            f"{ev['n_candidates']:6d} {ev['n_new_pairs']:6d}"
        )
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


def clusteridx_main(spark) -> None:
    """Incremental cluster-index probe (round 11): labels table built
    by full CC over n disjoint (2i, 2i+1) pair edges, then refreshed
    with a FIXED 100-bridge-edge delta (each bridge merges two
    adjacent stored pair-clusters -> 400 affected nodes at EVERY
    scale), at n=50k vs n=500k stored edges. Healthy = build grows
    with n while refresh stays near-flat: the refresh's only
    stored-size costs are two column-pruned semi-join scans of the
    labels table (touched-cluster lookup + affected-star fetch) and
    the bloom-pruned MERGE's affected-file rewrites; the CC recompute
    itself runs over 400 stars + 100 delta edges regardless of n."""
    import tempfile as _tempfile

    from binance_etl_spark.plans.dedup_index import build_cluster_index

    print(f"\n{'scale':6s} {'edges':>7s} {'build':>7s} {'refresh':>8s} "
          f"{'ratio':>6s} {'affected':>8s} {'relabeled':>9s}")
    for label, n in (("50k", 50_000), ("500k", 500_000)):
        pairs = spark.range(n).select(
            (F.col("id") * 2).alias("a_id"),
            (F.col("id") * 2 + 1).alias("b_id"),
        )
        delta = spark.range(100).select(
            (F.col("id") * 4).alias("a_id"),
            (F.col("id") * 4 + 2).alias("b_id"),
        )
        root = _tempfile.mkdtemp(prefix="besk_ccidx_probe_") + "/t"
        t0 = time.time()
        build_cluster_index(pairs, root)
        t_build = time.time() - t0
        t0 = time.time()
        ev = build_cluster_index(delta, root)
        t_refresh = time.time() - t0
        print(
            f"{label:6s} {n:7d} {t_build:6.2f}s {t_refresh:7.2f}s "
            f"{t_refresh / max(t_build, 0.01):5.2f}x "
            f"{ev['n_affected_nodes']:8d} {ev['n_relabeled']:9d}"
        )
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


def lake_solo_main(spark) -> None:
    i = sys.argv.index("--lake-solo")
    op, label = sys.argv[i + 1], sys.argv[i + 2]
    sec, ev = _lake_op(spark, op, label)
    print(
        "SOLO_RESULT " + json.dumps({"sec": round(sec, 2), "evidence": ev}),
        flush=True,
    )


def lake10x_main(spark) -> None:
    """Write-path slope probe (round-10 verdict item 3): merge_into,
    delete_keys (bloom-pruned), read_changes, and compact at 10x FILE
    count (16 -> 160 files, 10x rows) and 10x KEY count (32 -> 320
    source keys on the big table), plus the round-11 5k-wide-key CDC
    merge (distributed zone+bloom probe). Healthy =
    - merge/delete walls grow FAR slower than the table (pruning
      bounds files opened by the key range, not the table);
    - read_changes of a fixed appended delta is ~flat (manifest diff
      opens only the delta's files);
    - incremental compact of a fixed small-file tail is ~flat (large
      files carry by name, zero I/O);
    - every op's manifest `rewrote` stays O(affected files) — printed
      as evidence and pinned exactly in tests/test_lake_scale_pins.py.
    SOLO DISCIPLINE (r10 verdict item 6): any entry whose in-sequence
    slope exceeds 2x is re-measured in a fresh process before it lands
    in PERFORMANCE.md; the table carries a solo column for those.
    """
    rows: dict[tuple[str, str], tuple[float, str]] = {}
    scales = ["base", "10x"]
    if "--lake100x" in sys.argv:
        scales.append("100x")  # third decade: 1,600 files / 500k docs
    for label in scales:
        for op in _LAKE_BASE_OPS:
            rows[(op, label)] = _lake_op(spark, op, label)
        if label != "base":
            for op, _ in _LAKE_BIG_OPS:
                rows[(op, label)] = _lake_op(spark, op, label)

    solo: dict[tuple[str, str], float] = {}

    def _maybe_solo(op: str, label: str, slope: float) -> str:
        if slope <= 2.0:
            return ""
        sec = _lake_solo(op, label)
        if sec is None:
            return " [solo: FAILED]"
        solo[(op, label)] = sec
        return f" [solo: {sec:.2f}s]"

    has100 = "100x" in scales
    hdr = f"\n{'op':24s} {'base':>7s} {'10x':>7s} {'slope':>6s}"
    if has100:
        hdr += f" {'100x':>7s} {'slp100':>6s}"
    print(hdr + "  evidence (slope > 2x re-measured solo, fresh process)")
    for op in _LAKE_BASE_OPS:
        (t0, e0), (t1, e1) = rows[(op, "base")], rows[(op, "10x")]
        s10 = t1 / max(t0, 0.01)
        line = f"{op:24s} {t0:7.2f} {t1:7.2f} {s10:5.1f}x"
        tail = f"  base: {e0} | 10x: {e1}" + _maybe_solo(op, "10x", s10)
        if has100 and (op, "100x") in rows:
            (t2, e2) = rows[(op, "100x")]
            s100 = t2 / max(t1, 0.01)
            line += f" {t2:7.2f} {s100:5.1f}x"
            tail += f" | 100x: {e2}" + _maybe_solo(op, "100x", s100)
        print(line + tail)
    for op, base_op in _LAKE_BIG_OPS:
        for lbl in ("10x", "100x"):
            if (op, lbl) not in rows:
                continue
            (t0, e0) = rows[(base_op, lbl)]
            (t1, e1) = rows[(op, lbl)]
            s = t1 / max(t0, 0.01)
            print(
                f"{op:24s} {t0:7.2f} {t1:7.2f} {s:5.1f}x  "
                f"(vs {base_op} on the {lbl} table) {e1}"
                + _maybe_solo(op, lbl, s)
            )


# --- multi-symbol key-parallelism probe (--sync) -------------------------


DML = [
    "sink_sql_dml",
    "sink_sql_merge_cols",
    "sink_update_where",
    "sink_delete_mor",
    "sink_snapshot_merge",
]


def _slope_probe(spark, names: list[str], width: int = 24) -> None:
    """Shared registry-query slope harness: warm run (plan + page
    cache) then best-of-2 timed runs at sf0.1 vs the 10x dir, printed
    as per-query slopes."""
    out = {}
    for label, sf_dir in (("sf0.1", SRC), ("sf~1", DST)):
        for name in names:
            fn = REGISTRY[name].fn
            rows = fn(spark, sf_dir).count()  # warm (plan + page cache)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            out[(name, label)] = (round(best, 2), rows)
    print(f"\n{'query':{width}s} {'sf0.1':>7s} {'sf~1':>7s} {'slope':>6s}")
    for name in names:
        (t0, _), (t1, _) = out[(name, "sf0.1")], out[(name, "sf~1")]
        print(f"{name:{width}s} {t0:7.2f} {t1:7.2f} {t1 / max(t0, 0.01):5.1f}x")


def dml_main(spark) -> None:
    """DML-tier slope probe: the ANSI-text chain and the underlying
    copy-on-write/MOR committers at sf0.1 vs 10x events. Healthy =
    near-linear or better: every op rewrites only AFFECTED files (or
    writes O(matches) deletion vectors), carries untouched files by
    name, and pays a fixed commit cost that amortizes at 10x."""
    _slope_probe(spark, DML, width=24)


R7 = [
    "text_bpe_learn",
    "win_funnel_steps",
    "agg_cohort_retention",
    "sink_cdc_incremental_join",
    "graph_bfs_distances",
    "ms_ohlc_vol_estimators",
    "ms_vwap_execution",
]


def r7_main(spark) -> None:
    """Round-7 operator slope probe at sf0.1 vs 10x. Healthy shapes:
    BPE's per-merge work rides the Zipf-compressed word table (the
    corpus is shuffled once, so the slope tracks the initial word
    count); funnel/cohort/estimators are one keyed exchange each; the
    join-IVM slope tracks delta sizes, not table size; BFS is bounded
    by the (fixed-size) node id universe."""
    _slope_probe(spark, R7, width=28)


R7B = [
    "ms_hayashi_yoshida",
    "dq_referential_integrity",
    "agg_market_basket",
    "win_attribution",
    "win_top_paths",
    "stats_ols_group",
    "stats_gini",
    "agg_rfm_segments",
    "dq_benford",
    "stats_bootstrap_ci",
    "sim_mmr_topk",
]


def r7b_main(spark) -> None:
    """Round-7 third-wave slope probe. Healthy shapes: attribution /
    top-paths / gini are one user- or type-keyed exchange of window
    work; OLS / Benford are map-side-combinable scan aggregates; RFM's
    windows sort only the user dimension; the bootstrap is a 64x
    expression fanout into keyed partials; MMR is one corpus scan +
    a k-bounded driver re-rank."""
    _slope_probe(spark, R7B, width=24)


R8 = [
    "ms_vpin",
    "ms_sign_runs_test",
    "stats_welch_ttest",
    "stats_mann_whitney",
    "stats_corr_matrix",
    "dq_anomaly_mad",
    "dq_freshness_sla",
    "graph_kcore",
    "graph_common_neighbors",
    "emb_matryoshka_recall",
    "text_winnowing_fingerprint",
    "ts_downsample_m4",
    "win_bollinger_breach",
    "sample_dsir_select",
]


def r8_main(spark) -> None:
    """Round-8 operator slope probe at sf0.1 vs 10x. Healthy shapes:
    vpin / runs / bollinger / m4 are one sym- or series-keyed window
    exchange; the stats battery is map-side-combinable sufficient
    sums (mann-whitney's window runs over DISTINCT values only);
    kcore is 3 fixed peel rounds of degree agg + semi-joins;
    common-neighbors is wedge-bounded; winnowing is one doc-keyed
    window pass + one fingerprint-keyed equi-join; matryoshka recall
    is one broadcast-query scan; dsir is the rewritten histogram
    two-pass."""
    _slope_probe(spark, R8, width=26)


R8B = [
    "stats_jarque_bera",
    "stats_anova_oneway",
    "stats_ljung_box",
    "stats_levene_bf",
    "stats_dickey_fuller",
    "stats_kendall_tau",
    "ms_acf_grid",
    "ms_lee_ready",
    "ms_obv_adline",
    "ms_intraday_seasonality",
    "emb_hamming_ann",
    "graph_assortativity",
    "graph_modularity",
    "text_bpe_segment",
    "emb_outlier_centroid",
    "ms_rs_profile",
    "ms_time_weighted_imbalance",
    "dedup_cross_source_matrix",
]


R9 = [
    "stats_kruskal_wallis",
    "stats_spearman",
    "ts_sax_symbols",
    "dq_completeness_matrix",
    "graph_kcore",
    "graph_common_neighbors",
]


R10 = [
    "text_substring_spans",
    "text_substring_dedup",  # the sibling, for a same-boot reference
]


def r10_main(spark) -> None:
    """Round-10 wave slope probe at sf0.1 vs 10x documents. Healthy
    shape for text_substring_spans: same two O(total tokens)
    combinable shuffles as text_substring_dedup plus one doc-keyed
    window over the duplicated-position tail only — the slope should
    track its sibling. (stream_ohlcv_late_watermark is a fixed
    13-row fixture by construction — no scale axis.)"""
    _slope_probe(spark, R10, width=26)


def r9_main(spark) -> None:
    """Round-9 wave slope probe at sf0.1 vs 10x. Healthy shapes:
    kruskal/spearman are distinct-value histogram machines (the only
    data-sized ops are combinable aggregates + (type,value) equi-
    joins); SAX rides series-keyed exchanges; completeness is one
    1-row aggregate; kcore re-probed after the per-round
    localCheckpoint; common_neighbors after the hub cap."""
    _slope_probe(spark, R9, width=26)


def r8b_main(spark) -> None:
    """Round-8 wave 4-6 slope probe at sf0.1 vs 10x. Healthy shapes:
    the stats battery is map-side-combinable sufficient sums (kendall
    on the bounded contingency table; levene adds one discrete-
    quantile pass + broadcast median join); lee-ready / obv / acf /
    ljung-box / dickey-fuller / seasonality all ride ONE sym-keyed
    window exchange; hamming-ANN is one broadcast-query corpus scan;
    assortativity / modularity are degree/label equi-joins, never
    node-pair joins."""
    _slope_probe(spark, R8B, width=26)


def _multi_sym_fixture(n_syms: int, frames_per_sym: int) -> tuple[str, dict]:
    """One interleaved replay log with n_syms independent u-chained
    depth streams + one snapshot per symbol — the same wire shape as
    bench._book_sync_fixture, widened across keys."""
    import json as _json
    import tempfile

    t_base = 1_727_000_000_000
    d = tempfile.mkdtemp(prefix="besk_sync_probe_")
    path = os.path.join(d, "depth_multi.jsonl")
    us = {k: 103 for k in range(n_syms)}
    seq = 0
    with open(path, "w") as f:
        for i in range(frames_per_sym):
            for k in range(n_syms):
                u = us[k]
                ev = {
                    "e": "depthUpdate",
                    "E": t_base + 100 * i,
                    "s": f"SYM{k}USDT",
                    "U": u,
                    "u": u + 2,
                    "b": [[f"{500 + k - (i % 50) * 0.1:.8f}", f"{(i % 7) * 0.5:.8f}"]],
                    "a": [[f"{500.1 + k + (i % 50) * 0.1:.8f}", f"{(i % 5) * 0.3:.8f}"]],
                }
                f.write(
                    _json.dumps(
                        {
                            "frame": _json.dumps(ev, separators=(",", ":")),
                            "arrival_ms": t_base + 100 * i + 5,
                            "seq": seq,
                        }
                    )
                    + "\n"
                )
                us[k] = u + 3
                seq += 1
    snaps = {
        f"SYM{k}USDT": {
            "lastUpdateId": 102,
            "bids": [[f"{500 + k:.8f}", "1.00000000"]],
            "asks": [[f"{500.1 + k:.8f}", "1.20000000"]],
        }
        for k in range(n_syms)
    }
    return path, snaps


def sync_main(spark) -> None:
    """Key-parallelism proof for the reference's core path: the SAME
    total frame count synced as 1, 4, and 16 independent symbols. The
    stateful step is one ordered group per symbol (applyInPandas), so
    wall time should FALL as symbols grow — a 1000-symbol deployment
    scales across executors by key, and a single hot symbol is the
    worst case, not the design point. Healthy = 16-symbol wall <=
    1-symbol wall; the parse/scan stages are key-oblivious."""
    import time as _time

    from binance_etl_spark.sources.replay import read_replay
    from binance_etl_spark.streaming.book_sync import book_sync_batch
    from binance_etl_spark.streaming.parse import parse_depth_updates

    total = 128_000
    print(f"\n{'symbols':>8s} {'frames':>8s} {'best_s':>7s} {'rows':>9s} {'rows/s':>9s}")
    for n_syms in (1, 4, 16):
        path, snaps = _multi_sym_fixture(n_syms, total // n_syms)
        best, rows = float("inf"), 0
        for _ in range(3):
            t0 = _time.time()
            upd = parse_depth_updates(
                read_replay(spark, path, lines_per_partition=4000)
            )
            out = book_sync_batch(upd, snaps)
            rows = out.agg(F.count(F.lit(1))).first()[0]
            best = min(best, _time.time() - t0)
        print(
            f"{n_syms:8d} {total:8d} {best:7.2f} {rows:9d} {rows / best:9.0f}"
        )



def graph10x_main(spark) -> None:
    """Node-scaled graph slope probe (round-10 verdict item 4):
    retires the 'fixed 100-dst fixture artifact' caveat that footnoted
    the graph slope tables since r7. The events-derived fixtures scale
    DEGREE when rows grow (dst space is a fixed 100 nodes, so 10x rows
    = 10x degree and wedge counts grow quadratically — a fixture
    artifact, not a plan property). This probe builds SYNTHETIC
    power-law-ish graphs where 10x means 10x NODES at bounded expected
    degree (~8 hashed neighbors/node, plus a planted n/10-degree hub
    for a realistic heavy tail) and times the edge-parameterized cores
    directly: pagerank, LPA, BFS, k-core peel, degree-oriented
    triangles, modularity, and the hub-capped common-neighbors wedge
    join. Healthy = slope <=~2x wall at 10x nodes on local[32] (these
    graphs are small enough that fixed overheads amortize; the point
    is NO super-linear blow-up). The one theory-superlinear op —
    uncapped wedge joins — is covered by --hubcap's explicit
    quadratic demonstration."""
    import time as _t

    from binance_etl_spark.operators.graph import (
        bfs_distances,
        label_propagation,
        pagerank,
    )
    from binance_etl_spark.plans.graph import (
        common_neighbors_topk,
        kcore_degrees,
        modularity_summary,
        triangle_counts,
    )

    def synth(n_nodes: int):
        """(directed, undirected-canonical, both-orientation) edge
        frames for one power-law-ish graph of n_nodes."""
        base = spark.range(n_nodes * 8).select(
            (F.col("id") % n_nodes).alias("src"),
            ((F.col("id") * 2654435761) % n_nodes).alias("dst"),
        )
        hub = spark.range(1, n_nodes // 10).select(
            F.lit(0).alias("src"), (F.col("id") * 10).alias("dst")
        )
        fwd = (
            base.unionAll(hub)
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        und = (
            fwd.select(
                F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        ue = (
            und.select(F.col("u").alias("a"), F.col("v").alias("b"))
            .unionAll(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
            .localCheckpoint(eager=True)
        )
        return fwd, und, ue

    ops = {
        "pagerank(3 iters)": lambda g: pagerank(g[0], n_iters=3),
        "label_prop(3 iters)": lambda g: label_propagation(g[1], n_iters=3),
        "bfs(4 hops)": lambda g: bfs_distances(g[1], "node % 1000 = 0"),
        "kcore(peel 3)": lambda g: kcore_degrees(g[2]),
        "triangles(oriented)": lambda g: triangle_counts(g[1]),
        "modularity(LPA+Q)": lambda g: modularity_summary(g[1]),
        "common_neighbors(cap)": lambda g: common_neighbors_topk(g[2], 64),
    }
    out = {}
    for label, n in (("n=20k", 20_000), ("n=200k", 200_000)):
        g = synth(n)
        for op, fn in ops.items():
            fn(g).count()  # warm: plan + shuffle paths
            t0 = _t.perf_counter()
            rows = fn(g).count()
            out[(op, label)] = (_t.perf_counter() - t0, rows)
    print(f"\n{'op':24s} {'n=20k':>8s} {'n=200k':>8s} {'slope':>6s} {'rows20k':>9s} {'rows200k':>9s}")
    for op in ops:
        (t0, r0), (t1, r1) = out[(op, "n=20k")], out[(op, "n=200k")]
        print(
            f"{op:24s} {t0:8.2f} {t1:8.2f} {t1 / max(t0, 0.01):5.1f}x "
            f"{r0:9d} {r1:9d}"
        )


def hubcap_main(spark) -> None:
    """Hub-cap probe for the wedge join (graph_common_neighbors core):
    a power-law-ish graph PLUS one planted super-hub connected to
    every node. Uncapped, the hub alone contributes ~n^2/2 wedge
    pairs; capped, the broadcast anti-join drops it before the
    self-join. Run at 1x and 10x nodes to show the capped plan's
    slope stays linear-ish while the uncapped one goes quadratic."""
    import time as _t

    from pyspark.sql import functions as F

    from binance_etl_spark.plans.graph import common_neighbors_topk

    def skewed_edges(n_nodes: int):
        # ~8 pseudo-random neighbors per node (bounded degree) + a
        # planted hub (node 0) adjacent to EVERY node
        base = (
            spark.range(n_nodes * 8)
            .select(
                (F.col("id") % n_nodes).alias("a"),
                ((F.col("id") * 2654435761) % n_nodes).alias("b"),
            )
        )
        hub = spark.range(1, n_nodes).select(
            F.lit(0).alias("a"), F.col("id").alias("b")
        )
        fwd = base.unionAll(hub)
        rev = fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
        return (
            fwd.unionAll(rev).where(F.col("a") != F.col("b")).distinct()
        )

    print(f"{'config':34s} {'sec':>8s} {'rows':>8s}")
    # capped: 1x and 10x nodes (the scale path — slope should be ~flat
    # in n since per-node degree is bounded once the hub is screened)
    for n in (20_000, 200_000):
        ue = skewed_edges(n).localCheckpoint()  # freeze the input cost
        t0 = _t.perf_counter()
        rows = common_neighbors_topk(ue, 64).count()
        sec = _t.perf_counter() - t0
        print(f"hub n={n:<7d} capped(64)         {sec:8.2f} {rows:8d}",
              flush=True)
        del ue  # localCheckpoint blocks free via ContextCleaner on GC
        # (DataFrame.unpersist would be a no-op: localCheckpoint
        # blocks live outside the CacheManager)
    # uncapped: SMALL n only — the hub contributes n^2/2 wedge pairs,
    # so 3x the nodes is ~9x the join output; at n=200k this leg would
    # be a 2e10-pair job (the explosion the cap exists to prevent)
    for n in (6_000, 18_000):
        ue = skewed_edges(n).localCheckpoint()
        t0 = _t.perf_counter()
        rows = common_neighbors_topk(ue, 1 << 60).count()
        sec = _t.perf_counter() - t0
        print(f"hub n={n:<7d} uncapped           {sec:8.2f} {rows:8d}",
              flush=True)
        del ue


def tws10x_main(spark) -> None:
    """Stateful-streaming STATE-CARDINALITY scale probe (r10 verdict
    item 5): the five tWS operators (attribution, funnel, sessionizer,
    Bollinger, VPIN) at 1x vs 10x KEYED-ENTITY count under RocksDB,
    with TOTAL ROWS HELD FIXED (800k) — the same event volume spread
    over 10x more users/symbols, so the wall slope isolates what more
    STATE-STORE ENTRIES cost, not what more data costs. Healthy =
    - wall slope <= ~2x at 10x keys (state lookups are O(1)-ish per
      key; no cross-key state, no per-key fixed cost that dominates);
    - state rows PER KEY flat across scales (per-key state
      independence is the 100 TB design claim: attribution O(pending
      touches), funnel/vpin O(1), bollinger O(window), sessionizer
      O(open sessions));
    - rows/s non-collapsing.
    Metrics from StreamingQuery progress: max stateOperators
    numRowsTotal + RocksDB memory, wall over processAllAvailable of
    4 mtime-ordered file micro-batches.
    """
    import glob as _glob
    import shutil as _sh
    import tempfile

    from binance_etl_spark.streaming.attribution_tws import attribution_tws
    from binance_etl_spark.streaming.bollinger_tws import bollinger_tws
    from binance_etl_spark.streaming.funnel_tws import funnel_tws
    from binance_etl_spark.streaming.session_tws import sessionize_tws
    from binance_etl_spark.streaming.vpin_tws import vpin_tws

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    shuffle_key = "spark.sql.shuffle.partitions"
    prior_provider = spark.conf.get(provider_key, None)
    prior_shuffle = spark.conf.get(shuffle_key)
    spark.conf.set(provider_key, rocksdb)
    spark.conf.set(shuffle_key, "8")

    TOTAL = 800_000  # rows, FIXED across scales (state-cardinality probe)
    T0 = 1_700_000_000_000_000  # micros

    def _base(n_keys: int):
        """(key, seq, eid, b) backbone: seq = per-entity event index,
        b = micro-batch (time-ordered quarters of each entity's tape).
        per-key tape length = TOTAL / n_keys."""
        per_key = TOTAL // n_keys
        return spark.range(n_keys * per_key).select(
            (F.col("id") % n_keys).alias("key"),
            (F.col("id") / n_keys).cast("long").alias("seq"),
            F.col("id").alias("eid"),
        ).withColumn("b", (F.col("seq") * 4 / per_key).cast("int"))

    def spool(df) -> str:
        src = tempfile.mkdtemp(prefix="tws10x_") + "/src"
        os.makedirs(src)
        for i in range(4):
            tmp = src + f"_w{i}"
            df.where(F.col("b") == i).drop("b").coalesce(1).write.parquet(tmp)
            [f] = _glob.glob(os.path.join(tmp, "part-*.parquet"))
            dst = os.path.join(src, f"{i:04d}.parquet")
            _sh.move(f, dst)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
            _sh.rmtree(tmp)
        return src

    def run(make_stream, schema: str, src: str, n_rows: int):
        name = "tws10x_mem"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        t0 = time.time()
        q = (
            make_stream(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        wall = time.time() - t0
        srows = smem = 0
        for p in q.recentProgress:
            for so in p.get("stateOperators", []):
                srows = max(srows, int(so.get("numRowsTotal", 0) or 0))
                cm = so.get("customMetrics", {}) or {}
                smem = max(
                    smem,
                    int(
                        cm.get("rocksdbTotalMemoryUsage", 0)
                        or so.get("memoryUsedBytes", 0)
                        or 0
                    ),
                )
        nout = spark.table(name).count()
        q.stop()
        spark.catalog.dropTempView(name)
        _sh.rmtree(os.path.dirname(src), ignore_errors=True)
        return wall, srows, smem, nout, n_rows / max(wall, 0.01)

    def attribution(n_keys: int):
        df = _base(n_keys).select(
            F.col("key").alias("user_id"),
            (F.lit(T0) + F.col("seq") * 1_000_000 + F.col("key")).alias("tu"),
            "eid",
            F.when(F.col("seq") % 13 == 12, F.lit(0))
            .otherwise((F.col("key") + F.col("seq")) % 3 + 1)
            .cast("int")
            .alias("code"),
            "b",
        )
        return run(
            attribution_tws,
            "user_id BIGINT, tu BIGINT, eid BIGINT, code INT",
            spool(df),
            TOTAL,
        )

    def funnel(n_keys: int):
        df = _base(n_keys).select(
            F.col("key").alias("user_id"),
            (F.lit(T0) + F.col("seq") * 1_000_000 + F.col("key")).alias("tu"),
            "eid",
            ((F.col("key") * 7 + F.col("seq")) % 4 + 1).cast("int").alias("code"),
            "b",
        )
        return run(
            funnel_tws,
            "user_id BIGINT, tu BIGINT, eid BIGINT, code INT",
            spool(df),
            TOTAL,
        )

    def bollinger(n_keys: int):
        df = _base(n_keys).select(
            F.col("key").cast("int").alias("sym"),
            (F.lit(T0) + F.col("seq") * 1_000_000 + F.col("key")).alias("tu"),
            "eid",
            (10_000 + (F.col("eid") * 37) % 200).alias("p"),
            "b",
        )
        return run(
            bollinger_tws,
            "sym INT, tu BIGINT, eid BIGINT, p BIGINT",
            spool(df),
            TOTAL,
        )

    def vpin(n_keys: int):
        df = _base(n_keys).select(
            F.col("key").cast("int").alias("sym"),
            (F.lit(T0) + F.col("seq") * 1_000_000 + F.col("key")).alias("tu"),
            "eid",
            (1 + F.col("eid") % 5).alias("qty"),
            F.when(F.col("eid") % 2 == 0, 1).otherwise(-1).cast("int").alias("side"),
            "b",
        )
        return run(
            vpin_tws,
            "sym INT, tu BIGINT, eid BIGINT, qty BIGINT, side INT",
            spool(df),
            TOTAL,
        )

    def sessionizer(n_keys: int):
        # per-entity tape: bursts of 5 events 200ms apart, then a 3s
        # gap (> gap_ms=1000) -> ~8 sessions per entity
        ts = (
            F.lit(1_700_000_000_000)
            + (F.col("seq") / 5).cast("long") * 3_000
            + (F.col("seq") % 5) * 200
            + F.col("key")
        )
        df = _base(n_keys).select(
            F.concat(F.lit("s"), F.col("key")).alias("symbol"),
            ts.alias("timestamp"),
            "b",
        )

        def make(stream):
            ev = stream.withColumn(
                "event_time", F.timestamp_millis("timestamp")
            ).withWatermark("event_time", "1 second")
            return sessionize_tws(ev, gap_ms=1000)

        return run(
            make,
            "symbol STRING, timestamp BIGINT",
            spool(df),
            TOTAL,
        )

    ops = [
        ("attribution_tws", attribution),
        ("funnel_tws", funnel),
        ("sessionize_tws", sessionizer),
        ("bollinger_tws", bollinger),
        ("vpin_tws", vpin),
    ]
    try:
        print(
            f"\n{'op':18s} {'keys':>7s} {'parts':>5s} {'wall':>7s} "
            f"{'rows/s':>8s} {'state_rows':>10s} {'rows/key':>8s} "
            f"{'rocksdb_mb':>10s} {'out':>8s}"
        )
        walls: dict[tuple[str, int, int], float] = {}
        # third leg: 10x keys at 4x partitions — the per-key cost is
        # Python handleInputRows invocations + state-channel round
        # trips, which parallelize across state partitions; a cluster
        # scales partitions with keys, so the FIXED-parallelism slope
        # overstates the 100 TB cost and this leg shows the recovery
        for name, fn in ops:
            for n_keys, parts in ((2_000, 8), (20_000, 8), (20_000, 32)):
                spark.conf.set(shuffle_key, str(parts))
                wall, srows, smem, nout, rps = fn(n_keys)
                walls[(name, n_keys, parts)] = wall
                print(
                    f"{name:18s} {n_keys:7d} {parts:5d} {wall:6.2f}s "
                    f"{rps:8.0f} {srows:10d} {srows / n_keys:8.2f} "
                    f"{smem / 1e6:10.1f} {nout:8d}",
                    flush=True,
                )
            base = max(walls[(name, 2_000, 8)], 0.01)
            s8 = walls[(name, 20_000, 8)] / base
            s32 = walls[(name, 20_000, 32)] / base
            print(
                f"{name:18s} slope at 10x keys: {s8:.2f}x fixed-parts, "
                f"{s32:.2f}x at 4x parts",
                flush=True,
            )
    finally:
        if prior_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior_provider)
        spark.conf.set(shuffle_key, prior_shuffle)


def main() -> None:
    extra = {"spark.ui.enabled": "true"} if "--stages" in sys.argv else None
    spark = get_spark("scale-probe", extra)
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_loaded()
    if "--rebuild" in sys.argv or not os.path.isdir(DST):
        build(spark)
    if "--sync" in sys.argv:
        sync_main(spark)
        return
    if "--ann" in sys.argv:
        ann_main(spark)
        return
    if "--dml" in sys.argv:
        dml_main(spark)
        return
    if "--r10" in sys.argv:
        r10_main(spark)
        return
    if "--r9" in sys.argv:
        r9_main(spark)
        return
    if "--hubcap" in sys.argv:
        hubcap_main(spark)
        return
    if "--graph10x" in sys.argv:
        graph10x_main(spark)
        return
    if "--r8b" in sys.argv:
        r8b_main(spark)
        return
    if "--r8" in sys.argv:
        r8_main(spark)
        return
    if "--r7b" in sys.argv:
        r7b_main(spark)
        return
    if "--r7" in sys.argv:
        r7_main(spark)
        return
    if "--dedupidx" in sys.argv:
        dedupidx_main(spark)
        return
    if "--clusteridx" in sys.argv:
        clusteridx_main(spark)
        return
    if "--lake-solo" in sys.argv:
        lake_solo_main(spark)
        return
    if "--lake10x" in sys.argv or "--lake100x" in sys.argv:
        lake10x_main(spark)
        return
    if "--tws10x" in sys.argv:
        tws10x_main(spark)
        return
    if "--lake" in sys.argv:
        lake_main(spark)
        return
    if "--stages" in sys.argv or "--llm10" in sys.argv:
        if not os.path.isdir(DST100):
            build_x100(spark)
        if "--stages" in sys.argv:
            stages_main(spark)
        if "--llm10" in sys.argv:
            llm10_main(spark)
        return
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
