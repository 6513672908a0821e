"""Property tests for the compressed-domain ops (plans/llm_ops11.py):
PQ quantization invariants, the count-min overcount guarantee, and
degree-oriented triangle counting vs the naive enumeration."""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.graph import graph_triangles
from binance_etl_spark.plans.llm_ops11 import sim_ann_pq, text_heavy_hitters_cms

SF = "/root/testdata/sf0.01"


def test_pq_topk_shape_and_monotone(spark):
    rows = sim_ann_pq(spark, SF).collect()
    assert len(rows) == 10
    dists = [r["adc_dist"] for r in rows]
    assert all(d >= 0 for d in dists), "squared distances are non-negative"
    assert dists == sorted(dists), "top-k is ascending in ADC distance"


def test_pq_codebook_vectors_selfcode(spark, tmp_path):
    """THE codebook invariant: a codebook vector's sub-distance to its
    own code is exactly 0 in every subspace, so the encoder must assign
    vector k (k=1..16) code k-1 everywhere, and its ADC distance then
    equals the EXACT e-12 squared distance query->vector (the per-dim
    floor makes the sum grouping-independent, so subspace-wise ==
    whole-vector). Verified on a corpus that is exactly the codebook:
    every returned codebook row's adc_dist must equal the exact
    distance computed independently on the driver — PQ is lossless on
    its own codebook."""
    from binance_etl_spark.plans.llm_ops11 import _sq_dist_e12_py

    src = load(spark, SF, "embeddings").where(F.col("vec_id") <= 16)
    sf_dir = str(tmp_path)
    src.write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r["vec_id"]): [float(v) for v in r["embedding"]]
        for r in src.collect()
    }
    got = {r["vec_id"]: r["adc_dist"] for r in sim_ann_pq(spark, sf_dir).collect()}
    checked = 0
    for vid, adc in got.items():
        if vid == 0:
            continue  # the query itself is not a codebook vector
        exact = _sq_dist_e12_py(vecs[0], vecs[vid])
        assert adc == exact, (
            f"codebook vec {vid}: adc_dist {adc} != exact {exact} — "
            "self-code assignment broken"
        )
        checked += 1
    assert checked >= 9, "top-10 over a 17-vector corpus must be mostly codebook rows"
    # and determinism across runs (the old, weaker check) still holds
    a = [tuple(r) for r in sim_ann_pq(spark, SF).collect()]
    b = [tuple(r) for r in sim_ann_pq(spark, SF).collect()]
    assert a == b, "PQ ranking must be deterministic"


def test_cms_never_undercounts(spark):
    """The count-min guarantee: the sketch estimate of ANY token is >=
    its true frequency (counters only ever merge-add)."""
    est = text_heavy_hitters_cms(spark, SF)
    toks = load(spark, SF, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    truth = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_c"))
    joined = est.join(truth, "tok").collect()
    assert joined, "heavy-hitter set must be non-empty on the fixture"
    for r in joined:
        assert r["est"] >= r["true_c"], f"CMS undercounted {r['tok']!r}"


def test_cms_no_true_heavy_hitter_missed(spark):
    """Soundness of the report: any token whose TRUE frequency clears
    the 1% threshold must appear (overcounts can only add tokens)."""
    est_toks = {r["tok"] for r in text_heavy_hitters_cms(spark, SF).collect()}
    toks = load(spark, SF, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    total = toks.count()
    truth = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") * 100 >= F.lit(total))
        .collect()
    )
    for r in truth:
        assert r["tok"] in est_toks, f"true heavy hitter {r['tok']!r} missed"


def test_ann_recall_bounds(spark):
    from binance_etl_spark.plans.llm_ops11 import sim_ann_recall

    r = sim_ann_recall(spark, SF).collect()
    assert len(r) == 1
    row = r[0]
    assert row["k"] == 10
    assert 1 <= row["n_hit"] <= 10, "query's own vector is in a probed list"
    assert row["recall_pct"] == row["n_hit"] * 10


def test_er_every_record_resolves(spark):
    """Each dirty record is within levenshtein 3 of its own master name
    and shares its 4-char prefix, so the golden records must absorb all
    2x|part| dirty records — no orphans."""
    from binance_etl_spark.plans.registry import REGISTRY

    rows = REGISTRY["er_resolve_e2e"].fn(spark, SF).collect()
    n_part = load(spark, SF, "part").count()
    assert sum(r["n_merged"] for r in rows) == 2 * n_part
    assert all(r["sum_dist"] <= 3 * r["n_merged"] for r in rows)


def test_calibrated_sample_rates_balanced(spark):
    """Rank calibration keeps ~half of EVERY domain (vs an absolute
    threshold, which skews towards verbose domains)."""
    from binance_etl_spark.plans.llm_ops11 import sample_quality_calibrated

    kept = {r["source"]: r["n_kept"] for r in sample_quality_calibrated(spark, SF).collect()}
    totals = {
        r["source"]: r["n"]
        for r in load(spark, SF, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for src, n in totals.items():
        if n < 4:
            continue
        frac = kept.get(src, 0) / n
        assert 0.4 <= frac <= 0.6, f"{src}: kept {frac:.2f}, expected ~0.5"


def test_triangles_match_naive(spark):
    """Degree-oriented enumeration returns exactly the naive a<b<c
    three-way-join triangle set."""
    e = load(spark, SF, "events")
    dst = (F.col("user_id") * 13 + F.length("event_type")) % 100
    und = (
        e.select(
            F.least(F.col("user_id"), dst).alias("u"),
            F.greatest(F.col("user_id"), dst).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    naive = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    got = {(r["node"], r["n_triangles"]) for r in graph_triangles(spark, SF).collect()}
    want = {(r["node"], r["n_triangles"]) for r in naive.collect()}
    assert got == want
    assert want, "fixture graph must contain triangles"
