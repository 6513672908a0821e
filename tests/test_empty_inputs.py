"""Schema-stable behavior on EMPTY inputs: a partition of a 100 TB
table can legitimately be empty (aggressive pruning, a new tenant, a
fresh day), and operators must return empty schema-stable results —
not crash on first()-of-nothing or build descending sequence() ranges.
One representative query per major family runs against a testdata
clone where every table has zero rows."""

from __future__ import annotations

import os
import tempfile

import pytest

from binance_etl_spark.catalog import TABLES
from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

# One per family; chosen to cover token/shingle HOFs, window chains,
# joins, iterative ops, and the UDF surfaces.
EMPTY_SAFE = [
    "text_substring_dedup",
    "text_substring_scrub",
    "text_quality_classifier",
    "dedup_exact",
    "dedup_near_jaccard",
    "dedup_semdedup",
    "sample_perplexity_buckets",
    "text_bpe_train",
    "agg_pricing_summary",
    "win_running_sum",
    "sort_topk",
    "join_asof_events",
    "udf_arrow_grouped",
    "udtf_dynamic_cols",
    "sql_q3_topk",
    # round-3 second wave: sketch, compressed ANN (guarded k-row
    # collect), recall gate, degree-oriented graph, ER composite,
    # rank calibration
    # (sim_ann_recall is excluded: a GLOBAL aggregate legitimately
    # returns one n_hit=0 row on empty input, not zero rows)
    "text_heavy_hitters_cms",
    "sim_ann_pq",
    "graph_triangles",
    "er_resolve_e2e",
    "sample_quality_calibrated",
    # round-6 additions: DSIR scoring (nullif-guarded ppm divisions),
    # the quote-stream estimator. (corpus_epoch_order is excluded like
    # sim_ann_recall: a global aggregate legitimately returns its
    # epoch rows on empty input, not zero rows.)
    "sample_dsir_select",
    "ms_microprice",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark):
    d = tempfile.mkdtemp(prefix="besk_empty_sf_")
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_empty_input_is_schema_stable(spark, empty_sf_dir, name):
    df = REGISTRY[name].fn(spark, empty_sf_dir)
    assert len(df.schema.fields) > 0
    assert df.count() == 0


def test_substring_dedup_survives_identical_corpus(spark, tmp_path):
    """Pathological skew: EVERY doc identical -> every gram is one hot
    shuffle key. The gram aggregate + join-back must still complete and
    report 100% duplication (AQE splits the hot key; nothing is
    all-pairs)."""
    import os

    from binance_etl_spark.catalog import TABLES

    d = str(tmp_path / "sf_hot")
    text = " ".join(f"tok{i % 7}" for i in range(40))
    docs = spark.createDataFrame(
        [(i, text, "en", "src0", len(text)) for i in range(300)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    os.makedirs(d, exist_ok=True)
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    for t in TABLES:
        if t == "documents":
            continue
        spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{t}.parquet"))
    out = REGISTRY["text_substring_dedup"].fn(spark, d).collect()
    assert len(out) == 300
    assert all(r["dup_ratio_e6"] == 1_000_000 for r in out)
