"""Recursive CTE, fuzzy match, and HLL-rollup invariants.

Oracle parity for the three queries rides tests/test_oracle_parity.py;
these tests pin the semantic properties parity alone can't see.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from binance_etl_spark.plans import registry

SF = "/root/testdata/sf0.01"


def _q(name):
    registry._ensure_loaded()
    return registry.REGISTRY[name].fn


def test_recursive_tree_covers_every_customer(spark):
    """The floor(c/2) tree spans all custkeys >= 1 exactly once, with
    depth == floor(log2(node)) for a complete binary layout."""
    rows = _q("sql_recursive_tree")(spark, SF).collect()
    import duckdb

    n_cust = duckdb.sql(
        f"select count(*) from '{SF}/customer.parquet' where c_custkey >= 1"
    ).fetchone()[0]
    assert sum(r.n_nodes for r in rows) == n_cust
    for r in rows:
        # depth d holds nodes [2^d, 2^(d+1)) intersected with the key range
        assert int(math.log2(r.min_node)) == r.depth
        assert int(math.log2(r.max_node)) == r.depth


def test_fuzzy_match_recalls_every_dirty_name(spark):
    """Every corrupted name must link back to its source (edit distance
    1 guarantees a prefix/length-band block collision), and the verify
    step must never pass a pair the blocking admitted wrongly. The
    expected dirty-name set is DERIVED by applying the query's own
    corruption in Python, so name collisions or short names in a
    future corpus change the expectation instead of breaking it."""
    df = _q("join_fuzzy_match")(spark, SF)
    rows = df.collect()
    import duckdb

    clean = {
        r[0]
        for r in duckdb.sql(
            f"select distinct p_name from '{SF}/part.parquet'"
        ).fetchall()
    }
    expected_dirty = {name[:-1] + "_" for name in clean}
    # recall: every derived dirty name appears among the matches
    assert {r.dirty_name for r in rows} == expected_dirty
    for r in rows:
        assert r.edit_dist <= 2
        assert r.matched_name[:4] == r.dirty_name[:4]


def test_fuzzy_match_plan_is_blocked_equi_join(spark):
    """The candidate join must be a hash/merge equi-join on the block
    key — never a cartesian product."""
    plan = _q("join_fuzzy_match")(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hll_rollup_exact_at_low_cardinality_and_bounded_past_it(spark):
    """Sparse-mode sketches are exact below capacity (the oracle's
    premise); past capacity the union-of-dailies estimate stays within
    HLL error bounds (lgK=12 -> rse ~1.6%, assert 5%)."""
    # 100k distinct ids across 10 "days", unioned back together
    df = spark.range(100_000).select(
        (F.col("id") % 10).alias("day"), F.col("id").alias("uid")
    )
    daily = df.groupBy("day").agg(F.hll_sketch_agg("uid").alias("sk"))
    est = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).first()[0]
    assert abs(est - 100_000) / 100_000 < 0.05
