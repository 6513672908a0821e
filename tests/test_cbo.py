"""Cost-based optimizer: ANALYZE TABLE statistics drive join reordering.

AQE handles runtime re-planning (tests/test_aqe.py); CBO is the
compile-time half — with table statistics in the catalog, Catalyst
reorders a multi-join so small relations join first, independent of
the textual join order. At 100 TB getting the join ORDER right is
worth more than any single physical-operator choice: a fact-fact join
placed before a selective dim join materializes orders of magnitude
more intermediate rows.

Also exercises the managed-table lifecycle the temp-view-based queries
don't: saveAsTable -> ANALYZE TABLE COMPUTE STATISTICS -> catalog
stats -> DROP TABLE. Uses the shared session (CBO confs are runtime
SQL confs) — creating a second session via getOrCreate would alias the
shared one and stopping it would kill the whole suite's JVM.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"

# Textually joins the two facts first, the 20-row dim last; a cost
# model with stats should pull the dim join forward.
QUERY = """
SELECT n.n_name, COUNT(*) AS n_rows
FROM lineitem_t l JOIN orders_t o ON l.l_orderkey = o.o_orderkey
JOIN nation_t n ON CAST(o.o_custkey % 20 AS BIGINT) = n.n_nationkey
GROUP BY n.n_name
"""


@pytest.fixture(scope="module")
def cbo_spark(spark):
    prev = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    }
    # try/finally so a mid-setup failure still restores confs and drops
    # tables — leaking CBO=true or lineitem_t into the shared session
    # would change plans in unrelated suite modules.
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        for t in ["lineitem", "orders", "nation"]:
            spark.read.parquet(f"{SF}/{t}.parquet").write.mode(
                "overwrite"
            ).saveAsTable(f"{t}_t")
            spark.sql(f"ANALYZE TABLE {t}_t COMPUTE STATISTICS")
        yield spark
    finally:
        for t in ["lineitem", "orders", "nation"]:
            spark.sql(f"DROP TABLE IF EXISTS {t}_t")
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_analyze_publishes_row_counts(cbo_spark):
    stats = cbo_spark.sql("DESCRIBE TABLE EXTENDED lineitem_t").collect()
    blob = "\n".join(str(r) for r in stats)
    assert "rows" in blob or "Statistics" in blob


def test_cbo_reorders_dim_join_before_fact_fact(cbo_spark):
    plan = cbo_spark.sql(QUERY)._jdf.queryExecution().optimizedPlan().toString()
    # Top-most join must combine lineitem with the (orders x nation)
    # result — the dim join pulled innermost, opposite of the text.
    top_cond = plan.split("Join Inner,")[1].split("\n")[0]
    assert "l_orderkey" in top_cond, f"expected fact join last, got {top_cond}"
    inner_cond = plan.split("Join Inner,")[2].split("\n")[0]
    assert "n_nationkey" in inner_cond, (
        f"expected dim join innermost, got {inner_cond}"
    )


def test_cbo_off_keeps_textual_order(cbo_spark):
    cbo_spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    try:
        plan = (
            cbo_spark.sql(QUERY)._jdf.queryExecution().optimizedPlan().toString()
        )
        top_cond = plan.split("Join Inner,")[1].split("\n")[0]
        assert "n_nationkey" in top_cond, (
            f"without reorder the dim join stays textual-last, got {top_cond}"
        )
    finally:
        cbo_spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
