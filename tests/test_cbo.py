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
stats -> DROP TABLE.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import SparkSession

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
def cbo_spark():
    tmp = tempfile.mkdtemp(prefix="cbo_wh_")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.warehouse.dir", os.path.join(tmp, "wh"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for t in ["lineitem", "orders", "nation"]:
        spark.read.parquet(f"{SF}/{t}.parquet").write.mode("overwrite").saveAsTable(
            f"{t}_t"
        )
        spark.sql(f"ANALYZE TABLE {t}_t COMPUTE STATISTICS")
    yield spark
    for t in ["lineitem", "orders", "nation"]:
        spark.sql(f"DROP TABLE IF EXISTS {t}_t")
    spark.stop()


def _first_join_children(plan: str) -> str:
    """Return the optimized-plan text up to the second Join node —
    i.e. the subtree describing which relations meet first."""
    i = plan.find("Join Inner")
    j = plan.find("Join Inner", i + 1)
    return plan[i:j]


def test_analyze_publishes_row_counts(cbo_spark):
    stats = cbo_spark.sql("DESCRIBE TABLE EXTENDED lineitem_t").collect()
    blob = "\n".join(str(r) for r in stats)
    assert "rows" in blob or "Statistics" in blob


def test_cbo_reorders_dim_join_before_fact_fact(cbo_spark):
    plan = (
        cbo_spark.sql(QUERY)._jdf.queryExecution().optimizedPlan().toString()
    )
    # The INNERMOST join must be orders x nation (dim pulled forward),
    # leaving the lineitem fact join for last — the opposite of the
    # textual order.
    first = _first_join_children(plan)
    assert "nation" not in first.split("Relation")[0]  # top join is the fact join
    assert "orders" in plan and "nation" in plan
    # top-most join combines lineitem with the (orders x nation) result:
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
