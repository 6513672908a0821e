"""Spark 4 SQL scripting surface: session variables, EXECUTE IMMEDIATE,
and compound BEGIN/WHILE scripts.

These are the SQL front end's procedural escape hatches — parameterized
dashboards (variables), safe dynamic SQL (EXECUTE IMMEDIATE ... USING
binds values without string splicing), and multi-statement maintenance
scripts. Engine-only surface (DuckDB's procedural syntax differs), so
pinned by tests rather than the oracle registry.
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def test_session_variable_parameterizes_a_scan(spark):
    spark.read.parquet(f"{SF}/lineitem.parquet").createOrReplaceTempView(
        "li_vars"
    )
    try:
        spark.sql("DECLARE OR REPLACE VARIABLE qty_cap DOUBLE DEFAULT 10.0")
        spark.sql("SET VARIABLE qty_cap = 5.0")
        n_var = spark.sql(
            "SELECT COUNT(*) AS n FROM li_vars WHERE l_quantity < qty_cap"
        ).first()["n"]
        n_lit = spark.sql(
            "SELECT COUNT(*) AS n FROM li_vars WHERE l_quantity < 5.0"
        ).first()["n"]
        assert n_var == n_lit > 0
    finally:
        spark.catalog.dropTempView("li_vars")


def test_execute_immediate_binds_parameters(spark):
    spark.read.parquet(f"{SF}/orders.parquet").createOrReplaceTempView(
        "ord_exec"
    )
    try:
        rows = spark.sql(
            "EXECUTE IMMEDIATE "
            "'SELECT o_orderstatus, COUNT(*) AS n FROM ord_exec "
            "WHERE o_totalprice > ? GROUP BY o_orderstatus ORDER BY o_orderstatus' "
            "USING 50000.0"
        ).collect()
        direct = spark.sql(
            "SELECT o_orderstatus, COUNT(*) AS n FROM ord_exec "
            "WHERE o_totalprice > 50000.0 GROUP BY o_orderstatus "
            "ORDER BY o_orderstatus"
        ).collect()
        assert rows == direct and len(rows) > 0
    finally:
        spark.catalog.dropTempView("ord_exec")


def test_compound_script_loops_and_returns(spark):
    # 5 rounds of compound interest on an integer-cent principal —
    # the kind of driver-side scalar recurrence scripting exists for.
    r = spark.sql(
        """
        BEGIN
          DECLARE cents BIGINT DEFAULT 100000;
          DECLARE i INT DEFAULT 0;
          WHILE i < 5 DO
            SET cents = cents + CAST(FLOOR(cents * 0.05) AS BIGINT);
            SET i = i + 1;
          END WHILE;
          SELECT cents AS final_cents;
        END
        """
    ).first()["final_cents"]
    cents = 100000
    for _ in range(5):
        cents += cents * 5 // 100
    assert r == cents
