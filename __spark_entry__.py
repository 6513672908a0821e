"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over binance_etl_spark.plans.registry: every operator from
SURVEY.md §2 is registered there with a (spark, sf_dir) -> DataFrame
callable and, when SQL-expressible, a DuckDB oracle SQL string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this module from any cwd; the engine package
# lives next to this file.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binance_etl_spark.plans import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    fns = _registry.queries()
    return fns["agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
