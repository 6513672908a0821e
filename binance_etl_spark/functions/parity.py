"""Cross-engine-deterministic aggregate helpers.

Floating-point SUM/AVG are order-dependent, and Spark's shuffle order is
not DuckDB's scan order — raw double aggregates would hash-mismatch the
oracle nondeterministically.  Policy (SURVEY.md §7 hard-part 4, mirroring
the reference's keep-decimals-exact property, reference
spot_trades_etl.py:52-53): cast to DECIMAL before summing (decimal
addition is associative/exact in both engines), and derive ratios from
exact decimal sums.

These helpers are also the right call at 100 TB: decimal partial
aggregation is still map-side combinable and whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default money/quantity decimal: wide enough for 100 TB-scale sums.
PREC, SCALE = 20, 6
SUM_PREC = 38


def dec(c: Column | str, prec: int = PREC, scale: int = SCALE) -> Column:
    """Cast (usually a double) to the engine decimal type."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({prec},{scale})")


def dsum(c: Column | str, scale: int = SCALE) -> Column:
    """Order-independent SUM: decimal-cast accumulation, DOUBLE output.

    Accumulation stays decimal (associative, exact, map-side combinable);
    only the FINAL result is cast to double so the output dtype normalizes
    identically across Spark and DuckDB client conversions (round-1 driver
    hashed DECIMAL(38,6) and DuckDB's repr differently despite identical
    values).
    """
    return F.sum(dec(c, PREC, scale)).cast("double")


def davg(c: Column | str, scale: int = SCALE) -> Column:
    """Order-independent AVG as double: exact decimal sum / count."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(dec(col, PREC, scale)).cast("double") / F.count(col)


def sql_dsum(expr: str, scale: int = SCALE) -> str:
    """DuckDB SQL equivalent of dsum()."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({PREC},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = SCALE) -> str:
    """DuckDB SQL equivalent of davg()."""
    return f"(CAST(SUM(CAST(({expr}) AS DECIMAL({PREC},{scale}))) AS DOUBLE) / COUNT({expr}))"
