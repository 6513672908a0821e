"""Bucketed interval join — the 100 TB path for time-range joins.

A naive `l JOIN r ON l.key = r.key AND r.ts BETWEEN l.ts - w AND l.ts`
hash-joins on `key` alone; one hot key degenerates to a giant
post-filtered partition. Bucketing adds a time-bucket equi-key: each
left row joins buckets [floor((ts-w)/w) .. floor(ts/w)], so the join
key becomes (key, bucket) and the residual range filter touches only
±1 bucket of rows per left row. Results are provably identical to the
naive join (tests/test_interval_op.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window: str,
    how: str = "inner",
) -> DataFrame:
    """Join right rows with right_ts in [left_ts - window, left_ts).

    `window` is an interval literal like '30 minutes'. Right columns
    come back prefixed `r_`.
    """
    w_us = F.expr(f"unix_micros(TIMESTAMP '1970-01-01 00:00:00' + INTERVAL {window})")
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    lhs = left.withColumn("__bucket", F.explode(F.sequence(
        F.floor((l_us - w_us) / w_us), F.floor(l_us / w_us)
    )))
    rhs_cols = [F.col(c).alias(f"r_{c}") for c in right.columns]
    rhs = right.select(*rhs_cols).withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(f"r_{right_ts}")) / w_us)
    )
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (lhs["__bucket"] == rhs["__bucket"])
        & (F.col(f"r_{right_ts}") >= F.col(left_ts) - F.expr(f"INTERVAL {window}"))
        & (F.col(f"r_{right_ts}") < F.col(left_ts))
    )
    inner = lhs.join(rhs, cond, "inner").drop("__bucket")
    if how == "inner":
        return inner
    if how != "left":
        raise ValueError(f"unsupported how={how!r}; use 'inner' or 'left'")
    # LEFT: bucket fan-out means a left row joins one row per bucket —
    # a per-bucket miss would fabricate (left, NULL) rows even when
    # another bucket matched. Build misses explicitly instead. The
    # anti-join must use NULL-SAFE equality: with plain `=`, a left row
    # containing any NULL column never matches matched_keys (NULL = NULL
    # is not true) and would be re-emitted as a fabricated miss row in
    # addition to its inner matches.
    matched_keys = inner.select(*left.columns).dropDuplicates()
    anti_cond = None
    for c in left.columns:
        eq = left[c].eqNullSafe(matched_keys[c])
        anti_cond = eq if anti_cond is None else anti_cond & eq
    misses = left.join(matched_keys, anti_cond, "left_anti")
    for c in right.columns:
        misses = misses.withColumn(f"r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    return inner.unionByName(misses)


def interval_join_naive(
    left: DataFrame, right: DataFrame, key: str, left_ts: str, right_ts: str, window: str,
    how: str = "inner",
) -> Column:
    rhs = right.select(*[F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") >= F.col(left_ts) - F.expr(f"INTERVAL {window}"))
        & (F.col(f"r_{right_ts}") < F.col(left_ts))
    )
    return left.join(rhs, cond, how)
