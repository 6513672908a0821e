"""Skew mitigation: salted two-phase aggregation.

At 100 TB a hot key (one symbol carrying 30% of trades) turns a
groupBy shuffle into a single straggler task. AQE's skew-join handling
covers joins; for aggregations the classic fix is salting: shard each
key into `n_salts` sub-keys, partially aggregate, then merge shards.
Results are identical to the unsalted aggregation for any
merge-decomposable aggregate (sum/count/min/max/decimal-sum).

At local scale this is pure overhead — it exists to be correct and
tested so the 100 TB configuration is a parameter change, not a
rewrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_expr(df: DataFrame, keys: Sequence[str], n_salts: int, salt_src: str | None) -> Column:
    """Deterministic per-row salt in [0, n_salts).

    Never derived from spark_partition_id(): a hot key concentrated in
    few input partitions (one symbol = one sorted file — the common
    physical layout) would collapse to one or two salt values and the
    skew relief would silently vanish. Instead hash row CONTENT
    (`salt_src` if given, else every non-key column), falling back to a
    row-id hash when the key columns are the whole row.
    """
    if salt_src:
        return F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int")
    non_key = [c for c in df.columns if c not in keys]
    if non_key:
        return F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(n_salts)).cast("int")
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 8,
    salt_src: str | None = None,
) -> DataFrame:
    """Two-phase grouped aggregation with salted shuffle keys.

    `aggs` maps output column -> (merge_fn_name, partial_agg_column);
    merge_fn_name in {'sum', 'min', 'max'} merges the per-salt partials.
    Salt derives from a deterministic content hash (see _salt_expr) so
    re-runs shard identically and file-local hot keys still fan out.
    """
    salt = _salt_expr(df, keys, n_salts, salt_src)
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[col.alias(f"__p_{out}") for out, (_, col) in aggs.items()]
    )
    merge = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return partial.groupBy(*keys).agg(
        *[merge[fn](f"__p_{out}").alias(out) for out, (fn, _) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src: Sequence[str],
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resilient equi-join for when the small side is too large to
    broadcast AND the join key is hot (one symbol/user carrying a large
    fraction of the fact rows — a straggler task under a plain shuffle
    join).

    The small side is replicated `n_salts` times (one copy per salt);
    the big side shards each key into `n_salts` sub-streams via a
    deterministic hash of `salt_src` (high-cardinality columns, so a
    hot key's rows spread across shards). Joining on (key, salt) then
    dropping the salt is row-for-row identical to the plain join —
    salting only changes the shuffle layout. AQE's skew-join split is
    the runtime alternative (tests/test_aqe.py); explicit salting is
    the plan-level one that also works mid-pipeline where AQE stats
    are not yet available.
    """
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts)).cast("int"),
    )
    return salted_big.join(salted_small, [key, "__salt"]).drop("__salt")
