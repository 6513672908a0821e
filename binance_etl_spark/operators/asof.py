"""As-of (temporal) join — Spark has no native ASOF JOIN; this composes
one from union + last(ignorenulls) over a window (SURVEY.md §2.5,
hard-part 2).

Semantics match DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND
l.ts >= r.ts`: each left row is matched to the right row with the
greatest right.ts <= left.ts for the same key (inclusive).

Scale analysis (why this beats a range self-join at 100 TB):
- a naive `l JOIN r ON l.key = r.key AND r.ts <= l.ts` explodes to
  O(|l| x matching |r|) intermediate rows before a per-left-row argmax;
- the union trick is one shuffle on `key` + one window sort: rows stay
  O(|l| + |r|) end-to-end, skew handled by AQE like any window.
For extreme per-key cardinality, pre-bucket both sides by
(key, time_bucket) and run the same trick per bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (emitter), 1 = left (receiver)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: str | None = None,
    direction: str = "backward",
    prefilter: bool = False,
) -> DataFrame:
    """For each left row, attach `right_cols` from the matching right
    row per `on` key: the latest right_ts <= left_ts (backward,
    default) or the earliest right_ts >= left_ts (forward — the
    "next quote after the order" direction). Right columns come back
    prefixed `asof_`. `tolerance` (e.g. '1 hour') nulls out matches
    further than that from left_ts in the match direction.

    `prefilter` (round-11): NULL-SAFE semi-join the RIGHT side down to
    keys present on the left BEFORE the union+window — the runtime
    row-level filter Spark's bloom-filter join injection would give a
    shuffle join but cannot inject into this union+window shape.
    Provably result-identical: the window partitions by the key, so a
    right row whose key has no left receiver can never be selected —
    it only costs shuffle+sort bytes. (The semi-join must be <=>, not
    =: partitionBy groups NULL keys together, so NULL-keyed rows match
    each other in the window and the filter must keep them.) When the probe key set is small
    (a SPARSE probe against a broad reference — the 100 TB win), AQE
    plans the semi-join as a broadcast, i.e. a map-side filter on the
    reference scan with NO extra shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    right_cols = list(right_cols)
    if prefilter:
        # NULL-SAFE semi-join: the window below partitions by the key,
        # which groups NULL keys into one partition — so NULL-keyed
        # left rows DO receive NULL-keyed right matches. A plain
        # equi-semi-join (NULL != NULL) would drop those right rows
        # and change results; <=> keeps the filter result-identical.
        probe = left.select(*on).distinct()
        cond = None
        for c in on:
            t = right[c].eqNullSafe(probe[c])
            cond = t if cond is None else (cond & t)
        right = right.join(probe, cond, "left_semi")

    lhs = left.withColumn(_SIDE, F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs_proj = [F.col(c) for c in on] + [F.col(right_ts).alias("__ts"), F.lit(0).alias(_SIDE)]
    rhs_proj += [F.col(c).alias(f"asof_{c}") for c in right_cols]
    rhs = right.select(*rhs_proj)

    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    for c in rhs.columns:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None).cast(rhs.schema[c].dataType))
    unioned = lhs.unionByName(rhs)

    # Fill from ONE struct of (emitter ts, all right columns), non-null
    # exactly on emitter rows: last/first(ignorenulls) then picks a
    # whole matched ROW atomically, so every asof_<col> (and the
    # tolerance check's matched ts) comes from the SAME right row even
    # when that row carries NULL in some right column. Per-column
    # ignorenulls fills would silently substitute a farther row's value
    # for NULL columns — DuckDB ASOF JOIN keeps the matched row's NULL.
    payload = F.when(
        F.col(_SIDE) == 0,
        F.struct(
            F.col("__ts").alias("__asof_ts"),
            *[F.col(f"asof_{c}") for c in right_cols],
        ),
    )
    if direction == "backward":
        # Right rows sort before left rows at equal ts -> inclusive
        # (>=) match; take the LAST emitter at or before each receiver.
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts"), F.col(_SIDE))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pay = F.last(payload, ignorenulls=True).over(w)
    else:
        # Left rows sort before right rows at equal ts -> inclusive
        # (<=) match; take the FIRST emitter at or after each receiver.
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts"), F.col(_SIDE).desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pay = F.first(payload, ignorenulls=True).over(w)

    filled = unioned.withColumn("__pay", pay)
    if tolerance is not None:
        asof_ts = F.col("__pay.__asof_ts")
        delta = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            too_far = asof_ts < F.col("__ts") - delta
        else:
            too_far = asof_ts > F.col("__ts") + delta
        filled = filled.withColumn(
            "__pay", F.when(too_far, F.lit(None)).otherwise(F.col("__pay"))
        )
    for c in right_cols:
        filled = filled.withColumn(f"asof_{c}", F.col(f"__pay.asof_{c}"))
    return filled.where(F.col(_SIDE) == 1).drop(_SIDE, "__ts", "__pay")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """Each left row matched to the CLOSER of its backward and forward
    as-of matches (ties -> backward) — the 'nearest observation'
    variant used for sensor/quote alignment. Same union trick; both
    directions ride windows over the SAME key partitioning, so the
    whole operator is still ONE shuffle (two in-partition sorts).
    Adds `asof_dir` ('backward'|'forward'|null) beside the prefixed
    right columns.
    """
    on = list(on)
    right_cols = list(right_cols)

    lhs = left.withColumn(_SIDE, F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs_proj = [F.col(c) for c in on] + [F.col(right_ts).alias("__ts"), F.lit(0).alias(_SIDE)]
    rhs_proj += [F.col(c).alias(f"asof_{c}") for c in right_cols]
    rhs = right.select(*rhs_proj)
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    for c in rhs.columns:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None).cast(rhs.schema[c].dataType))
    unioned = lhs.unionByName(rhs)

    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col(_SIDE).desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # As in asof_join: one struct payload per direction, so the chosen
    # direction's values, timestamp, and asof_dir all come from the
    # SAME matched right row — per-column ignorenulls fills could
    # disagree with asof_dir when the nearest row has NULL columns.
    payload = F.when(
        F.col(_SIDE) == 0,
        F.struct(
            F.col("__ts").alias("__asof_ts"),
            *[F.col(f"asof_{c}") for c in right_cols],
        ),
    )
    b_pay = F.last(payload, ignorenulls=True).over(wb)
    f_pay = F.first(payload, ignorenulls=True).over(wf)
    b_ts = b_pay.getField("__asof_ts")
    f_ts = f_pay.getField("__asof_ts")
    us = F.unix_micros(F.col("__ts"))
    use_b = f_ts.isNull() | (
        b_ts.isNotNull() & ((us - F.unix_micros(b_ts)) <= (F.unix_micros(f_ts) - us))
    )
    out = unioned.withColumn("__pay", F.when(use_b, b_pay).otherwise(f_pay))
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.col(f"__pay.asof_{c}"))
    out = out.withColumn(
        "asof_dir",
        F.when(b_ts.isNull() & f_ts.isNull(), F.lit(None).cast("string"))
        .when(use_b, F.lit("backward"))
        .otherwise(F.lit("forward")),
    )
    return out.where(F.col(_SIDE) == 1).drop(_SIDE, "__ts", "__pay")
