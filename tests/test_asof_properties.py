"""Randomized cross-checks for operators/asof.py against a brute-force
reference: for each left row, scan ALL right rows with the same key and
pick the latest-at-or-before (backward) / earliest-at-or-after
(forward) match, with the optional staleness bound applied after.

The oracle-parity suite checks the operator against DuckDB's native
ASOF JOIN on the fixed events table; this file drives the operator over
seeded random shapes it does not see there — empty right sides, keys
only on one side, all-rows-tied boundaries, tolerance exactly at the
gap. Seeded `random` (not hypothesis): each example pays a Spark
round-trip, so a handful of deterministic seeds beats hundreds of
millisecond-budgeted draws.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.operators.asof import asof_join

TOL_US = 10 * 1_000_000  # '10 seconds'


def _gen(seed: int):
    rng = random.Random(seed)
    keys = list(range(rng.randint(1, 4)))
    # unique (key, ts) on the right side: ties among right rows make
    # "the" match ill-defined in any engine
    right = []
    for k in keys:
        for ts in rng.sample(range(0, 100), rng.randint(0, 12)):
            right.append((k, ts * 1_000_000, len(right) + 1000))
    left = []
    for i in range(rng.randint(1, 30)):
        k = rng.choice(keys + [99])  # 99: key with no right rows
        left.append((i, k, rng.randrange(0, 100) * 1_000_000))
    return left, right


def _brute(left, right, direction: str, tol_us: int | None):
    out = {}
    for lid, k, lts in left:
        cands = [r for r in right if r[0] == k]
        if direction == "backward":
            cands = [r for r in cands if r[1] <= lts]
            best = max(cands, key=lambda r: r[1], default=None)
        else:
            cands = [r for r in cands if r[1] >= lts]
            best = min(cands, key=lambda r: r[1], default=None)
        if best is not None and tol_us is not None and abs(best[1] - lts) > tol_us:
            best = None
        out[lid] = best[2] if best is not None else None
    return out


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
@pytest.mark.parametrize(
    "direction,tolerance",
    [("backward", None), ("forward", None), ("backward", "10 seconds")],
)
def test_asof_matches_brute_force(spark, seed, direction, tolerance):
    left, right = _gen(seed)
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, k, ts in left], "lid INT, k INT, ts_us BIGINT"
    ).withColumn("ts", F.timestamp_micros("ts_us"))
    rdf = spark.createDataFrame(
        [(k, ts, rid) for k, ts, rid in right] or [(None, None, None)],
        "k INT, ts_us BIGINT, rid INT",
    ).where(F.col("rid").isNotNull()).withColumn("ts", F.timestamp_micros("ts_us"))

    joined = asof_join(
        ldf,
        rdf.select("k", "ts", "rid"),
        on=["k"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["rid"],
        tolerance=tolerance,
        direction=direction,
    )
    got = {r["lid"]: r["asof_rid"] for r in joined.collect()}
    want = _brute(left, right, direction, TOL_US if tolerance else None)
    assert got == want, f"seed={seed} {direction} tol={tolerance}"


def _brute_nearest(left, right):
    out = {}
    for lid, k, lts in left:
        cands = [r for r in right if r[0] == k]
        back = max((r for r in cands if r[1] <= lts), key=lambda r: r[1], default=None)
        fwd = min((r for r in cands if r[1] >= lts), key=lambda r: r[1], default=None)
        if back is None and fwd is None:
            out[lid] = (None, None)
        elif fwd is None or (back is not None and lts - back[1] <= fwd[1] - lts):
            out[lid] = (back[2], "backward")
        else:
            out[lid] = (fwd[2], "forward")
    return out


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6, 7])
def test_asof_nearest_matches_brute_force(spark, seed):
    from binance_etl_spark.operators.asof import asof_join_nearest

    left, right = _gen(seed)
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, k, ts in left], "lid INT, k INT, ts_us BIGINT"
    ).withColumn("ts", F.timestamp_micros("ts_us"))
    rdf = spark.createDataFrame(
        [(k, ts, rid) for k, ts, rid in right] or [(None, None, None)],
        "k INT, ts_us BIGINT, rid INT",
    ).where(F.col("rid").isNotNull()).withColumn("ts", F.timestamp_micros("ts_us"))

    joined = asof_join_nearest(
        ldf,
        rdf.select("k", "ts", "rid"),
        on=["k"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["rid"],
    )
    got = {r["lid"]: (r["asof_rid"], r["asof_dir"]) for r in joined.collect()}
    want = _brute_nearest(left, right)
    assert got == want, f"seed={seed}"


def test_asof_null_right_col_comes_from_matched_row(spark):
    """Matched-row semantics under NULL right columns (ADVICE r2): if
    the as-of matched right row carries NULL in a right column, the
    output keeps that NULL — a per-column ignorenulls fill would
    silently substitute a FARTHER row's value. DuckDB ASOF JOIN keeps
    the matched row's NULL."""
    rdf = spark.createDataFrame(
        [(1, 0, 5), (1, 10, None)], "k INT, ts_us BIGINT, val INT"
    ).withColumn("ts", F.timestamp_micros("ts_us"))
    ldf = spark.createDataFrame([(1, 1, 11)], "lid INT, k INT, ts_us BIGINT").withColumn(
        "ts", F.timestamp_micros("ts_us")
    )
    out = asof_join(
        ldf, rdf.select("k", "ts", "val"), on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["val"],
    ).collect()
    assert len(out) == 1
    # matched row is ts=10 whose val is NULL -> stays NULL (not 5)
    assert out[0]["asof_val"] is None


def test_asof_nearest_null_right_col_agrees_with_direction(spark):
    """asof_join_nearest: values, matched ts, and asof_dir must all
    come from the SAME matched row even when that row has NULL columns
    (ADVICE r2 finding on per-column ignorenulls fills)."""
    from binance_etl_spark.operators.asof import asof_join_nearest

    # right: ts=0 val=100, ts=10 val=NULL, ts=20 val=777
    rdf = spark.createDataFrame(
        [(1, 0, 100), (1, 10, None), (1, 20, 777)], "k INT, ts_us BIGINT, val INT"
    ).withColumn("ts", F.timestamp_micros("ts_us"))
    # left ts=9: nearest is ts=10 (forward, dist 1) whose val is NULL
    ldf = spark.createDataFrame([(1, 1, 9)], "lid INT, k INT, ts_us BIGINT").withColumn(
        "ts", F.timestamp_micros("ts_us")
    )
    row = asof_join_nearest(
        ldf, rdf.select("k", "ts", "val"), on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["val"],
    ).collect()[0]
    assert row["asof_dir"] == "forward"
    assert row["asof_val"] is None  # from ts=10, NOT 777 from ts=20
