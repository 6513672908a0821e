"""Round-11 op tests: stream-stream join watermark semantics.

The parity sweep already exact-value-checks stream_join_late_watermark
against its DuckDB oracle; these tests pin the SEMANTIC FACTS the
oracle encodes, so a fixture edit that silently stops exercising a
branch fails loudly (the round-10 discipline, tests/test_round10_ops.py).
"""

from __future__ import annotations

from binance_etl_spark.plans.analytics8 import (
    _SJ_DELAY_MS,
    _SJ_DEPTH,
    _SJ_TRADES,
    stream_join_late_watermark,
)

SF = "/root/testdata/sf0.001"


def _watermarks() -> list[float]:
    """Watermark entering each phase (ms), per the verified rule:
    min over both inputs of cumulative prior-phase max, minus delay."""
    wms: list[float] = [float("-inf")]
    tmax = dmax = None
    for tph, dph in zip(_SJ_TRADES[:-1], _SJ_DEPTH[:-1]):
        for off, _, _ in tph:
            tmax = off if tmax is None else max(tmax, off)
        for off, _, _ in dph:
            dmax = off if dmax is None else max(dmax, off)
        wms.append(min(tmax, dmax) - _SJ_DELAY_MS)
    return wms


def _expected_pairs() -> set[tuple[int, int]]:
    """Pure-Python twin of the oracle: drops + interval join."""
    wms = _watermarks()
    t_adm = [
        (off, sym, i)
        for ph, rows in enumerate(_SJ_TRADES)
        for off, sym, i in rows
        if off > wms[ph]
    ]
    d_adm = [
        (off, sym, i)
        for ph, rows in enumerate(_SJ_DEPTH)
        for off, sym, i in rows
        if off > wms[ph]
    ]
    return {
        (ti, di)
        for toff, tsym, ti in t_adm
        for doff, dsym, di in d_adm
        if tsym == dsym and toff - 1000 <= doff <= toff + 1000
    }


def test_fixture_fires_every_branch():
    """The tape must keep exercising each semantic branch."""
    wms = _watermarks()
    # boundary drop: trade 7 sits EXACTLY at its phase watermark
    assert any(
        off == wms[ph]
        for ph, rows in enumerate(_SJ_TRADES)
        for off, _, _ in rows
    ), "no row at the exact watermark boundary"
    # min policy must BIND somewhere: a phase where one side's own
    # max-minus-delay exceeds the global watermark
    tmax = dmax = None
    binds = False
    for ph in range(1, len(_SJ_TRADES)):
        for off, _, _ in _SJ_TRADES[ph - 1]:
            tmax = off if tmax is None else max(tmax, off)
        for off, _, _ in _SJ_DEPTH[ph - 1]:
            dmax = off if dmax is None else max(dmax, off)
        if max(tmax, dmax) - _SJ_DELAY_MS > wms[ph]:
            binds = True
    assert binds, "min-of-inputs watermark policy never binds"
    # at least one drop on EACH side
    assert any(
        off <= wms[ph]
        for ph, rows in enumerate(_SJ_TRADES)
        for off, _, _ in rows
    )
    assert any(
        off <= wms[ph]
        for ph, rows in enumerate(_SJ_DEPTH)
        for off, _, _ in rows
    )
    exp = _expected_pairs()
    # cross-phase pair (state retention) and inclusive-edge pair
    assert (6, 103) in exp, "2-phase state retention pair missing"
    assert (5, 108) in exp, "inclusive +/-1s edge pair missing"


def test_stream_join_matches_python_twin(spark):
    df = stream_join_late_watermark(spark, SF)
    got = {(r["trade_id"], r["depth_id"]) for r in df.collect()}
    assert got == _expected_pairs()
    # specific branch facts (verified on Spark 4.1, module docstring):
    assert (7, 107) not in got, "boundary row (ev == wm) must drop"
    assert (4, 104) not in got, "late-dropped depth row must kill pair"
    assert (4, 105) in got, "late-but-admitted pair must survive"
    assert (10, 103) not in got and (10, 106) not in got, (
        "deep-late trade must drop even though matches sit in state"
    )


# --- ADVICE r10: hub-cap must not bind at oracle-compare scales ------


def test_common_neighbors_hub_cap_never_binds_at_oracle_scale(spark):
    """graph_common_neighbors computes degrees on the hub-SCREENED
    edge list while its registered DuckDB oracle uses full degrees —
    identical only while the default hub_cap (100k) never binds. Pin
    that at BOTH oracle-compare scales (driver sf0.01, local sweep
    sf0.1) the max degree stays an order of magnitude under the cap,
    so a data regrowth that approaches it fails here before parity
    silently diverges."""
    from pyspark.sql import functions as F

    from binance_etl_spark.catalog import load

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        e = load(spark, sf_dir, "events")
        dst = (F.col("user_id") * 13 + F.length("event_type")) % 100
        fwd = e.select(F.col("user_id").alias("a"), dst.alias("b"))
        rev = e.select(dst.alias("a"), F.col("user_id").alias("b"))
        ue = fwd.unionAll(rev).where(F.col("a") != F.col("b")).distinct()
        max_deg = (
            ue.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
            .agg(F.max("d").alias("m"))
            .collect()[0]["m"]
        )
        assert max_deg * 10 <= 100_000, (
            f"{sf_dir}: max degree {max_deg} within 10x of the default "
            "hub_cap — screen the oracle's deg CTE or raise the cap"
        )


def test_rotation_prefers_never_driver_sampled_keys():
    """r10 verdict item 7: while never-driver-sampled oracle keys
    remain, the 50-key rotation must consist ONLY of them — the
    already-sampled set re-enters only once the remainder is
    exhausted."""
    from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
    from binance_etl_spark.plans.rotation import (
        ROTATION_SIZE,
        last_driver_sample_round,
        rotation_keys,
    )

    _ensure_loaded()
    seen = last_driver_sample_round()
    oracled = {n for n, q in REGISTRY.items() if q.oracle is not None}
    never = {n for n in oracled if seen.get(n, 0) == 0}
    picked = set(rotation_keys())
    if len(never) >= ROTATION_SIZE:
        assert picked <= never, sorted(picked - never)
    else:
        assert never <= picked


# --- join_asof_prefiltered: plan pin + result equivalence ------------


def test_asof_prefilter_is_broadcast_semi_and_result_identical(spark):
    """prefilter=True must (a) change NOTHING about the result — the
    window partitions by key, so reference rows with keyless-on-the-
    left keys can never be selected — and (b) plan the probe-key
    filter as a BROADCAST semi-join (map-side filter on the reference
    scan, no extra shuffle) at this scale."""
    from pyspark.sql import functions as F

    from binance_etl_spark.catalog import load
    from binance_etl_spark.operators.asof import asof_join

    e = load(spark, "/root/testdata/sf0.01", "events")
    purchases = e.where(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 97 == 0)
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    kw = dict(
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
    )
    cols = ["event_id", "user_id", "asof_event_id", "asof_value"]
    fast = asof_join(purchases, views, prefilter=True, **kw).select(*cols)
    slow = asof_join(purchases, views, prefilter=False, **kw).select(*cols)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, slow.collect())
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan, (
        "probe-key filter must broadcast at sparse-probe scale"
    )


# --- incremental spans: affected-docs evidence ------------------------


def test_spans_refresh_touches_only_affected_docs(spark, tmp_path):
    """The refresh recomputes spans ONLY for (holders of flipped
    grams) + (delta docs): on a corpus of 100 unique docs, appending
    one doc that repeats doc 7's text must flip exactly doc 7's grams
    and recompute 2 docs, not 101 — and the resulting spans must be
    the full-text span for both."""
    from binance_etl_spark.operators import snapshots as SNAP
    from binance_etl_spark.plans.spans_index import build_spans_index

    words = lambda i: " ".join(f"w{i}_{j}" for j in range(12))  # noqa: E731
    base = spark.createDataFrame(
        [(i, words(i)) for i in range(100)], "doc_id BIGINT, text STRING"
    )
    root = str(tmp_path / "idx")
    ev1 = build_spans_index(base, root)
    assert ev1["n_delta_docs"] == 100
    assert SNAP.read_version(spark, f"{root}/spans").count() == 0

    delta = spark.createDataFrame(
        [(1000, words(7))], "doc_id BIGINT, text STRING"
    )
    ev2 = build_spans_index(delta, root)
    assert ev2["n_affected_docs"] == 2, ev2
    assert ev2["n_flipped_grams"] == 12 - 5 + 1  # doc 7's gram count
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["longest_span"])
        for r in SNAP.read_version(spark, f"{root}/spans").collect()
    }
    assert got == {7: (1, 12, 12), 1000: (1, 12, 12)}

    # second refresh repeating doc 3's text: doc 7/1000 spans carry
    # untouched (their files carry by name in the MERGE)
    ev3 = build_spans_index(
        spark.createDataFrame(
            [(2000, words(3))], "doc_id BIGINT, text STRING"
        ),
        root,
    )
    assert ev3["n_affected_docs"] == 2
    got = {
        r["doc_id"]: r["n_spans"]
        for r in SNAP.read_version(spark, f"{root}/spans").collect()
    }
    assert got == {7: 1, 1000: 1, 3: 1, 2000: 1}


# --- LEFT OUTER stream-stream join: eviction-timed NULL rows ----------


def test_stream_outer_join_null_row_semantics(spark):
    """Branch facts for stream_join_outer_watermark (verified on Spark
    4.1, module fixture comments): NULL rows emit iff the admitted
    left row is unmatched AND t_ev + tol < the FINAL watermark,
    STRICTLY — plus the inner drop rule and left-outer asymmetry."""
    from binance_etl_spark.plans.analytics8 import (
        stream_join_outer_watermark,
    )

    df = stream_join_outer_watermark(spark, SF)
    got = {(r["trade_id"], r["depth_id"]) for r in df.collect()}
    assert {(1, 101), (5, 105), (6, 106), (99, 199)} <= got
    assert {(50, None), (7, None), (60, None)} <= got, (
        "evictable unmatched lefts must emit NULL rows"
    )
    tids = {t for t, _ in got}
    assert 61 not in tids, "row exactly AT final_wm - tol must be HELD"
    assert 62 not in tids, "row above the eviction threshold never emits"
    assert 3 not in tids, "dropped-late left must vanish (no NULL row)"
    assert not any(d == 150 for _, d in got), (
        "unmatched RIGHT rows emit nothing in a LEFT outer join"
    )
    assert len(got) == 7


def test_stream_full_outer_join_symmetric_null_rows(spark):
    """Branch facts for stream_join_full_watermark: both sides' NULL
    rows follow the symmetric STRICT eviction rule; dropped-late rows
    on either side vanish."""
    from binance_etl_spark.plans.analytics8 import (
        stream_join_full_watermark,
    )

    df = stream_join_full_watermark(spark, SF)
    got = {(r["trade_id"], r["depth_id"]) for r in df.collect()}
    assert {(1, 101), (5, 105), (99, 199)} <= got
    assert {(70, None), (72, None)} <= got, "left NULL rows"
    assert {(None, 103), (None, 170), (None, 172)} <= got, "right NULL rows"
    tids = {t for t, _ in got if t is not None}
    dids = {d for _, d in got if d is not None}
    assert 73 not in tids and 173 not in dids, "boundary rows held (strict)"
    assert 74 not in tids and 174 not in dids, "above-threshold rows never"
    assert 71 not in tids and 171 not in dids, "dropped-late rows vanish"
    assert len(got) == 8


# --- asymmetric watermark delays: absorption generalizes -------------


def test_stream_join_asymmetric_delays_match_twin(spark):
    """UNEQUAL watermark delays (trades 10s, depth 3s): there is still
    ONE global watermark = min(tmax - 10s, dmax - 3s), rows drop iff
    ev <= it, and state eviction still cannot exclude a pair both of
    whose rows were admitted — the absorption proof needs only a
    single global watermark, not equal delays (partner of an admitted
    row at wm has ev > wm - tol, strictly above the eviction line).
    The tape makes the BINDING side flip: phase 1 binds on the
    long-delay trades side (trade @0.5s admitted although the depth
    side's own max-minus-delay is 7.5s), phase 2 binds on the
    short-delay depth side (depth @7.5s drops AT the boundary), and a
    phase-1 trade in state matches a phase-3 depth across the flip.
    Runs through the shared _run_stream_join driver with per-side
    delays — the same machinery as the three registered ops."""
    from binance_etl_spark.plans.analytics8 import _run_stream_join

    T_DELAY, D_DELAY, TOL = 10_000, 3_000, 1_000
    TR = [
        [(10_000, "AAA", 1)],
        [(500, "AAA", 2), (30_000, "AAA", 3)],
        [(8_000, "AAA", 4)],
        [(19_000, "AAA", 5), (29_500, "AAA", 6)],
    ]
    DP = [
        [(10_500, "AAA", 101)],
        [(900, "AAA", 102)],
        [(7_500, "AAA", 103), (8_400, "AAA", 104), (40_000, "AAA", 105)],
        [(30_200, "AAA", 106)],
    ]

    # pure-Python twin: global wm entering each phase, drops, join
    wms = [float("-inf")]
    tmax = dmax = None
    for tph, dph in zip(TR[:-1], DP[:-1]):
        for off, _, _ in tph:
            tmax = off if tmax is None else max(tmax, off)
        for off, _, _ in dph:
            dmax = off if dmax is None else max(dmax, off)
        wms.append(min(tmax - T_DELAY, dmax - D_DELAY))
    t_adm = [
        (off, i)
        for ph, rows in enumerate(TR)
        for off, _, i in rows
        if off > wms[ph]
    ]
    d_adm = [
        (off, i)
        for ph, rows in enumerate(DP)
        for off, _, i in rows
        if off > wms[ph]
    ]
    expected = {
        (ti, di)
        for toff, ti in t_adm
        for doff, di in d_adm
        if abs(toff - doff) <= TOL
    }
    # fixture sanity: the flip fires
    assert wms[1] == 0 and wms[2] == 7_500 and wms[3] == 20_000
    assert expected == {(1, 101), (2, 102), (4, 104), (6, 106), (3, 106)}

    df = _run_stream_join(
        spark, TR, DP, "inner", "besk_sja_",
        t_delay_ms=T_DELAY, d_delay_ms=D_DELAY,
    )
    got = {(r["trade_id"], r["depth_id"]) for r in df.collect()}
    assert got == expected
    # branch facts: long-delay side sets the early watermark (trade 2
    # admitted), short-delay side binds later (depth 103 boundary
    # drop), and the cross-flip state pair (3, 106) survives eviction
    assert (2, 102) in got
    assert all(di != 103 for _, di in got)
    assert (3, 106) in got

def test_spans_concurrent_counts_writer_detected(spark, tmp_path, monkeypatch):
    """The spans refresh derives merged nd values from the counts
    table it read — an interloper's counts merge in between would
    lose its increments on shared grams (and the flip detection with
    them). snapshots.assert_serial_apply raises; redelivery re-reads
    counts including the interloper and heals."""
    import pytest

    from binance_etl_spark.operators import snapshots as SNAP
    from binance_etl_spark.plans.spans_index import build_spans_index

    words = lambda i: " ".join(f"w{i}_{j}" for j in range(12))  # noqa: E731
    base = spark.createDataFrame(
        [(i, words(i)) for i in range(10)], "doc_id BIGINT, text STRING"
    )
    root = str(tmp_path / "idx")
    build_spans_index(base, root, batch_id=0)
    counts_t = f"{root}/counts"

    import binance_etl_spark.operators.snapshots as SNAP_mod

    real = SNAP_mod.merge_into
    fired = {"done": False}

    def racy(spark_, table_dir, source, keys, *a, **kw):
        if table_dir.endswith("/counts") and not fired["done"]:
            fired["done"] = True
            interloper = spark.createDataFrame(
                [("w0_0 w0_1 w0_2 w0_3 w0_4", 2)], "gram string, nd int"
            )
            real(spark, table_dir, interloper, ["gram"])
        return real(spark_, table_dir, source, keys, *a, **kw)

    monkeypatch.setattr(SNAP_mod, "merge_into", racy)
    with pytest.raises(RuntimeError, match="concurrent writers"):
        build_spans_index(
            spark.createDataFrame(
                [(1000, words(7))], "doc_id BIGINT, text STRING"
            ),
            root,
            batch_id=1,
        )
    monkeypatch.setattr(SNAP_mod, "merge_into", real)
    ev = build_spans_index(
        spark.createDataFrame(
            [(1000, words(7))], "doc_id BIGINT, text STRING"
        ),
        root,
        batch_id=1,
    )
    assert ev.get("replayed") is not True
    got = {
        r["doc_id"]: r["n_spans"]
        for r in SNAP.read_version(spark, f"{root}/spans").collect()
    }
    assert got == {7: 1, 1000: 1}


def test_spans_crash_at_every_subcommit_boundary_heals(spark, tmp_path):
    """Spans-index exactly-once artillery (the dedup-index discipline,
    tests/test_dedup_index.py): for crash points after the postings
    commit and after the counts commit, on a FIRST and a LATER batch,
    simulate the partial apply with the batch's token, redeliver, and
    assert served spans equal a clean two-batch run. Pins the two
    round-11 fixes: first-ness judged on the spans table (a crashed
    first batch re-takes the build path instead of wedging on a
    missing counts table), and the pre-batch counts rewind (a crash
    between the counts merge and the spans merge must not erase the
    flip detection on redelivery)."""
    from pyspark.sql import functions as F

    from binance_etl_spark.operators import snapshots as SNAP
    from binance_etl_spark.plans.llm_ops10 import _gram_stream
    from binance_etl_spark.plans.spans_index import build_spans_index

    words = lambda i: " ".join(f"w{i}_{j}" for j in range(12))  # noqa: E731
    b = {
        0: spark.createDataFrame(
            [(i, words(i)) for i in range(8)], "doc_id BIGINT, text STRING"
        ),
        1: spark.createDataFrame(
            [(1000, words(3)), (1001, words(4))], "doc_id BIGINT, text STRING"
        ),
    }

    clean = str(tmp_path / "clean")
    for i in (0, 1):
        build_spans_index(b[i], clean, batch_id=i)

    def _spans(root):
        return sorted(
            (r["doc_id"], r["n_spans"], r["dup_tokens"])
            for r in SNAP.read_version(spark, f"{root}/spans").collect()
        )

    want = _spans(clean)
    assert {d for d, _, _ in want} == {3, 4, 1000, 1001}

    def _partial_apply(root, batch_id, upto):
        # mirror build_spans_index's commit prefix: postings, counts
        g = _gram_stream(b[batch_id]).localCheckpoint()
        dnd = g.groupBy("gram").agg(
            F.countDistinct("doc_id").alias("nd_delta")
        )
        if upto >= 1:
            SNAP.write_version(g, f"{root}/postings", batch_id=batch_id)
        if upto >= 2:
            counts_t = f"{root}/counts"
            if not SNAP.main_versions(counts_t):
                SNAP.write_version(
                    dnd.select("gram", F.col("nd_delta").alias("nd")),
                    counts_t,
                    batch_id=batch_id,
                )
            else:
                old = (
                    SNAP.read_version(spark, counts_t)
                    .join(dnd.select("gram"), "gram", "left_semi")
                    .withColumnRenamed("nd", "nd_old")
                )
                merged = (
                    dnd.join(old, "gram", "left")
                    .select(
                        "gram",
                        (
                            F.col("nd_delta")
                            + F.coalesce(F.col("nd_old"), F.lit(0))
                        ).alias("nd"),
                    )
                    .localCheckpoint()
                )
                SNAP.merge_into(
                    spark, counts_t, merged, ["gram"], batch_id=batch_id
                )

    for crash_batch, upto in [(0, 1), (0, 2), (1, 1), (1, 2)]:
        root = str(tmp_path / f"c{crash_batch}_{upto}")
        for i in range(crash_batch):
            build_spans_index(b[i], root, batch_id=i)
        _partial_apply(root, crash_batch, upto)
        for i in range(crash_batch, 2):
            build_spans_index(b[i], root, batch_id=i)
        assert _spans(root) == want, (crash_batch, upto)
        assert len(SNAP.main_versions(f"{root}/postings")) == 2, (
            crash_batch,
            upto,
        )


def test_spans_redelivery_survives_vacuum_of_prebatch_counts(spark, tmp_path):
    """The crash-redelivery rewind is ALGEBRAIC (pre-batch nd =
    current nd - our delta), not a historical-version read — so a
    vacuum that expires the pre-batch counts version between the
    crash and the redelivery cannot wedge or corrupt the heal."""
    from pyspark.sql import functions as F

    from binance_etl_spark.operators import snapshots as SNAP
    from binance_etl_spark.plans.llm_ops10 import _gram_stream
    from binance_etl_spark.plans.spans_index import build_spans_index

    words = lambda i: " ".join(f"w{i}_{j}" for j in range(12))  # noqa: E731
    b0 = spark.createDataFrame(
        [(i, words(i)) for i in range(8)], "doc_id BIGINT, text STRING"
    )
    b1 = spark.createDataFrame(
        [(1000, words(3))], "doc_id BIGINT, text STRING"
    )
    clean = str(tmp_path / "clean")
    build_spans_index(b0, clean, batch_id=0)
    build_spans_index(b1, clean, batch_id=1)
    want = sorted(
        (r["doc_id"], r["n_spans"])
        for r in SNAP.read_version(spark, f"{clean}/spans").collect()
    )
    assert want == [(3, 1), (1000, 1)]

    root = str(tmp_path / "t")
    build_spans_index(b0, root, batch_id=0)
    # crash after batch 1's postings + counts commits
    g = _gram_stream(b1).localCheckpoint()
    dnd = g.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd_delta"))
    counts_t = f"{root}/counts"
    SNAP.write_version(g, f"{root}/postings", batch_id=1)
    old = (
        SNAP.read_version(spark, counts_t)
        .join(dnd.select("gram"), "gram", "left_semi")
        .withColumnRenamed("nd", "nd_old")
    )
    merged = (
        dnd.join(old, "gram", "left")
        .select(
            "gram",
            (F.col("nd_delta") + F.coalesce("nd_old", F.lit(0))).alias("nd"),
        )
        .localCheckpoint()
    )
    SNAP.merge_into(spark, counts_t, merged, ["gram"], batch_id=1)
    # vacuum expires the pre-batch counts version's bytes
    ev = SNAP.vacuum(counts_t, keep_last=1, retain_seconds=0.0)
    assert len(SNAP.main_versions(counts_t)) == 1
    # redelivery heals anyway
    build_spans_index(b1, root, batch_id=1)
    got = sorted(
        (r["doc_id"], r["n_spans"])
        for r in SNAP.read_version(spark, f"{root}/spans").collect()
    )
    assert got == want


def test_asof_prefilter_keeps_null_key_matches(spark):
    """partitionBy groups NULL keys into one window partition, so
    NULL-keyed left rows receive NULL-keyed right matches — the
    prefilter semi-join must be null-safe (<=>) to stay
    result-identical."""
    from binance_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, 10, "l1"), (1, 10, "l2")], "k int, ts int, lid string"
    )
    right = spark.createDataFrame(
        [(None, 5, 100.0), (1, 7, 200.0)], "k int, ts int, value double"
    )
    kw = dict(on=["k"], left_ts="ts", right_ts="ts", right_cols=["value"])
    cols = ["lid", "asof_value"]
    slow = sorted(
        map(tuple, asof_join(left, right, prefilter=False, **kw).select(*cols).collect())
    )
    fast = sorted(
        map(tuple, asof_join(left, right, prefilter=True, **kw).select(*cols).collect())
    )
    assert slow == fast == [("l1", 100.0), ("l2", 200.0)]
