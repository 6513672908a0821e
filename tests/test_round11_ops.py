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
