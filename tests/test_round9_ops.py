"""Round-9 wave invariants: brute-force Python twins at sf0.001 for
the rank tests, plus structural invariants for SAX and the
completeness matrix. The DuckDB oracle parity suite checks
cross-engine exactness; these check the MATH is the textbook math."""

from __future__ import annotations

from collections import Counter

import pytest

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    from binance_etl_spark.catalog import load

    return [
        (r["event_type"], int(r["v"]), int(r["y"]))
        for r in load(spark, SF_DIR, "events")
        .selectExpr(
            "event_type",
            "CAST(floor(value * 100) AS BIGINT) AS v",
            "unix_micros(ts) DIV 1000000 AS y",
        )
        .collect()
    ]


def _midranks(vals: list[int]) -> dict[int, float]:
    """value -> average (mid) rank, textbook definition."""
    out: dict[int, float] = {}
    pos = 0
    for v, c in sorted(Counter(vals).items()):
        out[v] = pos + (c + 1) / 2
        pos += c
    return out


def test_kruskal_wallis_matches_textbook(spark):
    rows = _events(spark)
    got = REGISTRY["stats_kruskal_wallis"].fn(spark, SF_DIR).collect()[0]
    all_v = [v for _, v, _ in rows]
    mr = _midranks(all_v)
    n = len(all_v)
    groups: dict[str, list[int]] = {}
    for t, v, _ in rows:
        groups.setdefault(t, []).append(v)
    h = 12 / (n * (n + 1)) * sum(
        sum(mr[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
    ) - 3 * (n + 1)
    tie = sum(c**3 - c for c in Counter(all_v).values())
    assert got["n_total"] == n
    assert got["tie_sum"] == tie
    assert got["h_stat"] == pytest.approx(h, rel=1e-12)
    assert got["h_tie_corrected"] == pytest.approx(
        h / (1 - tie / (n**3 - n)), rel=1e-12
    )


def test_spearman_matches_textbook_and_rank_invariant(spark):
    import math

    rows = _events(spark)
    got = {
        r["event_type"]: r
        for r in REGISTRY["stats_spearman"].fn(spark, SF_DIR).collect()
    }
    groups: dict[str, list[tuple[int, int]]] = {}
    for t, v, y in rows:
        groups.setdefault(t, []).append((v, y))
    for t, pairs in groups.items():
        n = len(pairs)
        rx = _midranks([v for v, _ in pairs])
        ry = _midranks([y for _, y in pairs])
        xs = [rx[v] for v, _ in pairs]
        ys = [ry[y] for _, y in pairs]
        # midrank invariant: ranks sum to n(n+1)/2 regardless of ties
        assert sum(xs) == pytest.approx(n * (n + 1) / 2)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        rho = (n * sxy - sx * sy) / math.sqrt(n * sxx - sx * sx) / math.sqrt(
            n * syy - sy * sy
        )
        assert got[t]["n"] == n
        assert got[t]["rho"] == pytest.approx(rho, rel=1e-9), t


def test_sax_symbols_structure(spark):
    from binance_etl_spark.catalog import load

    rows = REGISTRY["ts_sax_symbols"].fn(spark, SF_DIR).collect()
    assert {r["symbol"] for r in rows} <= {"a", "b", "c", "d"}
    per_type = Counter()
    for r in rows:
        per_type[r["event_type"]] += r["n_chunks"]
    counts = {
        r["event_type"]: r["n"]
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for t, total in per_type.items():
        assert total == counts[t] // 8, t  # full chunks only
    # discrete quartile breakpoints: 'a' holds at least a quarter
    # (ties can only push MORE chunks under the q1 element, never less)
    for t in per_type:
        n_a = sum(
            r["n_chunks"] for r in rows
            if r["event_type"] == t and r["symbol"] == "a"
        )
        assert n_a >= (counts[t] // 8) // 4, t


def test_completeness_matrix_identities(spark):
    from binance_etl_spark.catalog import load

    rows = REGISTRY["dq_completeness_matrix"].fn(spark, SF_DIR).collect()
    n = load(spark, SF_DIR, "events").count()
    assert {r["column_name"] for r in rows} == {
        "event_id", "ts", "user_id", "event_type", "value", "props"
    }
    for r in rows:
        assert r["n_rows"] == n
        assert 0 <= r["n_null"] <= n
        assert r["null_ppm"] == r["n_null"] * 1_000_000 // n
        if r["column_name"] not in ("event_type", "props"):
            assert r["n_empty"] == 0


def test_kruskal_wallis_all_tied_degenerate_guard(spark, tmp_path):
    """All values tied -> tie factor is exactly 0 and the corrected H
    is 0/0. Both engines must agree on the explicit NULL guard (Spark
    ANSI-off would give NULL, DuckDB Inf/NaN — the guard makes the
    degenerate case contractual instead of latent)."""
    import duckdb
    from pyspark.sql import functions as F

    from binance_etl_spark.catalog import load

    d = tmp_path / "sf_tied"
    d.mkdir()
    (
        load(spark, SF_DIR, "events")
        .limit(200)
        .withColumn("value", F.lit(7.0))
        .coalesce(1)
        .write.parquet(str(d / "events.parquet"))
    )
    got = REGISTRY["stats_kruskal_wallis"].fn(spark, str(d)).collect()[0]
    assert got["n_total"] == 200
    assert got["tie_sum"] == 200**3 - 200
    assert got["h_stat"] == pytest.approx(0.0, abs=1e-9)
    assert got["h_tie_corrected"] is None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{d}/events.parquet/*.parquet'"
    )
    cur = con.execute(REGISTRY["stats_kruskal_wallis"].oracle)
    cols = [c[0] for c in cur.description]
    row = dict(zip(cols, cur.fetchone()))
    assert row["tie_sum"] == 200**3 - 200
    assert row["h_tie_corrected"] is None
