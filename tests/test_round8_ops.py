"""Invariant + brute-force tests for the round-8 operator wave —
every op already has an exact DuckDB oracle (tests/test_oracle_parity
runs them all); these pin the SEMANTICS against independent
pure-Python recomputations at sf0.001 and the mathematical invariants
the oracles alone cannot distinguish from shared bugs."""

from __future__ import annotations

import math

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def test_mann_whitney_identity_and_brute_force(spark):
    [r] = _run(spark, "stats_mann_whitney")
    # U_A + U_B = n_A * n_B (2x-scaled)
    assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"]

    # brute-force midranks in plain Python
    from binance_etl_spark.catalog import load
    import pyspark.sql.functions as F

    rows = (
        load(spark, SF, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select("event_type", F.floor(F.col("value") * 100).alias("v"))
        .collect()
    )
    vals = sorted((r2["v"], r2["event_type"]) for r2 in rows)
    # midrank per value (2x-scaled to stay integral)
    from collections import Counter

    cnt = Counter(v for v, _ in vals)
    rank2: dict[int, int] = {}
    before = 0
    for v in sorted(cnt):
        rank2[v] = 2 * before + cnt[v] + 1
        before += cnt[v]
    r2_a = sum(rank2[v] for v, t in vals if t == "click")
    n_a = sum(1 for _, t in vals if t == "click")
    assert r["u2_a"] == r2_a - n_a * (n_a + 1)


def test_welch_ttest_brute_force(spark):
    import statistics

    from binance_etl_spark.catalog import load
    import pyspark.sql.functions as F

    got = {r["event_type"]: r for r in _run(spark, "stats_welch_ttest")}
    rows = (
        load(spark, SF, "events")
        .select("event_type", F.floor(F.col("value") * 100).alias("v"))
        .collect()
    )
    by_t: dict[str, list[float]] = {}
    for r in rows:
        by_t.setdefault(r["event_type"], []).append(r["v"] / 100.0)
    base = by_t["click"]
    for t, xs in by_t.items():
        if t == "click":
            continue
        se = math.sqrt(
            statistics.variance(xs) / len(xs)
            + statistics.variance(base) / len(base)
        )
        expect = (statistics.fmean(xs) - statistics.fmean(base)) / se
        assert abs(got[t]["t_stat"] - expect) < 1e-6, t


def test_corr_matrix_vs_brute_force(spark):
    from binance_etl_spark.catalog import load
    import pyspark.sql.functions as F

    got = {(r["col_x"], r["col_y"]): r["corr"]
           for r in _run(spark, "stats_corr_matrix")}
    assert all(-1.0 <= c <= 1.0 for c in got.values())
    li = (
        load(spark, SF, "lineitem")
        .select(
            F.floor("l_quantity").alias("quantity"),
            F.floor("l_extendedprice").alias("price"),
            F.floor(F.col("l_discount") * 100).alias("discount_e2"),
            F.floor(F.col("l_tax") * 100).alias("tax_e2"),
        )
        .collect()
    )
    cols = ["quantity", "price", "discount_e2", "tax_e2"]
    data = {c: [r[c] for r in li] for c in cols}
    n = len(li)
    for (x, y), c in got.items():
        sx, sy = sum(data[x]), sum(data[y])
        sxy = sum(a * b for a, b in zip(data[x], data[y]))
        sxx = sum(a * a for a in data[x])
        syy = sum(b * b for b in data[y])
        expect = (n * sxy - sx * sy) / math.sqrt(n * sxx - sx * sx) / math.sqrt(
            n * syy - sy * sy
        )
        assert abs(c - expect) < 1e-9, (x, y)


def test_kcore_survivors_have_core_degree(spark):
    # sf0.01: the sf0.001 graph's 3-core is empty (peeling erases it),
    # which would make the equivalence below vacuous
    rows = REGISTRY["graph_kcore"].fn(spark, "/root/testdata/sf0.01").collect()
    assert rows, "3-core should be non-empty on this graph"
    survivors = {r["node"] for r in rows}
    for r in rows:
        assert r["core_degree"] >= 3
    # independently recompute the peel fixpoint restricted to 3 rounds
    from binance_etl_spark.catalog import load
    import pyspark.sql.functions as F

    e = load(spark, "/root/testdata/sf0.01", "events").select(
        F.col("user_id").alias("a"),
        ((F.col("user_id") * 13 + F.length("event_type")) % 100).alias("b"),
    )
    edges = {
        (r["a"], r["b"]) for r in e.collect() if r["a"] != r["b"]
    }
    und = edges | {(b, a) for a, b in edges}
    cur = und
    for _ in range(3):
        from collections import Counter

        deg = Counter(a for a, _ in cur)
        keep = {n for n, d in deg.items() if d >= 3}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    from collections import Counter

    deg = Counter(a for a, _ in cur)
    assert dict(deg) == {r["node"]: r["core_degree"] for r in rows}
    assert survivors == set(deg)


def test_common_neighbors_brute_force(spark):
    rows = _run(spark, "graph_common_neighbors")
    from binance_etl_spark.catalog import load
    import pyspark.sql.functions as F

    e = load(spark, SF, "events").select(
        F.col("user_id").alias("a"),
        ((F.col("user_id") * 13 + F.length("event_type")) % 100).alias("b"),
    )
    edges = {(r["a"], r["b"]) for r in e.collect() if r["a"] != r["b"]}
    und = edges | {(b, a) for a, b in edges}
    nbr: dict[int, set] = {}
    for a, b in und:
        nbr.setdefault(a, set()).add(b)
    best = {}
    for x in nbr:
        for y in nbr:
            if x < y:
                common = len(nbr[x] & nbr[y])
                if common:
                    best[(x, y)] = common
    order = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    assert [
        (r["x"], r["y"], r["common"], r["deg_x"], r["deg_y"]) for r in rows
    ] == [
        (x, y, c, len(nbr[x]), len(nbr[y])) for (x, y), c in order
    ]
    for r in rows:
        union = r["deg_x"] + r["deg_y"] - r["common"]
        assert r["jaccard_ppm"] == 1_000_000 * r["common"] // union


def test_matryoshka_recall_bounds_and_self_hit(spark):
    rows = _run(spark, "emb_matryoshka_recall")
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_hit"] <= r["k"]
        assert r["recall_pct"] == r["n_hit"] * 100 // r["k"]
        # the query vector itself is rank-1 in BOTH metrics (cos=1),
        # so recall can never be zero
        assert r["n_hit"] >= 1


def test_m4_envelope_and_counts(spark):
    rows = _run(spark, "ts_downsample_m4")
    from binance_etl_spark.catalog import load
    import pyspark.sql.functions as F

    pts = (
        load(spark, SF, "events")
        .select(
            "user_id",
            F.col("event_id").alias("eid"),
            F.expr("unix_micros(ts) div 1000000").alias("x"),
            F.floor(F.col("value") * 1_000_000).alias("y"),
            F.expr("unix_micros(ts) div 600000000").alias("bkt"),
        )
        .collect()
    )
    by_b: dict[tuple, list] = {}
    for p in pts:
        by_b.setdefault((p["user_id"], p["bkt"]), []).append(p)
    assert len(rows) == len(by_b)
    for r in rows:
        grp = by_b[(r["user_id"], r["bkt"])]
        assert r["n"] == len(grp)
        ys = [g["y"] for g in grp]
        assert r["min_y"] == min(ys) and r["max_y"] == max(ys)
        first = min(grp, key=lambda g: (g["x"], g["eid"]))
        last = max(grp, key=lambda g: (g["x"], g["eid"]))
        assert r["first_y"] == first["y"] and r["last_y"] == last["y"]
        assert r["min_y"] <= r["first_y"] <= r["max_y"]
        assert r["min_y"] <= r["last_y"] <= r["max_y"]


def test_bollinger_brute_force(spark):
    rows = {r["sym"]: r for r in _run(spark, "win_bollinger_breach")}
    from binance_etl_spark.catalog import load
    import pyspark.sql.functions as F

    t = (
        load(spark, SF, "events")
        .where(F.col("value") > 0)
        .select(
            (F.col("user_id") % 5).alias("sym"),
            F.unix_micros("ts").alias("tu"),
            F.col("event_id").alias("tid"),
            F.floor(F.col("value") * 100).alias("p"),
        )
        .collect()
    )
    by_sym: dict[int, list] = {}
    for r in sorted(t, key=lambda r: (r["sym"], r["tu"], r["tid"])):
        by_sym.setdefault(r["sym"], []).append(r["p"])
    for sym, ps in by_sym.items():
        nb = nup = ndown = nwin = 0
        for i in range(19, len(ps)):
            w = ps[i - 19 : i + 1]
            nwin += 1
            n, p = 20, ps[i]
            s, ss = sum(w), sum(v * v for v in w)
            if (n * p - s) ** 2 * (n - 1) > 4 * n * (n * ss - s * s):
                nb += 1
                if n * p > s:
                    nup += 1
                else:
                    ndown += 1
        r = rows[sym]
        assert (r["n_windows"], r["n_breach"], r["n_breach_up"],
                r["n_breach_down"]) == (nwin, nb, nup, ndown), sym


def test_neyman_quota_sums_to_budget(spark):
    rows = _run(spark, "sample_stratified_neyman")
    assert sum(r["quota"] for r in rows) == 200
    for r in rows:
        assert r["n_kept"] == min(r["quota"], r["n"])
        assert r["sigma"] > 0


def test_volume_profile_value_area_covers_70pct(spark):
    for r in _run(spark, "ms_volume_profile"):
        assert r["va_vol"] * 10 >= r["total_vol"] * 7  # greedy covers >=70%
        assert r["va_buckets"] <= r["n_buckets"]
        assert r["poc_vol"] <= r["va_vol"]  # POC is always admitted first


def test_vpin_mass_conservation(spark):
    from binance_etl_spark.plans.microstructure import _tape
    import pyspark.sql.functions as F

    rows = _run(spark, "ms_vpin")
    tape_vol = {
        r["sym"]: r["v"]
        for r in _tape(spark, SF)
        .groupBy("sym")
        .agg(F.sum("qty").alias("v"))
        .collect()
    }
    for r in rows:
        assert r["total_vol"] == tape_vol[r["sym"]]
        assert 0 <= r["vpin_ppm"] <= 1_000_000
        assert r["total_imbalance"] <= r["total_vol"]


def test_mad_outliers_bounded(spark):
    for r in _run(spark, "dq_anomaly_mad"):
        assert r["mad_e2"] >= 0
        assert 0 <= r["n_outliers"] < r["n"]


def test_freshness_global_max_has_zero_lag(spark):
    rows = _run(spark, "dq_freshness_sla")
    assert min(r["lag_s"] for r in rows) == 0
    for r in rows:
        assert r["lag_s"] >= 0


def test_winnowing_copy_guarantee(spark):
    """Winnowing's defining guarantee: a verbatim copy of >= w+k-1
    tokens shares at least one fingerprint. The top pair reported on
    this corpus must therefore be symmetric and positive — and the
    fingerprints of a doc joined with ITSELF would trivially match,
    so doc_a < doc_b must hold everywhere."""
    rows = _run(spark, "text_winnowing_fingerprint")
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["shared_fps"] >= 1


def test_kendall_tau_brute_force(spark):
    [r] = _run(spark, "stats_kendall_tau")
    from binance_etl_spark.catalog import load
    import pyspark.sql.functions as F

    pts = (
        load(spark, SF, "lineitem")
        .select(
            F.floor("l_quantity").alias("x"),
            F.floor(F.col("l_discount") * 100).alias("y"),
        )
        .collect()
    )
    xs = [(p["x"], p["y"]) for p in pts]
    n = len(xs)
    # O(n^2) literal pair walk — fine at sf0.001
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = (xs[i][0] > xs[j][0]) - (xs[i][0] < xs[j][0])
            sy = (xs[i][1] > xs[j][1]) - (xs[i][1] < xs[j][1])
            if sx * sy > 0:
                c += 1
            elif sx * sy < 0:
                d += 1
    assert (r["n"], r["concordant"], r["discordant"]) == (n, c, d)
    n0 = n * (n - 1) // 2
    assert r["n0"] == n0
    expect = (c - d) / math.sqrt(n0 - r["n1"]) / math.sqrt(n0 - r["n2"])
    assert abs(r["tau_b"] - expect) < 1e-12
    assert -1.0 <= r["tau_b"] <= 1.0


def test_acf_grid_brute_force(spark):
    import statistics

    rows = _run(spark, "ms_acf_grid")
    from binance_etl_spark.plans.microstructure import _tape
    import pyspark.sql.functions as F

    tape = sorted(
        _tape(spark, SF)
        .select("sym", "ts", "tid", F.floor(F.col("price") * 100).alias("p"))
        .collect(),
        key=lambda r: (r["sym"], r["ts"], r["tid"]),
    )
    by_sym: dict[int, list[int]] = {}
    for t in tape:
        by_sym.setdefault(t["sym"], []).append(t["p"])
    got = {(r["sym"], r["lag"]): r for r in rows}
    for sym, ps in by_sym.items():
        for k in (1, 2, 4, 8):
            a, b = ps[:-k], ps[k:]
            r = got[(sym, k)]
            assert r["n"] == len(a)
            expect = statistics.correlation(
                [float(v) for v in a], [float(v) for v in b]
            )
            assert abs(r["acf"] - expect) < 1e-9, (sym, k)


def test_common_neighbors_hub_cap_semantics(spark, sf_dir):
    """hub_cap=0 screens every shared-neighbor node: zero wedges
    survive. The default cap exceeds all bench-scale degrees, so the
    oracle-checked default result is the uncapped one."""
    from binance_etl_spark.plans.graph import graph_common_neighbors

    assert graph_common_neighbors(spark, sf_dir, hub_cap=0).count() == 0
    top = graph_common_neighbors(spark, sf_dir).limit(1).collect()
    assert top and top[0]["common"] >= 1
