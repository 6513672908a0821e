"""Invariant + brute-force tests for the round-8 SECOND operator wave
(stats3 / ms_lee_ready / emb_hamming_ann / graph_assortativity) —
every op has an exact DuckDB oracle (tests/test_oracle_parity runs
them all); these pin the SEMANTICS against independent pure-Python
recomputations at sf0.001 and the invariants a shared bug in both
engine texts could not fake."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def _events(spark):
    return (
        load(spark, SF, "events")
        .select("event_id", "event_type", "ts", "user_id", "value")
        .collect()
    )


def test_jarque_bera_brute_force(spark):
    rows = _run(spark, "stats_jarque_bera")
    by_type = defaultdict(list)
    for r in _events(spark):
        by_type[r["event_type"]].append(math.floor(r["value"]))
    for r in rows:
        xs = by_type[r["event_type"]]
        n = len(xs)
        assert r["n"] == n
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        skew = m3 / m2**1.5
        kurt = m4 / m2**2 - 3
        jb = n / 6 * (skew**2 + kurt**2 / 4)
        assert math.isclose(r["skewness"], skew, rel_tol=1e-9)
        assert math.isclose(r["kurtosis_excess"], kurt, rel_tol=1e-9)
        assert math.isclose(r["jb_stat"], jb, rel_tol=1e-9)


def test_anova_brute_force(spark):
    [r] = _run(spark, "stats_anova_oneway")
    by_type = defaultdict(list)
    for e in _events(spark):
        by_type[e["event_type"]].append(math.floor(e["value"] * 100) / 100)
    groups = list(by_type.values())
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = sum(sum(g) for g in groups) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups)
    ssw = sum(
        sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["n_total"] == n
    assert math.isclose(r["ss_between"], ssb, rel_tol=1e-6)
    assert math.isclose(r["ss_within"], ssw, rel_tol=1e-6)
    assert math.isclose(r["f_stat"], f, rel_tol=1e-6)


def _tape_py(spark):
    """Python twin of microstructure._TAPE_SQL at sf0.001."""
    out = defaultdict(list)
    for r in _events(spark):
        if r["value"] > 0:
            out[r["user_id"] % 5].append(
                (
                    r["ts"],
                    r["event_id"],
                    math.floor(r["value"] * 100),
                    1 if r["event_id"] % 2 == 0 else -1,
                )
            )
    for sym in out:
        out[sym].sort()
    return out


def test_ljung_box_brute_force(spark):
    rows = _run(spark, "stats_ljung_box")
    tape = _tape_py(spark)
    for r in rows:
        xs = [p for _, _, p, _ in tape[r["sym"]]]
        n = len(xs)
        assert r["n"] == n
        mu = sum(xs) / n
        den = sum((x - mu) ** 2 for x in xs)
        q = 0.0
        for k in (1, 2, 3, 4):
            num = sum((xs[t] - mu) * (xs[t + k] - mu) for t in range(n - k))
            rk = num / den
            assert math.isclose(r[f"r{k}"], rk, rel_tol=1e-9), (k, r)
            q += rk * rk / (n - k)
        assert math.isclose(r["q_stat"], n * (n + 2) * q, rel_tol=1e-9)


def test_lee_ready_brute_force(spark):
    rows = _run(spark, "ms_lee_ready")
    tape = _tape_py(spark)
    for r in rows:
        seq = tape[r["sym"]]
        ps = [p for _, _, p, _ in seq]
        sides = [s for _, _, _, s in seq]
        n = n_buy = n_tick = agree = es2 = rs2 = pi2 = n_h = 0
        last_dir = None
        for i in range(len(ps)):
            d = None if i == 0 else ps[i] - ps[i - 1]
            if d is not None and d != 0:
                this_dir = 1 if d > 0 else -1
            else:
                this_dir = None
            q = this_dir if this_dir is not None else last_dir
            if this_dir is not None:
                last_dir = this_dir
            if d is None or q is None:
                continue
            n += 1
            n_buy += q == 1
            n_tick += d == 0
            agree += q == sides[i]
            es2 += 2 * q * (ps[i] - ps[i - 1])
            if i + 5 < len(ps):
                n_h += 1
                rs2 += 2 * q * (ps[i] - ps[i + 5])
                pi2 += 2 * q * (ps[i + 5] - ps[i - 1])
        assert r["n"] == n
        assert r["n_buy"] == n_buy
        assert r["n_sell"] == n - n_buy
        assert r["n_tick"] == n_tick
        assert r["es2_sum"] == es2
        assert r["rs2_sum"] == rs2
        assert r["pi2_sum"] == pi2
        assert r["n_h"] == n_h
        assert r["accuracy_ppm"] == (1_000_000 * agree) // n


def test_hamming_ann_brute_force(spark):
    rows = _run(spark, "emb_hamming_ann")
    embs = {
        r["vec_id"]: list(r["embedding"])
        for r in load(spark, SF, "embeddings").collect()
    }

    def words(v):
        lo = sum(1 << b for b in range(32) if v[b] >= 0)
        hi = sum(1 << b for b in range(32) if v[32 + b] >= 0)
        return lo, hi

    def cos_e12(a, b):
        dot = sum(
            math.floor(float(x) * float(y) * 1e12) for x, y in zip(a, b)
        )
        na = sum(math.floor(float(x) * float(x) * 1e12) for x in a)
        nb = sum(math.floor(float(y) * float(y) * 1e12) for y in b)
        return dot / math.sqrt(na * nb)

    for r in rows:
        qid = r["qid"]
        qv = embs[qid]
        qlo, qhi = words(qv)
        scored = []
        for vid, v in embs.items():
            if vid == qid:
                continue
            lo, hi = words(v)
            ham = bin((lo ^ qlo)).count("1") + bin((hi ^ qhi)).count("1")
            scored.append((vid, ham, cos_e12(v, qv)))
        full_top = {
            vid
            for vid, _, _ in sorted(scored, key=lambda s: (-s[2], s[0]))[:10]
        }
        ham_sorted = sorted(scored, key=lambda s: (s[1], s[0]))[:10]
        ham_top = {vid for vid, _, _ in ham_sorted}
        hits = full_top & ham_top
        assert r["n_hit"] == len(hits)
        assert r["recall_pct"] == len(hits) * 100 // 10
        if hits:
            assert r["best_ham"] == min(
                h for vid, h, _ in ham_sorted if vid in hits
            )
        assert 0 <= r["n_hit"] <= 10


def test_assortativity_brute_force(spark):
    [r] = _run(spark, "graph_assortativity")
    edges = set()
    for e in _events(spark):
        u = e["user_id"]
        v = (u * 13 + len(e["event_type"])) % 100
        if u != v:
            edges.add((u, v))
            edges.add((v, u))
    deg = Counter(a for a, _ in edges)
    inc = [(deg[a], deg[b]) for a, b in edges]
    n = len(inc)
    sx = sum(dx for dx, _ in inc)
    sxy = sum(dx * dy for dx, dy in inc)
    sxx = sum(dx * dx for dx, _ in inc)
    assert r["n_edges"] == n // 2
    assert r["sum_deg"] == sx
    assert r["sum_ddprod"] == sxy
    assert r["sum_degsq"] == sxx
    expect = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    assert math.isclose(r["assortativity"], expect, rel_tol=1e-12)
    assert -1.0 <= r["assortativity"] <= 1.0


def test_dickey_fuller_brute_force(spark):
    rows = _run(spark, "stats_dickey_fuller")
    tape = _tape_py(spark)
    for r in rows:
        ps = [p for _, _, p, _ in tape[r["sym"]]]
        xs = ps[:-1]
        ys = [ps[i + 1] - ps[i] for i in range(len(ps) - 1)]
        n = len(xs)
        assert r["n"] == n
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy_c = sxy - sx * sy / n
        sxx_c = sxx - sx * sx / n
        syy_c = syy - sy * sy / n
        beta = sxy_c / sxx_c
        s2 = (syy_c - beta * sxy_c) / (n - 2)
        t = beta / math.sqrt(s2 / sxx_c)
        assert math.isclose(r["beta"], beta, rel_tol=1e-9)
        assert math.isclose(r["t_df"], t, rel_tol=1e-9)
        # mean-reverting synthetic tape: the unit root is rejected hard
        assert t < -2.86


def test_obv_adline_brute_force(spark):
    rows = _run(spark, "ms_obv_adline")
    tape = _tape_py(spark)
    by_sym = defaultdict(list)
    for r in rows:
        by_sym[r["sym"]].append(r)
    for sym, seq in tape.items():
        bars = {}
        for ts, tid, p, _ in seq:
            key = ts.replace(minute=0, second=0, microsecond=0)
            bars.setdefault(key, []).append((ts, tid, p))
        qty = {}
        for r2 in _events(spark):
            if r2["value"] > 0 and r2["user_id"] % 5 == sym:
                key = r2["ts"].replace(minute=0, second=0, microsecond=0)
                qty[key] = qty.get(key, 0) + r2["event_id"] % 7 + 1
        obv = adl = 0
        prev_c = None
        out = []
        for key in sorted(bars):
            ps = [p for _, _, p in sorted(bars[key])]
            c, h, l = ps[-1], max(ps), min(ps)
            vol = qty[key]
            if prev_c is not None:
                if c > prev_c:
                    obv += vol
                elif c < prev_c:
                    obv -= vol
            # both engines' integer division TRUNCATES toward zero
            num = (2 * c - l - h) * 1_000_000
            clv = (
                0
                if h == l
                else (abs(num) // (h - l)) * (1 if num >= 0 else -1)
            )
            adl += clv * vol
            prev_c = c
            out.append((key, vol, obv, adl))
        got = by_sym[sym]
        assert len(got) == min(3, len(out))
        for r3, (key, vol, o, a) in zip(got, out[-3:]):
            assert r3["vol"] == vol
            assert r3["obv"] == o
            assert r3["adl_ppm"] == a


def test_modularity_brute_force(spark):
    [r] = _run(spark, "graph_modularity")
    edges = set()
    for e in _events(spark):
        u = e["user_id"]
        v = (u * 13 + len(e["event_type"])) % 100
        if u != v:
            edges.add((min(u, v), max(u, v)))
    nb = defaultdict(set)
    for u, v in edges:
        nb[u].add(v)
        nb[v].add(u)
    labels = {n: n for n in nb}
    for _ in range(3):
        new = {}
        for n in nb:
            cnt = Counter(labels[x] for x in nb[n])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    m = len(edges)
    intra = sum(1 for u, v in edges if labels[u] == labels[v])
    dc = Counter()
    for n in nb:
        dc[labels[n]] += len(nb[n])
    b = sum(d * d for d in dc.values())
    assert r["n_edges"] == m
    assert r["intra_edges"] == intra
    assert r["sum_dc2"] == b
    assert r["n_communities"] == len(dc)
    assert math.isclose(
        r["modularity"], intra / m - b / (4 * m * m), rel_tol=1e-12
    )


def test_levene_bf_brute_force(spark):
    [r] = _run(spark, "stats_levene_bf")
    by_type = defaultdict(list)
    for e in _events(spark):
        by_type[e["event_type"]].append(math.floor(e["value"] * 100))
    zs = {}
    for t, xs in by_type.items():
        xs_sorted = sorted(xs)
        # percentile_disc(0.5): the smallest element with cumulative
        # fraction >= 0.5
        med = xs_sorted[math.ceil(len(xs_sorted) * 0.5) - 1]
        zs[t] = [abs(x - med) / 100 for x in xs]
    groups = list(zs.values())
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = sum(sum(g) for g in groups) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups)
    ssw = sum(sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups)
    w = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["n_total"] == n
    assert math.isclose(r["ss_between"], ssb, rel_tol=1e-6)
    assert math.isclose(r["ss_within"], ssw, rel_tol=1e-6)
    assert math.isclose(r["w_stat"], w, rel_tol=1e-6)


def test_intraday_seasonality_brute_force(spark):
    rows = _run(spark, "ms_intraday_seasonality")
    tape = _tape_py(spark)
    qty = {}
    for e in _events(spark):
        if e["value"] > 0:
            qty[e["event_id"]] = e["event_id"] % 7 + 1
    expect = {}
    tvol = Counter()
    for sym, seq in tape.items():
        prev = None
        for ts, tid, p, _ in seq:
            hod = ts.hour
            nt, vol, adp = expect.get((sym, hod), (0, 0, 0))
            d = 0 if prev is None else abs(p - prev)
            expect[(sym, hod)] = (nt + 1, vol + qty[tid], adp + d)
            tvol[sym] += qty[tid]
            prev = p
    assert len(rows) == len(expect)
    for r in rows:
        nt, vol, adp = expect[(r["sym"], r["hod"])]
        assert r["n_trades"] == nt
        assert r["vol"] == vol
        assert r["abs_dp_e2"] == adp
        assert r["vol_share_ppm"] == (1_000_000 * vol) // tvol[r["sym"]]
    # shares sum to ~1e6 per symbol (floor DIV loses at most 24 ppm)
    by_sym = defaultdict(int)
    for r in rows:
        by_sym[r["sym"]] += r["vol_share_ppm"]
    for s, tot in by_sym.items():
        assert 1_000_000 - 24 <= tot <= 1_000_000


def test_bpe_segment_brute_force(spark):
    from binance_etl_spark.plans.llm_ops15 import _BPE_DOCS, _BPE_MERGES

    rows = _run(spark, "text_bpe_segment")
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF, "documents")
        .where(F.col("doc_id") < _BPE_DOCS)
        .collect()
    }

    def segment(word):
        syms = list(word)
        for a, b in _BPE_MERGES:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    expect = {}
    for doc_id, text in docs.items():
        words = [w for w in text.lower().split(" ") if w]
        n_tokens = sum(len(segment(w)) for w in words)
        chars = sum(len(w) for w in words)
        expect[doc_id] = (len(words), chars, n_tokens)
    assert len(rows) == len(expect)
    for r in rows:
        n_words, chars, n_tokens = expect[r["doc_id"]]
        assert r["n_words"] == n_words
        assert r["n_chars"] == chars
        assert r["n_tokens"] == n_tokens, r["doc_id"]
        assert r["tokens_per_word_ppm"] == (1_000_000 * n_tokens) // n_words
        assert r["tokens_per_char_ppm"] == (1_000_000 * n_tokens) // chars
    # the hierarchical chain fires: 'scan' is ONE token
    assert segment("scan") == ["scan"]


def test_emb_outlier_brute_force(spark):
    rows = _run(spark, "emb_outlier_centroid")
    embs = [
        (r["vec_id"], r["label"], list(r["embedding"]))
        for r in load(spark, SF, "embeddings").collect()
    ]
    by_label = defaultdict(list)
    for vid, lab, v in embs:
        by_label[lab].append((vid, [math.floor(float(x) * 1e4) for x in v]))
    expect = {}
    for lab, members in by_label.items():
        n = len(members)
        sums = [sum(v[d] for _, v in members) for d in range(64)]
        scored = sorted(
            (
                (
                    -sum((n * v[d] - sums[d]) ** 2 for d in range(64)),
                    vid,
                )
                for vid, v in members
            )
        )
        expect[lab] = [
            (i + 1, vid, -neg) for i, (neg, vid) in enumerate(scored[:5])
        ]
    for r in rows:
        rank, vid, d2n2 = expect[r["label"]][r["rnk"] - 1]
        assert (r["rnk"], r["vec_id"], r["d2n2"]) == (rank, vid, d2n2)
    assert len(rows) == sum(len(v) for v in expect.values())


def test_rs_profile_brute_force(spark):
    rows = _run(spark, "ms_rs_profile")
    tape = _tape_py(spark)
    expect = {}
    for sym, seq in tape.items():
        ps = [p for _, _, p, _ in seq]
        for k in (16, 64, 256):
            rss = []
            for c0 in range(0, len(ps) - len(ps) % k, k):
                chunk = ps[c0 : c0 + k]
                n = len(chunk)
                s1 = sum(chunk)
                s2 = sum(x * x for x in chunk)
                if n * s2 <= s1 * s1:
                    continue
                cums, cum = [], 0
                for i, x in enumerate(chunk, 1):
                    cum += x
                    cums.append(n * cum - i * s1)
                r_int = max(cums) - min(cums)
                rss.append(r_int / math.sqrt(n * s2 - s1 * s1))
            if rss:
                rss.sort()
                # percentile_disc(0.5): smallest element with cum >= .5
                med = rss[math.ceil(len(rss) * 0.5) - 1]
                expect[(sym, k)] = (len(rss), med)
    assert len(rows) == len(expect)
    for r in rows:
        n_chunks, med = expect[(r["sym"], r["scale"])]
        assert r["n_chunks"] == n_chunks
        assert math.isclose(r["rs_median"], med, rel_tol=1e-12)
    # R/S grows with scale (long-memory profile is monotone here)
    by_sym = defaultdict(dict)
    for r in rows:
        by_sym[r["sym"]][r["scale"]] = r["rs_median"]
    for sym, d in by_sym.items():
        if len(d) == 3:
            assert d[16] < d[64] < d[256], sym


def test_time_weighted_imbalance_brute_force(spark):
    rows = _run(spark, "ms_time_weighted_imbalance")
    by_sym = defaultdict(list)
    for e in _events(spark):
        if e["value"] > 0:
            by_sym[e["user_id"] % 5].append(
                (e["ts"], e["event_id"])
            )
    for r in rows:
        seq = sorted(by_sym[r["sym"]])
        total = n = tw = bid_heavy = 0
        for (ts, eid), (nts, _neid) in zip(seq, seq[1:]):
            d = nts - ts
            dur = (
                d.days * 86_400_000_000
                + d.seconds * 1_000_000
                + d.microseconds
            )
            if dur <= 0:
                continue
            bq, aq = eid % 7 + 1, eid % 11 + 1
            num = (bq - aq) * 1_000_000
            imb = (abs(num) // (bq + aq)) * (1 if num >= 0 else -1)
            n += 1
            total += dur
            tw += dur * imb
            bid_heavy += dur if imb > 0 else 0
        assert r["n_intervals"] == n
        assert r["total_dur_us"] == total
        sign = 1 if tw >= 0 else -1
        assert r["tw_imbalance_ppm"] == sign * (abs(tw) // total)
        assert r["bid_heavy_time_ppm"] == (bid_heavy * 1_000_000) // total
        assert -1_000_000 <= r["tw_imbalance_ppm"] <= 1_000_000


def test_cross_source_matrix_invariants(spark):
    rows = _run(spark, "dedup_cross_source_matrix")
    # every near-dup pair from the base LSH op lands in exactly one
    # matrix cell; cross flag consistent with the source pair
    total = sum(r["n_pairs"] for r in rows)
    assert total > 0
    for r in rows:
        assert (r["src_a"] != r["src_b"]) == bool(r["is_cross"])
        assert r["src_a"] <= r["src_b"]
