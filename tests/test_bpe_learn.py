"""Exact-equivalence pin for the distributed BPE trainer
(plans/llm_ops14.py) against a pure-Python textbook implementation
(Sennrich et al. 2016): same corpus, same number of merges, the merge
tables must agree rank-for-rank (pair AND weight) and the segmented
vocabulary count-for-count. This is the correctness contract standing
in for a DuckDB oracle (the merge loop is iterative/data-dependent)."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from binance_etl_spark.plans.llm_ops14 import _EOW, bpe_learn, text_bpe_learn

SF = "/root/testdata/sf0.001"
N = 16


def _py_bpe(texts: list[str], n_merges: int):
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    seqs = {w: tuple(w) + (_EOW,) for w in wf}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, f in wf.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        # deterministic: count desc, then pair asc
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, n))
        for w, s in seqs.items():
            out = [s[0]]
            for x in s[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            seqs[w] = tuple(out)
    vocab: Counter = Counter()
    for w, f in wf.items():
        for sym in seqs[w]:
            vocab[sym] += f
    return merges, vocab


@pytest.fixture(scope="module")
def py_ref():
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    return _py_bpe(texts, N)


def test_merge_table_matches_textbook(spark, py_ref):
    py_merges, _ = py_ref
    merges, _ = bpe_learn(spark, SF, N)
    assert merges == py_merges


def test_segmented_vocab_matches_textbook(spark, py_ref):
    py_merges, py_vocab = py_ref
    rows = text_bpe_learn(spark, SF).collect()
    assert len(rows) == len({r["symbol"] for r in rows})  # 1:1 vocab join
    got = {r["symbol"]: (r["n_tokens"], r["created_rank"]) for r in rows}
    created: dict = {}
    for rank, a, b, _ in py_merges:  # first-creation rank on collisions
        created.setdefault(a + b, rank)
    want = {
        sym: (n, created.get(sym)) for sym, n in py_vocab.items() if n > 0
    }
    assert got == want


def test_merges_are_nontrivial(py_ref):
    py_merges, _ = py_ref
    # the synthetic corpus must actually exercise the loop
    assert len(py_merges) == N
    # and at least one late merge must chain off an earlier merged symbol
    made = {a + b for _, a, b, _ in py_merges}
    assert any(a in made or b in made for _, a, b, _ in py_merges)
