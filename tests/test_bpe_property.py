"""Property tests for the trickiest round-3 expression logic, checked
against pure-Python references on adversarial small inputs:

- BPE greedy merge: the run-parity window trick must equal a true
  sequential left-to-right greedy scan — especially for same-symbol
  runs ("a a a a a"), where overlap resolution is non-trivial.
- Substring scrub coverage: a token is removed iff some cross-doc
  duplicated k-gram covers it.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from binance_etl_spark.plans.llm_ops10 import _K, _bpe_round, _gram_stream

# tiny alphabet -> dense same-symbol runs, the adversarial case
_tok = st.sampled_from(["a", "b"])
_doc = st.lists(_tok, min_size=2, max_size=12)


def _ref_top_pair(docs: list[list[str]]) -> str | None:
    counts = Counter()
    for toks in docs:
        for i in range(len(toks) - 1):
            counts[f"{toks[i]} {toks[i + 1]}"] += 1
    if not counts:
        return None
    # count desc, pair asc — the registered tie-break
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def _ref_greedy_merge(toks: list[str], pair: str) -> tuple[list[str], int]:
    """True sequential left-to-right greedy merge of `pair`."""
    a, b = pair.split(" ")
    out, i, n = [], 0, 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(f"{a}+{b}")
            n += 1
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out, n


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_doc, min_size=1, max_size=4))
def test_bpe_round_equals_sequential_greedy(spark, docs):
    df = spark.createDataFrame(
        [(d, p + 1, s) for d, toks in enumerate(docs) for p, s in enumerate(toks)],
        "doc_id INT, pos INT, sym STRING",
    )
    new, stats = _bpe_round(df, 1)
    [row] = stats.collect()
    pair = _ref_top_pair(docs)
    assert row["merged_pair"] == pair
    want_docs = {}
    want_merges = 0
    for d, toks in enumerate(docs):
        merged, n = _ref_greedy_merge(toks, pair)
        want_docs[d] = merged
        want_merges += n
    assert row["n_merges"] == want_merges
    assert row["n_symbols_after"] == sum(len(v) for v in want_docs.values())
    got = {}
    for r in new.collect():
        got.setdefault(r["doc_id"], {})[r["pos"]] = r["sym"]
    got_docs = {d: [m[p] for p in sorted(m)] for d, m in got.items()}
    assert got_docs == want_docs


def _ref_scrub(docs: dict[int, list[str]]) -> dict[int, tuple[int, int]]:
    """(n_tokens, n_removed) per doc under cross-doc k-gram coverage."""
    gram_docs: dict[str, set[int]] = {}
    starts: dict[int, list[int]] = {d: [] for d in docs}
    for d, toks in docs.items():
        for i in range(len(toks) - _K + 1):
            g = " ".join(toks[i : i + _K])
            gram_docs.setdefault(g, set()).add(d)
            starts[d].append(i)
    out = {}
    for d, toks in docs.items():
        covered = set()
        for i in starts[d]:
            g = " ".join(toks[i : i + _K])
            if len(gram_docs[g]) >= 2:
                covered.update(range(i, i + _K))
        out[d] = (len(toks), len(covered))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(st.lists(_tok, min_size=_K, max_size=10), min_size=2, max_size=4))
def test_gram_coverage_equals_reference(spark, docs_raw):
    docs = {d: toks for d, toks in enumerate(docs_raw)}
    df = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs.items()], "doc_id INT, text STRING"
    )
    from pyspark.sql import functions as F

    g = _gram_stream(df)
    pg = g.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
    cov = (
        g.join(pg.where(F.col("nd") >= 2), "gram")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (_K - 1))).alias("cpos"),
        )
        .distinct()
        .groupBy("doc_id")
        .count()
    )
    got_removed = {r["doc_id"]: r["count"] for r in cov.collect()}
    want = _ref_scrub(docs)
    for d, (_n, n_removed) in want.items():
        assert got_removed.get(d, 0) == n_removed, (d, docs[d])
