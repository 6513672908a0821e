"""Property-based tests for the ANSI DML front end's text scanners
(operators/sql_dml.py) — the helpers every parsed statement flows
through. Hypothesis generates adversarial mixes of quotes, nesting,
and commas; the properties are structural (round-trip, quote
preservation), not example-based."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from binance_etl_spark.operators.sql_dml import (
    _split_top_level_commas,
    _strip_alias_outside_quotes,
)

# fragments that stress the scanners: identifiers, quoted strings with
# commas/parens/alias-lookalikes inside, nesting, operators
_FRAG = st.one_of(
    st.sampled_from(
        [
            "a", "s.col", "t.col", "f(x, y)", "arr[1]", "1 + 2",
            "'lit,eral'", "'see s.3'", '"d,q"', "(a, b)", "s . x",
            "CASE WHEN s.b > 0 THEN 1 ELSE 0 END", "xs.col", "s.a_b",
        ]
    ),
    st.text(alphabet="abs.,'()_ <>=0123456789", min_size=0, max_size=12),
)


def _balanced_quotes(text: str) -> bool:
    """Scanner contract: quotes must pair up (the SQL grammar rejects
    unterminated literals upstream)."""
    in_q: str | None = None
    for ch in text:
        if in_q:
            if ch == in_q:
                in_q = None
        elif ch in "'\"":
            in_q = ch
    return in_q is None


@settings(max_examples=300, deadline=None)
@given(st.lists(_FRAG, min_size=1, max_size=6))
def test_split_round_trip_preserves_text(parts):
    text = ",".join(parts)
    if not _balanced_quotes(text):
        return
    got = _split_top_level_commas(text)
    # splitting only ever removes TOP-LEVEL commas: rejoining restores
    # the input exactly, and each piece has balanced parens/quotes
    assert ",".join(got) == text
    for p in got:
        assert _balanced_quotes(p)


@settings(max_examples=300, deadline=None)
@given(st.lists(_FRAG, min_size=1, max_size=5))
def test_alias_strip_never_touches_quoted_text(parts):
    cond = " ".join(parts)
    if not _balanced_quotes(cond):
        return
    out = _strip_alias_outside_quotes(cond, "s")
    # every quoted literal survives verbatim, in order
    assert re.findall(r"'[^']*'", out) == re.findall(r"'[^']*'", cond)
    # stripping is idempotent and only ever removes "s." tokens
    assert _strip_alias_outside_quotes(out, "s") == out
    assert len(out) <= len(cond)
    # removing all whitespace, the output is the input minus zero or
    # more "s." occurrences — nothing else changes
    assert out.replace("s.", "") .replace(" ", "") in (
        cond.replace("s.", "").replace(" ", ""),
    )
