"""Evidence dict with on-demand values.

Index builders (plans/dedup_index.py, plans/spans_index.py) return
evidence counters (n_delta_docs, n_candidates, ...). Each counter is a
separate Spark action; the bench/serve path discards them, while tests
assert on them. A LazyDict defers each counter's action to first
access, so the serve path pays zero evidence jobs and tests keep their
exact numbers (every deferred input is an eagerly-checkpointed
DataFrame, so a later count returns the same value the eager count
would have).
"""

from __future__ import annotations

from collections.abc import Callable


class LazyDict(dict):
    """dict whose missing keys are computed (once) from thunks."""

    def __init__(self, lazy: dict[str, Callable] | None = None, **eager):
        super().__init__(**eager)
        self._lazy = dict(lazy or {})

    def __missing__(self, key):
        value = self._lazy.pop(key)()  # KeyError for unknown keys
        self[key] = value
        return value

    def __contains__(self, key) -> bool:
        return dict.__contains__(self, key) or key in self._lazy

    def get(self, key, default=None):
        if key in self:
            return self[key]
        return default

    def keys(self):  # pragma: no cover - debugging convenience
        return dict.fromkeys([*dict.keys(self), *self._lazy]).keys()
