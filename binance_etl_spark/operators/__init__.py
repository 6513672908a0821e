"""Reusable engine operators (as-of join, book rebuild, dedup, similarity,
text analysis, multimodal plumbing) — composed from DataFrame primitives
so Catalyst plans them; Pandas UDFs only where built-ins can't express
the semantics."""
