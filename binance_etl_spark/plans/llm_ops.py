"""North-star LLM-data-pipeline operators (SURVEY.md §2.12) — filled in
incrementally: dedup (exact/minhash/simhash/jaccard/embedding),
similarity search (brute-force + LSH + IVF), text analysis, multimodal
column plumbing."""

from __future__ import annotations
