"""Structured Streaming surface: frame parsing, stateful book sync,
pipeline wiring (SURVEY.md §2.10, §3.2-3.4)."""
