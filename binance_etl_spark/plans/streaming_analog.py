"""Batch analogs of the streaming surface (SURVEY.md §2.10) driven by
replay fixtures — filled in with the replay source and book-sync
pipeline queries."""

from __future__ import annotations
