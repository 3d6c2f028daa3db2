"""Structured Streaming surface (SURVEY.md §2 R1 — absent from the
batch-only reference; defined with standard Spark semantics and tested
batch-equivalently per SURVEY.md §7)."""
