"""Structured Streaming pipelines (SURVEY.md §2.9 ST1-ST5)."""
