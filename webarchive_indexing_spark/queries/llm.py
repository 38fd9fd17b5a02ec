"""LLM-data-pipeline extensions (SURVEY.md §2.11) — filled in M5."""

from __future__ import annotations
