"""Window-function queries (SURVEY.md §2.5) — filled in M1/M2."""

from __future__ import annotations
