"""CDX-server query surface over a driver-table-derived CDX view
(SURVEY.md §2.2/§3.3) — filled in M2."""

from __future__ import annotations
