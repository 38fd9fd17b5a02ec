"""Composed operators the built-in DataFrame surface lacks as single
calls: cdx-server collapse, as-of join, sessionization, dedup
families, similarity search (SURVEY.md §2.3/2.5/2.11)."""
