"""Sinks: ZipNum sharded cluster writer/reader (SURVEY.md §2.1 S6)."""
