"""Scalar function families (SURVEY.md §2.8): SURT canonicalization,
14-digit CDX timestamps, text analysis, vector math."""
