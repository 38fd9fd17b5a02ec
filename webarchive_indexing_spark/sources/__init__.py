"""Sources: WARC record scan, CDX line scan/sink, manifest scan
(SURVEY.md §2.1)."""
