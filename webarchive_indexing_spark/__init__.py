"""webarchive_indexing_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of ``ikreymer/webarchive-indexing`` (WARC → CDX → ZipNum
sharded index; see SURVEY.md), extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis).  Everything is expressed through the DataFrame/SQL API so
Catalyst + Tungsten pick the physical strategy; Python touches the hot
path only through Arrow-batched pandas UDFs, and only where built-in
expressions genuinely cannot express the semantics.

Layout:
    session     — SparkSession construction / runtime tuning knobs
    tables      — loaders for the driver-provided parquet tables
    registry    — named-query registry backing ``__spark_entry__``
    functions/  — scalar function families (SURT, ts14, text, vectors)
    operators/  — composed operators (cdx-server query semantics,
                  collapse, as-of join, dedup, similarity, sessionize)
    sources/    — WARC / CDX / manifest readers
    sinks/      — ZipNum sharded-index writer + block-pruning reader
    streaming/  — Structured Streaming incremental pipelines
    queries/    — registered query + DuckDB-oracle pairs (driver gate)
"""

__version__ = "0.1.0"
