"""SparkSession construction and per-session runtime tuning.

Two entry paths:

* ``get_session()`` — build a session for tests / bench (local mode).
* ``tune(spark)``   — apply the runtime-settable knobs to an
  externally provided session (the driver hands us its own session in
  ``__spark_entry__``; we cannot rebuild it, but AQE flags and the
  session timezone are runtime-mutable).

Scale rationale (100 TB target, SURVEY.md §4):
* AQE on: runtime partition coalescing + skew-join splitting replace
  the reference's static split-points file (samplecdxjob.py [U]).
* UTC session timezone: deterministic date arithmetic regardless of
  cluster locale, and required for DuckDB-oracle parity.
* Arrow enabled: every JVM↔Python crossing is batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: conf entries that are safe (and meaningful) to set at runtime.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # driver tables store events.ts as parquet TIMESTAMP(NANOS) which
    # Spark 4 rejects; read as long ns and rebuild µs timestamps in
    # tables.load_table (matches DuckDB's truncate-to-µs semantics).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet scans: keep scan partitions big enough to amortize task
    # startup but small enough to fit executor memory at 100 TB.
    "spark.sql.files.maxPartitionBytes": "256m",
    # Write timestamps as INT64 micros, not legacy INT96: INT96
    # columns carry NO parquet min/max statistics, so every
    # fetch_time range predicate on the columnar index read EVERY
    # file (round-13 finding — the z-order time dimension was
    # unprunable, and so was the plain layout's).  Micros is also the
    # cross-engine interchange type (DuckDB, Arrow, Iceberg).
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}

#: conf entries that must be set before the JVM starts.
BUILD_CONF: dict[str, str] = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an existing session (idempotent)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by the host
            pass
    # Shuffle width: ONLY overridden for local mode, where the stock
    # default of 200 is pure scheduling overhead on a core-count box.
    # On a real cluster the host's setting stands — forcing 32 there
    # would funnel every 100 TB shuffle into 32 reduce partitions
    # (AQE coalescing only merges downward, it cannot re-widen).
    try:
        if spark.sparkContext.master.startswith("local"):
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS", "32"),
            )
    except Exception:  # pragma: no cover
        pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python workers regardless of the
    host process's cwd/PYTHONPATH.

    Closures sent to workers (WARC parse, multimodal decode, pandas
    UDFs) reference module-level functions, which cloudpickle
    serializes BY REFERENCE — the worker must import the package.  A
    host that builds its own SparkSession from a different cwd (the
    external driver) would otherwise hit ModuleNotFoundError on every
    such query.  ``addPyFile`` distributes a zip of the package and
    prepends it to worker ``sys.path`` — the same mechanism used to
    ship job code to a real cluster."""
    sc = spark.sparkContext
    if getattr(sc, "_webarchive_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"webarchive_indexing_spark_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    try:
        sc.addPyFile(zpath)
        sc._webarchive_pkg_shipped = True
    except Exception:  # pragma: no cover - host forbids addPyFile
        pass


def get_session(app_name: str = "webarchive-indexing-spark") -> SparkSession:
    """Build (or fetch) a local session with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    )
    for k, v in {**BUILD_CONF, **RUNTIME_CONF}.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
