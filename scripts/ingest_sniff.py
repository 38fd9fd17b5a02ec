#!/usr/bin/env python
"""Ingest-pipeline scaling sniff: the BUILD side of the engine (the
reference's whole job — manifest → WARC parse → sorted index) measured
at replicated WARC volume, for both sinks:

* ``build_index``          → ZipNum cluster (one range shuffle)
* ``build_parquet_index``  → cc-index-table parquet (one range shuffle)

Every query sniff so far measured the READ side; this pins the ETL:
records/s must stay ~flat as volume grows 1× → K× on the same core
budget (a falling rate means a driver bottleneck, a single-task stage,
or shuffle pathology — the things that kill a 100 TB ingest).  Usage:

    python scripts/ingest_sniff.py [K ...] [--warcs N] [--records M]

defaults: K = 1 10 30, base volume = 20 WARCs × 200 records.  The
fixture set for each K is written once under /tmp/ingest_sniff (K×
the WARC files, distinct URLs per replica so the sort is honest), then
each pipeline is timed end-to-end (parse + shuffle + sink write) and
one JSON line per (pipeline, K) is printed:

    {"pipeline": "zipnum", "k": 10, "records": ..., "sec": ...,
     "records_per_sec": ..., "rate_vs_base": ...}

``rate_vs_base`` is THE number: records/s at K× divided by records/s
at 1× — ~1.0 is linear scaling, well under 1.0 is a scale problem.
(Expect slightly >1.0 at small base volumes: fixed job setup costs
amortize.)  Also asserts the plan contract: the pre-sink lineage
holds exactly ONE exchange — the range shuffle that subsumes the
reference's SampleCDXJob; the WARC parse itself must be map-only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_fixtures(root: str, k: int, n_warcs: int, n_records: int) -> str:
    """K× the base WARC volume under root/x{k}; returns manifest path.
    Replica r's URLs carry an r- prefix so keys are globally unique —
    the range sort sees K× distinct keys, not K copies of one."""
    d = os.path.join(root, f"x{k}")
    manifest = os.path.join(d, "manifest.txt")
    if os.path.exists(manifest):
        return manifest
    os.makedirs(d, exist_ok=True)
    # one subdirectory per replica, SAME basenames: the parquet sink
    # derives its crawl partition from the basename, and a real crawl
    # batch spans many files — per-file crawl values would blow up the
    # hive directory count with volume, a fixture artifact no
    # deployment has
    jobs = []
    for r in range(k):
        os.makedirs(os.path.join(d, f"r{r:03d}"), exist_ok=True)
        jobs.extend(
            (
                os.path.join(d, f"r{r:03d}", f"crawl-{i:03d}.warc.gz"),
                r,
                i,
                n_records,
            )
            for i in range(n_warcs)
        )
    # fixture writing (per-record gzip) is the slow part, not the
    # engine — fan it out over the host's cores
    from multiprocessing import Pool

    with Pool(min(32, os.cpu_count() or 4)) as pool:
        paths = pool.map(_write_one, jobs)
    with open(manifest, "w") as fh:
        fh.write("\n".join(paths) + "\n")
    return manifest


def _write_one(job) -> str:
    from webarchive_indexing_spark.sources.warc import write_mini_warc

    p, r, i, n_records = job
    write_mini_warc(
        p,
        [
            dict(
                url=f"https://site{j % 97}.example/r{r}/w{i}/p/{j}",
                date_iso=f"201{5 + j % 3}-0{1 + j % 9}-"
                         f"{1 + j % 28:02d}T0{j % 10}:00:00Z",
                payload=f"body r{r} w{i} {j} ".encode() * 8,
            )
            for j in range(n_records)
        ],
    )
    return p


def assert_one_shuffle(spark, manifest: str) -> None:
    """The ingest lineage contract: WARC parse is map-only, and the
    sink's range repartition is the ONE exchange in the plan."""
    from pyspark.sql import functions as F

    from webarchive_indexing_spark.sources.warc import index_warcs

    m = spark.read.text(manifest).select(F.col("value").alias("path"))
    cdx = index_warcs(spark, m)
    parse_plan = cdx._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in parse_plan.split("Scan")[0], (
        "WARC parse must be map-only:\n" + parse_plan[:800]
    )
    shuffled = cdx.repartitionByRange(8, "urlkey", "timestamp")
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 1, (
        f"expected exactly one exchange (the range shuffle), got "
        f"{n_exchanges}:\n" + plan[:800]
    )


def huge_file_sniff(spark, root: str, n_warcs: int, n_records: int) -> None:
    """The intra-file-split story (round 11): the SAME record volume
    laid out as many small WARCs vs ONE huge WARC, parsed three ways —
    many-small (the natural per-file parallelism), huge unsplit (the
    pathological one-task straggler), huge with ``split_bytes`` ranged
    tasks.  Done-criterion: split wall-clock ≈ many-small wall-clock
    (both fan across cores), both well under the unsplit straggler;
    row sets identical."""
    import shutil

    from pyspark.sql import functions as F

    from webarchive_indexing_spark.sources.warc import index_warcs

    d = os.path.join(root, "huge")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    from multiprocessing import Pool

    jobs = [
        (os.path.join(d, f"small-{i:03d}.warc.gz"), 0, i, n_records)
        for i in range(n_warcs)
    ]
    with Pool(min(32, os.cpu_count() or 4)) as pool:
        small_paths = pool.map(_write_one, jobs)
    huge = os.path.join(d, "huge.warc.gz")
    with open(huge, "wb") as out:
        for p in small_paths:  # same members, one file
            with open(p, "rb") as fh:
                out.write(fh.read())
    size = os.path.getsize(huge)
    records = n_warcs * n_records

    m_small = spark.createDataFrame([(p,) for p in small_paths], ["path"])
    m_huge = spark.createDataFrame([(huge,)], ["path"])
    runs = (
        ("many-small", m_small, None),
        ("huge-unsplit", m_huge, None),
        ("huge-split", m_huge, max(1, size // 32)),
    )
    counts = {}
    for name, m, split in runs:
        t0 = time.time()
        counts[name] = index_warcs(spark, m, split_bytes=split).count()
        sec = time.time() - t0
        print(json.dumps({
            "pipeline": f"parse:{name}", "records": records,
            "sec": round(sec, 2),
            "records_per_sec": round(records / sec),
        }))
    assert len(set(counts.values())) == 1, counts
    # offsets/filenames differ by layout; the records must not
    b = index_warcs(spark, m_huge, split_bytes=max(1, size // 32))
    cols = [c for c in b.columns if c not in ("offset", "filename")]
    got = sorted(map(tuple, b.select(cols).collect()))
    want = sorted(
        map(tuple, index_warcs(spark, m_small).select(cols).collect())
    )
    assert got == want
    print(json.dumps({"huge_split_equivalence": "rows match many-small"}))


def main(argv: list[str]) -> int:
    ks = [int(a) for a in argv if a.isdigit()] or [1, 10, 30]
    n_warcs = 20
    n_records = 200
    for a in argv:
        if a.startswith("--warcs="):
            n_warcs = int(a.split("=", 1)[1])
        if a.startswith("--records="):
            n_records = int(a.split("=", 1)[1])
    root = "/tmp/ingest_sniff"

    if "--huge" in argv:
        from webarchive_indexing_spark.session import get_session

        spark = get_session("ingest-sniff-huge")
        spark.sparkContext.setLogLevel("ERROR")
        huge_file_sniff(spark, root, n_warcs, n_records)
        return 0

    # generate every fixture BEFORE the JVM starts: multiprocessing
    # fork + a live py4j gateway is a deadlock
    manifests = {
        k: make_fixtures(root, k, n_warcs, n_records) for k in sorted({1, *ks})
    }

    from webarchive_indexing_spark.plans.pipeline import (
        build_index,
        build_parquet_index,
    )
    from webarchive_indexing_spark.session import get_session

    spark = get_session("ingest-sniff")
    spark.sparkContext.setLogLevel("ERROR")

    assert_one_shuffle(spark, manifests[1])
    print(json.dumps({"plan": "one-exchange contract holds"}))

    base_rate: dict[str, float] = {}
    for k in ks:
        manifest = manifests[k]
        records = k * n_warcs * n_records
        for name, fn in (
            (
                "zipnum",
                lambda m, o: build_index(
                    spark, m, o, shards=32, numlines=3000
                ),
            ),
            (
                "parquet",
                lambda m, o: build_parquet_index(
                    spark, m, o, range_partitions=32
                ),
            ),
        ):
            out = os.path.join(root, f"out_{name}_x{k}")
            import shutil

            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            fn(manifest, out)
            sec = time.time() - t0
            rate = records / sec
            base_rate.setdefault(name, rate)
            print(json.dumps({
                "pipeline": name,
                "k": k,
                "records": records,
                "sec": round(sec, 2),
                "records_per_sec": round(rate),
                "rate_vs_base": round(rate / base_rate[name], 3),
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
