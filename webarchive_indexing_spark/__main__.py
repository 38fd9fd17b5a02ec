"""CLI front door mirroring the reference's job invocations
[U README: "python indexwarcsjob.py ...", "python samplecdxjob.py
...", "python zipnumclusterjob.py ..." via mrjob], so a reference
user can run the same workflow without writing driver code:

    python -m webarchive_indexing_spark index-warcs  MANIFEST CDX_DIR
    python -m webarchive_indexing_spark zipnum-cluster CDX_DIR OUT_DIR
    python -m webarchive_indexing_spark build-index  MANIFEST OUT_DIR
    python -m webarchive_indexing_spark update-index MANIFEST OUT_DIR
    python -m webarchive_indexing_spark build-parquet-index MANIFEST OUT
    python -m webarchive_indexing_spark query OUT_DIR URL [options]

``build-index`` is jobs 1+2+3 in one call (the split-point sampling
job is subsumed by Spark's range partitioner); ``index-warcs`` +
``zipnum-cluster`` are the two-stage form with the per-WARC CDX
artifact materialized, exactly the reference's operating mode.
``query`` serves the cdx-server GET /index parameter set over the
built cluster and prints classic CDX lines (or ``--output json``).

Spark config comes from the ambient environment (spark-submit /
SPARK_* env); local runs default to ``local[*]``.
"""

from __future__ import annotations

import argparse
import sys


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="webarchive_indexing_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    iw = sub.add_parser("index-warcs", help="job 1: manifest -> per-WARC gzipped CDX")
    iw.add_argument("manifest")
    iw.add_argument("cdx_dir")
    iw.add_argument("--files-per-task", type=int, default=2)

    zc = sub.add_parser("zipnum-cluster", help="jobs 2+3: CDX dir -> ZipNum cluster")
    zc.add_argument("cdx_dir")
    zc.add_argument("out_dir")
    zc.add_argument("--shards", type=int, default=8)
    zc.add_argument("--numlines", type=int, default=3000)

    bi = sub.add_parser("build-index", help="jobs 1+2+3 in one call")
    bi.add_argument("manifest")
    bi.add_argument("out_dir")
    bi.add_argument("--shards", type=int, default=8)
    bi.add_argument("--numlines", type=int, default=3000)
    bi.add_argument("--files-per-task", type=int, default=2)
    bi.add_argument("--record-types", default=None, metavar="T1,T2",
                    help="record types to index (default response,revisit; "
                         "add request/metadata/resource/conversion — pywb "
                         "include-all semantics)")
    bi.add_argument("--post-append", action="store_true",
                    help="fold __wb_method + request-body params into "
                         "request-record urlkeys (pywb cdx-indexer -p; "
                         "needs request in --record-types)")

    mm = sub.add_parser(
        "media-meta",
        help="manifest -> media header metadata parquet (round 12: "
             "keep_payload ingest + one-Arrow-pass image/audio/video "
             "header curation, no re-fetch)")
    mm.add_argument("manifest")
    mm.add_argument("out_dir")
    mm.add_argument("--mime-prefixes", default="image/,audio/,video/",
                    metavar="P1,P2",
                    help="payload-retention allowlist (mime prefixes)")
    mm.add_argument("--files-per-task", type=int, default=2)
    mm.add_argument("--split-bytes", type=int, default=None,
                    help="intra-file split threshold for oversized "
                         "gzipped WARCs (bytes)")

    zo = sub.add_parser(
        "zorder",
        help="rewrite a parquet table clustered on the Morton "
             "interleave of the given columns (round 12: the "
             "OPTIMIZE ZORDER layout move — multi-predicate box "
             "scans prune via footer stats afterwards)")
    zo.add_argument("in_path")
    zo.add_argument("out_dir")
    zo.add_argument("--cols", required=True, metavar="C1,C2",
                    help="dimensions to co-cluster (numeric; string "
                         "columns supported with --bucketing quantile)")
    zo.add_argument("--bits", type=int, default=16)
    zo.add_argument("--n-files", type=int, default=16)
    zo.add_argument("--bucketing", choices=("linear", "quantile"),
                    default="linear",
                    help="quantile = equi-depth boundaries (right "
                         "for skewed dimensions; required for string "
                         "dimensions)")

    we = sub.add_parser(
        "wet-extract",
        help="manifest of response WARCs -> WET files (round 13: "
             "keep_payload ingest + Arrow-pass HTML main-content "
             "extraction + sharded conversion-record writer — the "
             "upstream step that produces Common Crawl WET)")
    we.add_argument("manifest")
    we.add_argument("out_dir")
    we.add_argument("--n-files", type=int, default=4,
                    help="WET shards (range-partitioned by urlkey)")
    we.add_argument("--min-words", type=int, default=10)
    we.add_argument("--max-link-density", type=float, default=0.33)
    we.add_argument("--files-per-task", type=int, default=2)
    we.add_argument("--split-bytes", type=int, default=None)

    ra = sub.add_parser(
        "rearchive",
        help="curated rows (parquet with url/date_iso/payload/mime "
             "columns) -> sharded response-record .warc.gz (round 14: "
             "the re-archiving step that hands a cleaned corpus "
             "downstream in the archival wire format, with "
             "WARC-Payload-Digest per record)")
    ra.add_argument("in_path", help="parquet of curated captures")
    ra.add_argument("out_dir")
    ra.add_argument("--n-files", type=int, default=4,
                    help="WARC shards (range-partitioned by url)")
    ra.add_argument("--url-col", default="url")
    ra.add_argument("--date-col", default="date_iso")
    ra.add_argument("--payload-col", default="payload")
    ra.add_argument("--mime-col", default="mime")
    ra.add_argument("--status-col", default=None,
                    help="optional int column; default literal 200")

    bp = sub.add_parser("build-parquet-index",
                        help="manifest -> columnar (cc-index-table-layout) "
                             "parquet index")
    bp.add_argument("manifest")
    bp.add_argument("out_dir")
    bp.add_argument("--range-partitions", type=int, default=8)
    bp.add_argument("--files-per-task", type=int, default=2)

    ui = sub.add_parser("update-index", help="incremental crawl ingest (epoch LSM)")
    ui.add_argument("manifest")
    ui.add_argument("out_dir")
    ui.add_argument("--shards", type=int, default=2)
    ui.add_argument("--numlines", type=int, default=3000)
    ui.add_argument("--compact", action="store_true")
    ui.add_argument("--maintain-stats", action="store_true",
                    help="update the per-epoch host-stats partials (IVM: "
                         "scans only epochs lacking one)")

    up = sub.add_parser("update-parquet-index",
                        help="incremental crawl ingest into the columnar "
                             "(cc-index-table-layout) epoch store")
    up.add_argument("manifest")
    up.add_argument("out_dir")
    up.add_argument("--range-partitions", type=int, default=8)
    up.add_argument("--compact", action="store_true")
    up.add_argument("--maintain-stats", action="store_true",
                    help="update the per-epoch host-stats partials (IVM)")

    cp = sub.add_parser("compact", help="fold all live epochs of an "
                                        "incremental store into one "
                                        "(ZipNum or parquet — detected "
                                        "from the store's payload)")
    cp.add_argument("out_dir")
    cp.add_argument("--shards", type=int, default=4)
    cp.add_argument("--numlines", type=int, default=3000)
    cp.add_argument("--range-partitions", type=int, default=8,
                    help="output files per merge (parquet stores)")
    cp.add_argument("--retain-inputs", action="store_true",
                    help="keep subsumed input epochs on disk so pre-merge "
                         "--as-of-epoch snapshots stay readable "
                         "(reclaim later with expire-snapshots)")

    ex = sub.add_parser("expire-snapshots",
                        help="delete epochs a completed compaction subsumed "
                             "(expires the pre-merge snapshots)")
    ex.add_argument("out_dir")
    ex.add_argument("--vacuum-tmp", action="store_true",
                    help="also delete ingest-tmp/compact-tmp directories "
                         "whose epoch slot completed (crashed-run garbage)")
    ex.add_argument("--keep-last", type=int, default=0, metavar="N",
                    help="retain the N newest subsumed epochs (their "
                         "pre-merge snapshots stay time-travelable) — "
                         "Iceberg's retain-last rolling retention")

    ga = sub.add_parser(
        "stream-graph-append",
        help="drain new vector parquet files into a versioned graph "
             "ANN store (availableNow micro-batches: hard-link clone, "
             "append under the stored build recipe, replay ledger, "
             "atomic CURRENT publish)")
    ga.add_argument("input_dir")
    ga.add_argument("root")
    ga.add_argument("checkpoint_dir")
    ga.add_argument("--schema", default="vec_id bigint, embedding array<float>",
                    help="DDL schema of the incoming vector files")
    ga.add_argument("--max-files-per-trigger", type=int, default=None)

    ev = sub.add_parser(
        "expire-ann-versions",
        help="housekeeping for a versioned ANN store: drop retired "
             "version directories (BUILDING-sentinel'd in-flight "
             "builds and CURRENT are never touched; aborts if "
             "CURRENT exists but is unreadable)")
    ev.add_argument("root")
    ev.add_argument("--min-age-s", type=float, default=3600,
                    help="grace period for readers pinned on a "
                         "retired version (default 1h)")
    ev.add_argument("--stale-building-s", type=float, default=None,
                    help="opt-in: also reclaim ABANDONED builds whose "
                         "BUILDING sentinel is older than this many "
                         "seconds (choose it longer than your longest "
                         "legitimate build; default never)")

    q = sub.add_parser("query", help="cdx-server GET /index over a cluster")
    q.add_argument("cluster_dir")
    q.add_argument("url")
    q.add_argument("--match-type", default=None,
                   choices=["exact", "prefix", "host", "domain", "glob"],
                   help="default: inferred — 'example.com/*' means prefix, "
                        "'*.example.com' means domain, bare URL means exact")
    q.add_argument("--from", dest="from_", default=None, metavar="TS")
    q.add_argument("--to", default=None, metavar="TS")
    q.add_argument("--filter", action="append", default=[], dest="filters")
    q.add_argument("--collapse", action="append", default=None,
                   help="repeatable: field or field:N")
    q.add_argument("--collapse-to-last", action="store_true",
                   help="pywb collapseToLast: keep each run's LATEST capture")
    q.add_argument("--show-group-count", action="store_true",
                   help="IA showGroupCount: annotate collapsed rows with "
                        "their run size")
    q.add_argument("--show-skip-count", action="store_true",
                   help="IA showSkipCount: skipped-since-previous-kept count "
                        "+ lastskiptimestamp")
    q.add_argument("--resume-key", nargs="+", default=None,
                   metavar="URLKEY TS [TIEVAL]",
                   help="pywb resumeKey continuation: resume strictly after "
                        "this row; 3 values need --tiebreak")
    q.add_argument("--show-resume-key", action="store_true",
                   help="pywb showResumeKey: when --limit truncates, append "
                        "a blank line then the next resume key (with the "
                        "--tiebreak value when set)")
    q.add_argument("--tiebreak", default=None, metavar="FIELD",
                   help="unique-within-second column (e.g. digest) for "
                        "gap-free paging; joins the sort order")
    q.add_argument("--closest", default=None)
    q.add_argument("--sort-reverse", action="store_true")
    q.add_argument("--fuzzy", action="store_true")
    q.add_argument("--fuzzy-rules", default=None, metavar="RULES_YAML",
                   help="pywb rules.yaml fuzzy_lookup table (implies --fuzzy); "
                        "quarantined rules warn, never half-apply")
    q.add_argument("--acl", default=None, metavar="ACLJ",
                   help="wb-manager .aclj file: excluded captures vanish, "
                        "blocked ones stay listed")
    q.add_argument("--embargo", default=None, metavar="CONFIG_YAML",
                   help="pywb config.yaml with an embargo: block — embargoed "
                        "captures are hidden unless an acl rule says "
                        "allow_ignore_embargo; a malformed block is an ERROR "
                        "(serving embargoed captures is never the fallback)")
    q.add_argument("--as-of", dest="as_of", default=None, metavar="TS14",
                   help="the embargo clock for newer:/older: durations — "
                        "explicit, so the same query is deterministic")
    q.add_argument("--limit", type=int, default=None)
    q.add_argument("--offset", type=int, default=None,
                   help="skip N rows of the sort order before limit (IA "
                        "cdx-server offset=; for deep paging prefer "
                        "resumeKey — it prunes blocks instead)")
    q.add_argument("--page", type=int, default=None,
                   help="page=N block-run pagination: read only that run of "
                        "--page-size index blocks (O(page) reads at any "
                        "index size)")
    q.add_argument("--page-size", type=int, default=1,
                   help="index blocks per page (default 1)")
    q.add_argument("--show-num-pages", action="store_true",
                   help="print the page count for the range (cluster.idx "
                        "arithmetic only — zero shard bytes)")
    q.add_argument("--show-paged-index", action="store_true",
                   help="print the secondary-index block lines themselves")
    q.add_argument("--fields", default=None, help="comma-separated fl= projection")
    q.add_argument("--output", default="text",
                   choices=["text", "json", "cdxj"],
                   help="classic 11-field lines (default), one JSON object "
                        "per row, or CDXJ ('urlkey ts {json}' — the Common "
                        "Crawl wire format)")
    q.add_argument("--epochs", action="store_true",
                   help="CLUSTER_DIR is an incremental epoch store "
                        "(update-index output): every epoch block-prunes, "
                        "survivors union, takedown tombstones apply")
    q.add_argument("--as-of-epoch", dest="as_of_epoch", type=int,
                   default=None, metavar="N",
                   help="snapshot time travel (with --epochs, or "
                        "--parquet-index on an epoch store): answer as "
                        "the index stood right after epoch N landed")
    q.add_argument("--fast-latest", action="store_true",
                   help="IA fastLatest=true: serve a negative --limit from "
                        "a doubling tail probe of the index instead of "
                        "decompressing every matching block (single-cluster "
                        "only; filters may return fewer rows)")
    q.add_argument("--parquet-index", action="store_true",
                   help="CLUSTER_DIR is a columnar (cc-index-table-layout) "
                        "parquet index: key and time bounds push into the "
                        "scan, no block pruning needed; an epoch store "
                        "(update-parquet-index output) additionally honors "
                        "takedowns and --as-of-epoch")

    tm = sub.add_parser("timemap", help="Memento TimeMap for one URI-R "
                                        "over a cluster (RFC 7089 / pywb "
                                        "/timemap/ endpoints)")
    tm.add_argument("cluster_dir")
    tm.add_argument("url")
    tm.add_argument("--format", default="link",
                    choices=["link", "json", "cdxj"],
                    help="application/link-format, pywb JSON lines, or CDXJ")
    tm.add_argument("--replay-base",
                    default="https://web.archive.example/web/",
                    help="replay-URL base for memento URIs")
    tm.add_argument("--page-size", type=int, default=None,
                    help="split the link-format TimeMap into pages of N "
                         "mementos with self/prev/next timemap link-values "
                         "(RFC 7089 §5 paging; link format only)")
    tm.add_argument("--page", type=int, default=None,
                    help="emit only page N (with --page-size)")

    qb = sub.add_parser(
        "query-batch",
        help="answer N cdx-server requests in ONE job over a cluster "
             "(the cc-index-server amortization): block IO bounded by "
             "the union of the requests' key ranges",
    )
    qb.add_argument("cluster_dir")
    qb.add_argument(
        "requests",
        help="JSON file: a list of request objects with keys url, "
             "matchType, from, to, filter (list), limit, closest — "
             "the pywb GET-parameter names",
    )
    qb.add_argument("--output", default="text", choices=["text", "json"])

    tg = sub.add_parser("timegate", help="Memento TimeGate for one URI-R "
                                         "(RFC 7089 §4): the 302 redirect "
                                         "headers for the capture closest "
                                         "to --accept-datetime")
    tg.add_argument("cluster_dir")
    tg.add_argument("url")
    tg.add_argument("--accept-datetime", required=True, metavar="DT",
                    help="the negotiated datetime: a ts14 prefix, or the "
                         "RFC-1123 form Memento clients actually send "
                         "('Thu, 01 Jan 2015 00:00:00 GMT'); the engine "
                         "takes no clock of its own")
    tg.add_argument("--replay-base",
                    default="https://web.archive.example/web/",
                    help="replay-URL base for memento URIs")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    from pyspark.sql import SparkSession

    from .session import tune

    spark = SparkSession.builder.getOrCreate()
    tune(spark)

    try:
        return _dispatch(args, spark)
    except ValueError as e:
        # engine-side parameter validation (wildcard ambiguity, paging
        # scheme conflicts, the offset cap, resume-key arity, embargo
        # shapes) surfaces as the same clean error + exit-2 convention
        # the CLI's own checks use — never a traceback
        print(f"error: {e}", file=sys.stderr)
        return 2


def _dispatch(args, spark) -> int:

    if args.cmd == "index-warcs":
        from .plans.pipeline import index_to_cdx_gz

        index_to_cdx_gz(
            spark, args.manifest, args.cdx_dir, files_per_task=args.files_per_task
        )
    elif args.cmd == "media-meta":
        from .operators.multimodal import media_meta
        from .plans.pipeline import _manifest_df
        from .sources.warc import index_warcs

        prefixes = tuple(
            p.strip() for p in args.mime_prefixes.split(",") if p.strip()
        )
        kept = index_warcs(
            spark, _manifest_df(spark, args.manifest),
            files_per_task=args.files_per_task,
            split_bytes=args.split_bytes,
            keep_payload=prefixes,
        )
        media_meta(kept).write.mode("overwrite").parquet(args.out_dir)
    elif args.cmd == "zorder":
        from .operators.bucketing import write_zordered

        cols = [c.strip() for c in args.cols.split(",") if c.strip()]
        if not cols:
            raise ValueError("zorder: --cols must name at least one column")
        write_zordered(
            spark.read.parquet(args.in_path), args.out_dir, cols,
            bits=args.bits, n_files=args.n_files,
            bucketing=args.bucketing,
        )
    elif args.cmd == "wet-extract":
        from pyspark.sql import functions as F

        from .functions.timestamps import from_ts14
        from .operators.html_extract import extract_main_content
        from .plans.pipeline import _manifest_df
        from .sources.warc import index_warcs, write_wet

        kept = index_warcs(
            spark, _manifest_df(spark, args.manifest),
            files_per_task=args.files_per_task,
            split_bytes=args.split_bytes,
            keep_payload=("text/html",),
        )
        ext = extract_main_content(
            kept, keys=("urlkey", "url", "timestamp"),
            min_words=args.min_words,
            max_link_density=args.max_link_density,
        )
        manifest = write_wet(
            ext.select(
                "url",
                F.date_format(
                    from_ts14(F.col("timestamp")),
                    "yyyy-MM-dd'T'HH:mm:ss'Z'",
                ).alias("date_iso"),
                "main_text",
            ),
            args.out_dir,
            n_files=args.n_files,
        )
        for path, n in manifest:
            print(f"{path}\t{n}")
    elif args.cmd == "rearchive":
        from .sources.warc import write_warc

        manifest = write_warc(
            spark.read.parquet(args.in_path),
            args.out_dir,
            n_files=args.n_files,
            url_col=args.url_col,
            date_col=args.date_col,
            payload_col=args.payload_col,
            mime_col=args.mime_col,
            status_col=args.status_col,
        )
        for path, n in manifest:
            print(f"{path}\t{n}")
    elif args.cmd == "zipnum-cluster":
        from .plans.pipeline import cluster_from_cdx_gz

        cluster_from_cdx_gz(
            spark, args.cdx_dir, args.out_dir,
            shards=args.shards, numlines=args.numlines,
        )
    elif args.cmd == "build-index":
        from .plans.pipeline import build_index

        rts = (
            tuple(t.strip() for t in args.record_types.split(",") if t.strip())
            if args.record_types else None
        )
        build_index(
            spark, args.manifest, args.out_dir,
            shards=args.shards, numlines=args.numlines,
            files_per_task=args.files_per_task,
            record_types=rts, post_append=args.post_append,
        )
    elif args.cmd == "build-parquet-index":
        from .plans.pipeline import build_parquet_index

        build_parquet_index(
            spark, args.manifest, args.out_dir,
            range_partitions=args.range_partitions,
            files_per_task=args.files_per_task,
        )
    elif args.cmd == "compact":
        from .sinks.parquet_index import (
            compact_parquet_index_epochs,
            store_backend,
        )
        from .sinks.zipnum import compact_zipnum_epochs

        if store_backend(args.out_dir) == "parquet":
            compact_parquet_index_epochs(
                spark, args.out_dir,
                range_partitions=args.range_partitions,
                retain_inputs=args.retain_inputs,
            )
        else:
            compact_zipnum_epochs(
                spark, args.out_dir, shards=args.shards,
                numlines=args.numlines, retain_inputs=args.retain_inputs,
            )
    elif args.cmd == "stream-graph-append":
        from .streaming.incremental import stream_graph_appends

        q = stream_graph_appends(
            spark, args.input_dir, args.root, args.checkpoint_dir,
            schema=args.schema,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        q.awaitTermination()
        print("drained")
    elif args.cmd == "expire-ann-versions":
        from .sinks.ann_index import expire_store_versions

        for name in expire_store_versions(
            args.root, min_age_s=args.min_age_s,
            stale_building_s=args.stale_building_s,
        ):
            print(name)
    elif args.cmd == "expire-snapshots":
        from .sinks.zipnum import expire_snapshots, vacuum_tmp

        for name in expire_snapshots(args.out_dir, keep_last=args.keep_last):
            print(name)
        if args.vacuum_tmp:
            for name in vacuum_tmp(args.out_dir):
                print(name)
    elif args.cmd == "update-index":
        from .plans.pipeline import update_index

        epoch = update_index(
            spark, args.manifest, args.out_dir,
            shards=args.shards, numlines=args.numlines, compact=args.compact,
            maintain_stats=args.maintain_stats,
        )
        print(f"epoch: {epoch}" if epoch is not None else "up to date")
    elif args.cmd == "update-parquet-index":
        from .plans.pipeline import update_parquet_index

        epoch = update_parquet_index(
            spark, args.manifest, args.out_dir,
            range_partitions=args.range_partitions, compact=args.compact,
            maintain_stats=args.maintain_stats,
        )
        print(f"epoch: {epoch}" if epoch is not None else "up to date")
    elif args.cmd == "query":
        from .plans.pipeline import query_index

        acl_rules = None
        if args.acl:
            from .sources.pywb_config import load_aclj

            acl_rules, bad = load_aclj(args.acl)
            for ln in bad:  # quarantined, never widened — surface them
                print(f"warning: unparseable acl line skipped: {ln}",
                      file=sys.stderr)
        embargo = None
        if args.embargo:
            from .sources.pywb_config import load_embargo

            embargo, bad = load_embargo(args.embargo)
            if embargo is None:
                # fail CLOSED: a half-understood embargo must never
                # fall back to serving the embargoed captures
                for reason in bad:
                    print(f"error: embargo config rejected: {reason}",
                          file=sys.stderr)
                return 2
            if ("newer" in embargo or "older" in embargo) and not args.as_of:
                print("error: embargo newer:/older: need --as-of TS14 "
                      "(the engine takes no clock of its own)",
                      file=sys.stderr)
                return 2
        extra = {}
        if args.fuzzy_rules:
            from .sources.pywb_config import load_fuzzy_rules

            rules, bad = load_fuzzy_rules(args.fuzzy_rules)
            for reason in bad:  # never half-applied — surface them
                print(f"warning: fuzzy rule quarantined: {reason}",
                      file=sys.stderr)
            extra["fuzzy_rules"] = rules
        resume_key = None
        if args.resume_key:
            if len(args.resume_key) not in (2, 3):
                print("error: --resume-key takes URLKEY TS [TIEVAL]",
                      file=sys.stderr)
                return 2
            resume_key = tuple(args.resume_key)
        if args.show_resume_key and (
            args.limit is None or args.limit < 0 or args.fields
            or args.sort_reverse or args.closest
            or args.output == "cdxj"
        ):
            print("error: --show-resume-key needs a positive --limit and "
                  "pages the default order (no --fields/--sort-reverse/"
                  "--closest; text or json output)", file=sys.stderr)
            return 2
        if args.as_of_epoch is not None and not (
            args.epochs or args.parquet_index
        ):
            print("error: --as-of-epoch needs --epochs or --parquet-index "
                  "(snapshots live in an incremental store)", file=sys.stderr)
            return 2
        if args.fast_latest and (args.epochs or args.parquet_index):
            print("error: --fast-latest is a ZipNum-cluster tail-probe; "
                  "the parquet index and epoch store serve limit=-N "
                  "directly", file=sys.stderr)
            return 2
        if args.epochs and args.parquet_index:
            print("error: --epochs and --parquet-index name different "
                  "index layouts; pick one", file=sys.stderr)
            return 2
        if args.show_num_pages or args.show_paged_index:
            if args.epochs or args.parquet_index:
                print("error: --show-num-pages/--show-paged-index are "
                      "single-cluster (block-run) requests; compact the "
                      "store and page the merged cluster",
                      file=sys.stderr)
                return 2
            # index-structure answers: no residual query pipeline
            df = query_index(
                spark, args.cluster_dir, args.url,
                match_type=args.match_type, page_size=args.page_size,
                show_num_pages=args.show_num_pages,
                show_paged_index=args.show_paged_index,
            )
            for row in df.toLocalIterator():
                print(" ".join(str(v) for v in row))
            return 0
        shared = dict(
            match_type=args.match_type, from_=args.from_, to=args.to,
            filters=args.filters or None, collapse=args.collapse,
            collapse_to_last=args.collapse_to_last,
            show_group_count=args.show_group_count,
            show_skip_count=args.show_skip_count,
            resume_key=resume_key, tiebreak=args.tiebreak,
            closest=args.closest, sort_reverse=args.sort_reverse,
            fuzzy=args.fuzzy or bool(args.fuzzy_rules), limit=args.limit,
            offset=args.offset,
            fields=args.fields.split(",") if args.fields else None,
            acl_rules=acl_rules, embargo=embargo, as_of=args.as_of,
            **extra,
        )
        if args.epochs:
            from .operators.cdx_query import cdx_query_epochs

            # page= forwards so the operator's single-cluster
            # refusal surfaces as the clean exit-2 convention
            df = cdx_query_epochs(
                spark, args.cluster_dir, args.url,
                as_of_epoch=args.as_of_epoch, page=args.page, **shared,
            )
        elif args.parquet_index:
            from .operators.cdx_query import cdx_query_parquet

            df = cdx_query_parquet(
                spark, args.cluster_dir, args.url, page=args.page,
                as_of_epoch=args.as_of_epoch, **shared,
            )
        else:
            df = query_index(
                spark, args.cluster_dir, args.url,
                page=args.page, page_size=args.page_size,
                fast_latest=args.fast_latest, **shared,
            )
        # stream through the driver: toLocalIterator holds one
        # partition at a time, so an unbounded prefix/domain query
        # without --limit cannot OOM the driver heap
        last = None
        n_rows = 0
        if args.output == "cdxj":
            # the fixed CDXJ grammar (cdxj_line_expr) — annotation
            # columns ride in json/text output, not here
            from .sources.cdx import cdxj_line_expr

            for row in df.select(
                cdxj_line_expr().alias("value")
            ).toLocalIterator():
                n_rows += 1
                print(row["value"])
        elif args.output == "json":
            for line in df.toJSON().toLocalIterator():
                n_rows += 1
                last = line
                print(line)
            import json as _json

            last = _json.loads(last) if last is not None else None
        else:
            if args.fields is None:
                from .sources.cdx import CDX_FIELDS

                # IA-style collapse annotations append to the line end
                # — without this the --show-*-count flags would be
                # silent no-ops in the default text output
                names = [name for name, _ in CDX_FIELDS] + [
                    c
                    for c in ("groupcount", "skipcount", "lastskiptimestamp")
                    if c in df.columns
                ]
                for row in df.toLocalIterator():
                    n_rows += 1
                    last = row
                    print(" ".join(
                        "-" if row[name] is None else str(row[name])
                        for name in names
                    ))
            else:
                for row in df.toLocalIterator():
                    print(" ".join("-" if v is None else str(v) for v in row))
        if args.show_resume_key and last is not None and n_rows == args.limit:
            # pywb showResumeKey: blank separator, then the key the
            # NEXT request passes as --resume-key (tiebreak-extended
            # when gap-free paging is on)
            parts = [last["urlkey"], last["timestamp"]]
            if args.tiebreak:
                # json output went through toJSON(), which OMITS null
                # fields — last is then a dict missing the key, so a
                # bracket lookup would KeyError-traceback on a NULL
                # tiebreak value (e.g. damaged digest); '-' is the CDX
                # null placeholder and sorts before every real value,
                # matching the strictly-after continuation contract
                tv = (
                    last.get(args.tiebreak)
                    if isinstance(last, dict)
                    else last[args.tiebreak]
                )
                parts.append("-" if tv is None else str(tv))
            print()
            print(" ".join(parts))
    elif args.cmd == "timemap":
        from .operators.timemap import timemap_json, timemap_linkformat
        from .plans.pipeline import query_index

        df = query_index(spark, args.cluster_dir, args.url)
        if args.page_size is not None and args.format != "link":
            print("error: --page-size pages the link-format TimeMap only",
                  file=sys.stderr)
            return 2
        if args.page is not None and (args.page_size is None or args.page < 0):
            print("error: --page needs --page-size and must be >= 0",
                  file=sys.stderr)
            return 2
        if args.page_size is not None:
            from pyspark.sql import functions as F

            from .operators.timemap import timemap_linkformat_paged

            lines = timemap_linkformat_paged(
                df.select("urlkey", "timestamp"),
                page_size=args.page_size,
                ts_col="timestamp",
                replay_base=args.replay_base,
            )
            if args.page is not None:
                lines = lines.filter(F.col("page") == args.page)
            ordered = lines.orderBy("urlkey", "page", "line_no").select("line")
            for row in ordered.toLocalIterator():
                print(row["line"])
            return 0
        if args.format == "cdxj":
            from .sources.cdx import cdxj_line_expr

            from pyspark.sql import functions as F

            lines = df.select(
                "urlkey", F.col("timestamp").alias("line_no"),
                cdxj_line_expr().alias("line"),
            )
        else:
            fmt = timemap_linkformat if args.format == "link" else timemap_json
            lines = fmt(
                df.select("urlkey", "timestamp"),
                ts_col="timestamp",
                replay_base=args.replay_base,
            )
        ordered = lines.orderBy("urlkey", "line_no").select("line")
        for row in ordered.toLocalIterator():
            print(row["line"])
    elif args.cmd == "query-batch":
        import json as _json

        from .operators.cdx_query import cdx_query_batch_zipnum

        with open(args.requests) as fh:
            raw = _json.load(fh)
        if not isinstance(raw, list):
            print("error: requests file must be a JSON list of request "
                  "objects", file=sys.stderr)
            return 2
        # pywb GET-parameter spellings → operator kwargs
        key_map = {"url": "url", "matchType": "match_type", "from": "from_",
                   "to": "to", "filter": "filters", "limit": "limit",
                   "closest": "closest"}
        reqs = []
        for i, obj in enumerate(raw):
            unknown = set(obj) - set(key_map)
            if unknown:
                print(f"error: request {i}: unknown keys {sorted(unknown)}",
                      file=sys.stderr)
                return 2
            reqs.append({key_map[k]: v for k, v in obj.items()})
        df = cdx_query_batch_zipnum(spark, args.cluster_dir, reqs)
        df = df.orderBy("request_no", "urlkey", "timestamp")
        if args.output == "json":
            for line in df.toJSON().toLocalIterator():
                print(line)
        else:
            names = df.columns
            for row in df.toLocalIterator():
                print(" ".join(
                    "-" if row[name] is None else str(row[name])
                    for name in names
                ))
    elif args.cmd == "timegate":
        from .operators.timemap import timegate
        from .plans.pipeline import query_index

        adt = str(args.accept_datetime)
        if not (4 <= len(adt) <= 14 and adt.isdigit()):
            # RFC 7089 §2.1.1: clients send Accept-Datetime in RFC-1123
            # form — accept it alongside the ts14 shorthand
            from datetime import datetime

            try:
                adt = datetime.strptime(
                    adt, "%a, %d %b %Y %H:%M:%S GMT"
                ).strftime("%Y%m%d%H%M%S")
            except ValueError:
                print("error: --accept-datetime must be a ts14 prefix or "
                      "an RFC-1123 datetime ('Thu, 01 Jan 2015 00:00:00 "
                      "GMT')", file=sys.stderr)
                return 2
        df = query_index(spark, args.cluster_dir, args.url)
        rows = timegate(
            df.select("urlkey", "timestamp"), adt, ts_col="timestamp",
            replay_base=args.replay_base,
        ).limit(2).collect()
        if not rows:
            print("error: no mementos for this URI-R", file=sys.stderr)
            return 2
        if len(rows) > 1:
            # a TimeGate negotiates ONE URI-R (RFC 7089 §4); a wildcard
            # that matched several urlkeys would silently pick one
            print("error: the request matched multiple urlkeys — a "
                  "TimeGate negotiates one URI-R (no wildcards)",
                  file=sys.stderr)
            return 2
        r = rows[0]
        print(f"HTTP/1.1 {r['status']} Found")
        print(f"Location: {r['location']}")
        print(f"Vary: {r['vary']}")
        print(f"Link: {r['link']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
