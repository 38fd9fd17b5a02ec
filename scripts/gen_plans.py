#!/usr/bin/env python
"""Regenerate PLANS.md: executed physical plans of representative
queries with scale commentary.  Run from the repo root."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webarchive_indexing_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from webarchive_indexing_spark.session import get_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

PICKS = {
    "q1_pricing_summary": "Scan → pushed filter → partial HashAggregate → exchange → final aggregate. The shuffle carries pre-aggregated groups, not rows.",
    "join_broadcast_dim": "Dimension side broadcast; fact scan reads only joined+projected columns.",
    "topk_desc": "TakeOrderedAndProject — k rows per partition reduced on the driver; no global sort, no range exchange.",
    "emb_ivf_topk": "Zero exchanges: inlined-quantizer cell argmax + probe filter + TakeOrderedAndProject; only the probed cells are scored.",
    "dedup_exact_groups": "The exchange partitions on md5(text); the text column itself never crosses the shuffle.",
    "dedup_ngram_jaccard": "Shingle explode feeds both self-join sides; set sizes ride as a window count (no separate aggregate or size joins).",
    "zipnum_build_index": "repartitionByRange (internal sampling = the reference's whole SampleCDXJob) → partition-local sort → imperative gzip block writer returning the secondary index.",
    "zipnum_shard_plan": "Exact-quantile split points at scale: range exchange + per-partition row_number windows (PARTITION BY pid — never SinglePartition) + closed-form NTILE allotment; the final agg shuffles 8 rows.",
    "sample_hash_det": "Deterministic sampling is a pure scan-side Filter — zero exchanges; rand() sampling would be non-reproducible and this formulation costs nothing more than the scan.",
    "emb_lsh_join": "Bucket assignment is a map-side projection (no vec_id join); the only join is the bucket self-join at 1/256 all-pairs density, then TakeOrderedAndProject.",
    "join_range_banded": "Pure range join rewritten equi: explode to (bucket, bucket+1) bands, hash-join on the band id, exact range residual after — no NestedLoop at any scale.",
    "emb_centroid_means": "posexplode (Generate) sits BELOW the exchange: partial HashAggregate collapses ×64 exploded rows to ≤ labels×64 partial sums per task — the shuffle carries centroids, not vectors.",
    "emb_pq_adc_topk": "PQ/ADC: zero exchanges — sub-codebook argmin encode and the literal query-distance-table lookup are one map-side projection; TakeOrderedAndProject returns k rows.",
    "emb_ivf_pq_topk": "IVFADC shape: cell argmin + probe filter + PQ encode + ADC lookup, all one map-side projection (fold-form expressions keep it inside codegen); zero exchanges.",
    "cdx_fuzzy_match": "Batch fuzzy fallback: one index equi-join on the exploded (exact,fuzzy) key pair + per-lookup window — never one join per rule stage.",
    "emb_kmeans_lloyd": "Final Lloyd assignment: inlined-centroid argmin projection (no join) + partial/final aggregate — the exchange carries k cluster rows of decimal sums, never vectors.",
    "multimodal_phash_near_dup": "Banded fingerprint self-join: band keys are map-side columns off the Arrow-batched feature stage; the only join is the band-bucket equi-join, Hamming verify is integer codegen after it.",
    "q3_shipping_priority": "Classic 3-table plan: all three filters pushed to their scans, filtered customer broadcast, orderkey SMJ, partial agg, TakeOrderedAndProject top-10.",
    "emb_ivf_trained_topk": "Trained-ANN serving plan: identical zero-exchange probe shape as the stand-in IVF — training happened in separate jobs, the trained centroids are inlined literals here.",
    "emb_ivfadc_trained_topk": "Fully trained IVFADC serving plan: cell argmin + per-subspace trained-codebook encode + ADC table, one map-side projection, zero exchanges.",
    "dedup_bloom_prefilter": "Bloom membership is (word >> bit) & 1 over a 64-long literal bitmask inside the scan projection; the only join is the broadcast ground-truth marker.",
    "text_cms_heavy_hitters": "Sketch build: token-keyed partial aggregate capped at d×w rows per task; estimation joins the broadcast 768-row sketch — the corpus shuffles once, bounded.",
    "cdx_show_dupecount": "One window exchange keyed on digest — the same key revisit-resolve shuffles on, so a composed pipeline shares it.",
    "emb_ivfadc_residual_topk": "Residual serving algebra via combined-codeword literal tables: runtime fold encode + 2-D element_at ADC, zero exchanges, no per-cell branches.",
    "pretrain_corpus_verdicts": "The whole cleaning funnel in one pass: exactly ONE exchange (the md5 dedup window); every later gate is scan-side codegen.",
    "dedup_jaccard_prefix_filter": "PPJoin: checkpointed prefix index feeds both self-join sides and both verify sides; all joins broadcast at this scale, no cartesian.",
    "q5_local_supplier_volume": "TPC-H Q5: dim chain broadcasts, lineitem-orders is the only big-big join, local-supplier condition rides the supplier join as an equi-key.",
    "emb_ivf_sampled_topk": "Sampled training (round 6): the salted-hash sample is a scan-side filter in each Lloyd round; the serving probe is the same zero-exchange plan as the full-train twin.",
    "cdx_fuzzy_filtered_retry": "Per-request fuzzy retry: the 2-key IN filter + doc_id subtree predicate both reach the scan; one global window decides exact-vs-fuzzy AFTER the residual filters.",
    "cdx_show_paged_index": "showPagedIndex: a LocalTableScan of the range-pruned cluster.idx block list — no shard reads, no parse stage; the paging structure IS the answer.",
    "cdx_legacy_9field": "Header-driven dialect scan: one positional split projection with try_element_at/try_cast damage tolerance; absent dialect columns are NULL literals, zero extra passes.",
    "cdx_acl_embargo": "Embargo-aware ACL verdict: the ts14 compare folds into each CASE arm's VALUE inside the same scan-side projection — zero exchanges per as_of clock, rule-count independent.",
    "cdx_fuzzy_filter_echo": "pywb param-echo retry as three EQUI-joins (exact key, rewritten key, key-truncated-at-'?' prefix) + one window; the echo is a join residual — no BroadcastNestedLoop, no per-request loop.",
    "cdx_url_wildcard_prefix": "Inferred prefix query: identical plan to explicit matchType=prefix — the sargable [key, key+'~') range reaches the scan.",
    "cdx_limit_offset": "offset= shallow paging: TakeOrdered with skip — skipped rows never reach the driver; the 100k cap keeps the per-partition top-k buffer bounded.",
    "emb_ivf_persisted_topk": "Persisted-index probe (round 9): cell PartitionFilters prune to the nprobe inverted-list directories — the other cells' files are never listed; no assignment recompute, zero exchanges, TakeOrderedAndProject.",
    "cdx_parquet_takedown": "Columnar epoch store read (round 9): the domain key range pushes through the epoch union into every parquet scan; both tombstone shapes are broadcast anti-joins — a takedown is metadata-sized at any index size.",
    "events_funnel_steps": "Conversion funnel (round 9): cascaded MIN-joins all hash on user_id (one partitioning reused, AQE coalesces the tiny sides); no whole-stream window, no per-user sort.",
    "training_order_shuffle": "Seeded corpus shuffle (round 9): two-pass range rank — the rank pass sits directly on the checkpointed range partitions; no SinglePartition window anywhere.",
    "text_lang_id_hashed": "Trained lang-id (round 9): the ≤2048-row weight table broadcasts; the scoring join carries hashed bucket ids only — raw text never crosses an exchange.",
    "emb_ivfadc_persisted_topk": "PQ-coded store probe (round 10): cell PartitionFilters prune to nprobe code directories, ReadSchema carries j0..j3 codes and NO vector column — map-side ADC, zero pre-top-k exchanges.",
    "emb_ann_query_batch": "Batch ANN serving (round 11): ONE codes scan pruned to the UNION of all requests' probe cells; per-request ADC rides an inline struct fan-out; the only exchange is the request_no top-k window.",
    "emb_ann_refined_batch": "Batch+refine composition (round 11): one sidecar scan pruned to the candidates' cells + pushed id In filter re-ranks every (request, candidate) pair; one window exchange, no join.",
    "emb_ivfpq_refined_store": "Store-resident refine (round 11): the sidecar scan reads exactly the candidate rows — candidate-cell PartitionFilters + vec_id In pushdown; re-rank is map-side, TakeOrderedAndProject.",
    "multimodal_video_meta": "Video container headers (round 11): fixture synth + MP4/MKV header walk are two chained Arrow stages over one scan — media bytes never cross an exchange.",
    "emb_ann_filtered_topk": "Filtered vector search (round 12): the attribute predicate rides the SAME cell-pruned scan (PushedFilters next to the PartitionFilters) BEFORE top-k — k survivors with recall intact, zero exchanges.",
    "emb_ann_filtered_batch": "Filtered BATCH serving (round 12): per-request predicates live in the struct arms map-side; still one union-pruned scan and one request_no window.",
    "emb_ivfsq_query_batch": "SQ8 batch serving (round 12): quantized-payload ReadSchema (tinyint codes + scale, no vector column), dequantize computed once per row and shared by every request's cosine arm.",
    "emb_ivfpq_opq_topk": "OPQ-preconditioned probe (round 12): identical serving plan to plain PQ — the rotation was paid at build, the query vector rotates driver-side; codes-only pruned scan, zero exchanges.",
    "warc_media_meta": "WARC→media curation (round 12): keep_payload ingest is the same mapPartitions parse; header curation is one Arrow stage; payload bytes never cross an exchange and never reach the output.",
    "emb_ann_range_search": "Range search (round 12): the radius cut is a map-side filter above the same cell-pruned scan as top-k; with no LIMIT the only exchange is the final ordering of the data-dependent result.",
    "emb_ann_range_batch": "Batch RANGE serving (round 12): per-request radius cuts in the struct arms — no request window at all; one union-pruned scan, one output-ordering exchange at any request count.",
    "emb_ivfpq_range_search": "PQ range search (round 12): ADC distance threshold on the codes-only pruned scan — no vector bytes, no join; FAISS quantized-index range semantics.",
    "emb_ivfpq_range_batch": "PQ batch range (round 12): N ADC ceilings from one union-pruned codes scan, per-request arms + a request_no CASE cut map-side — no window, one output-ordering exchange.",
    "emb_ivf_metric_l2": "Query-time L2 metric (round 12): distance-ceiling range over the same flat store — metric switches cell ranking, score column, and cut direction with the plan shape unchanged.",
    "events_zorder_box": "Z-order layout (round 12): both box predicates in PushedFilters over the Morton-clustered files — stats-based skipping with the plain parquet reader, no exchange.",
    "text_html_main_content": "HTML extraction (round 13): fixture pages built as a pure JVM concat projection feeding ONE ArrowEvalPython/mapInPandas stage — raw HTML never crosses an exchange; the output is text + counts only.",
    "parquet_index_zorder_box": "OPTIMIZE-ZORDER box read (round 13): both dimensions of the box (url_surtkey range AND fetch_time range) sit in PushedFilters over the z-clustered merged epoch — with INT64 timestamp stats both predicates skip row groups; tombstones stay broadcast anti-joins.",
    "emb_graph_beam_topk": "Graph beam search (round 14 rewrite): each hop pushes the beam ids into the src-bucketed edge store as STATIC PartitionFilters + In(src) pushdown (see tests/test_plans.py::test_graph_walk_scan_is_frontier_pruned for the hop-scan plan) — the edge table is never broadcast or fully scanned; this final plan ranks the checkpointed visited blocks, no cartesian.",
    "text_arpa_logprob": "ARPA backoff scoring (round 13): the loaded LM is two broadcast tables; the corpus side is one pair-explode scan — Katz backoff is a coalesce over join outputs, map-side.",
    "text_sp_unigram_ids": "SentencePiece unigram encode (round 14): whitespace pretokenization + posexplode feed ONE ArrowEvalPython Viterbi stage with the vocab as a broadcast-closure literal; the only exchange re-groups per-word id arrays by doc_id.",
    "warc_rearchive_roundtrip": "WARC re-archiving (round 14): redaction + curation gate are scan-side codegen projections; write_warc is a range shuffle + per-partition gzip writer; re-ingest is the same mapPartitions parse — payload bytes cross exactly the one range exchange the sharded sink needs.",
}


def main() -> None:
    _ensure_loaded()
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan evidence (sf0.01, local mode)",
        "",
        "Generated by `scripts/gen_plans.py`; structural properties are",
        "regression-guarded in `tests/test_plans.py`. Each plan is the",
        "`executedPlan` after AQE re-planning.",
        "",
    ]
    for name, note in PICKS.items():
        df = REGISTRY[name].fn(spark, SF)
        # collect() executes THIS DataFrame's QueryExecution, so the
        # captured plan is the AQE-finalized one (a noop write would
        # execute a separate QueryExecution and leave this one initial)
        try:
            df.collect()
        except Exception:
            pass
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        if len(lines) > 40:
            lines = lines[:40] + [f"... ({len(plan.splitlines()) - 40} more lines)"]
        out += [f"## {name}", "", note, "", "```"]
        out += [ln.rstrip() for ln in lines]
        out += ["```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))


if __name__ == "__main__":
    main()
