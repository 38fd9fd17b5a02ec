#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs each headline query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Materialization is a noop-sink write (full pipeline executes on the
executors; nothing funnels through the driver), which is the honest
cost model for a cluster sink.  An untimed warmup pass executes every
query once first, so the timed pass measures steady-state execution
rather than JVM/JIT/codegen compilation of each query's generated
classes (single-shot timings vary 5-15x on the heavy expression trees
purely from compile scheduling).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webarchive_indexing_spark.registry import all_queries  # noqa: E402
from webarchive_indexing_spark.session import get_session  # noqa: E402

#: headline set — updated as operators land (keep ~10; representative
#: of scan/filter/join/agg/window/sort/llm families).
HEADLINE = [
    "q1_pricing_summary",
    "join_broadcast_dim",
    "join_large_smj",
    "join_theta_range",
    "agg_count_distinct",
    "agg_rollup",
    "topk_desc",
    "fn_json_map",
    "win_row_number",
    "asof_join_nearest",
    "sessionize_gaps",
    "cdx_surt_urlkey",
    "cdx_collapse_digest",
    "zipnum_roundtrip_prefix",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard",
    "dedup_cluster_cc",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_lsh_buckets",
    "text_token_stats",
    "text_tfidf_topterms",
    "quality_repetition_gopher",
    "decontaminate_ngram_overlap",
    "pack_token_budget",
    "dedup_minhash_lsh_pairs",
    "text_unigram_logprob",
    "curriculum_percentile",
    "emb_quantize_int8",
    "semdedup_keep_list",
    "cdx_page_blocks",
    "dedup_paragraph_chunks",
    "cdx_crawl_diff",
    # round 4
    "q3_shipping_priority",
    "emb_pq_adc_topk",
    "emb_ivf_pq_topk",
    "emb_kmeans_lloyd",
    "emb_power_iteration",
    "text_chunk_sliding",
    "text_bigram_logprob",
    "text_bpe_learn_merges",
    "multimodal_phash_near_dup",
    "cdx_fuzzy_match",
    "cdx_fetch_plan",
    "dedup_bloom_prefilter",
    "sample_temperature_sources",
    "events_anomaly_mad",
    "events_view_click_attrib",
    # round 5
    "emb_ivf_trained_topk",
    "cdx_server_composed_zipnum",
    "multimodal_decode_real",
    "cdx_show_dupecount",
    "cdx_output_json",
    "emb_ivfadc_trained_topk",
    "text_cms_heavy_hitters",
    "emb_ivfadc_residual_topk",
    "dedup_jaccard_prefix_filter",
    "cdx_resume_key",
    "pretrain_corpus_verdicts",
    "q5_local_supplier_volume",
    # round 6
    "cdx_legacy_9field",
    "emb_ivf_sampled_topk",
    "cdx_resume_key_tiebreak",
    "cdx_timemap_linkformat",
    "cdx_fuzzy_filtered_retry",
    "cdx_show_paged_index",
    "zipnum_cdxj_roundtrip",
    "cdx_collapse_multi",
    "dedup_duplicate_spans",
    "cdx_acl_longest_prefix",
    # round 7
    "cdx_fuzzy_match_from_rules",
    "cdx_acl_from_aclj",
    "cdx_collapse_to_last",
    "cdx_header_roundtrip",
    "cdx_timemap_json",
    "cdx_timemap_cdxj",
    "text_mojibake_score",
    "decontaminate_containment",
    "cdx_collapse_group_count",
    "cdx_show_skip_count",
    # round 8
    "cdx_acl_embargo",
    "cdx_fuzzy_replace_rule",
    "cdx_url_wildcard_prefix",
    "cdx_url_wildcard_domain",
    "cdx_fuzzy_filter_echo",
    "cdx_limit_offset",
    "text_pii_redact",
    "docs_url_blocklist_verdicts",
    "quality_linear_classifier",
    "cdx_fuzzy_args_keep",
    "cdx_parquet_index_roundtrip",
    "text_bm25_topk",
    "dsir_importance_weights",
    "zipnum_time_travel",
    "cdx_epoch_query_asof",
    "cdx_parquet_index_query",
    "cdx_fast_latest",
    "graph_hits_hubs_authorities",
    "cdx_parquet_takedown",
    "parquet_time_travel",
    "parquet_compact_purge",
    "cdx_post_request_key",
    "multimodal_image_dims",
    "text_bpe_encode_ids",
    "text_lang_id_hashed",
    "cdx_timegate",
    "cdx_timemap_paged",
    "dedup_keep_best_per_cluster",
    "decontaminate_canary_scan",
    "training_order_shuffle",
    "events_funnel_steps",
    "cdx_epoch_diff",
    "emb_ivf_persisted_topk",
    "dedup_rate_by_source",
    "cdx_robots_flags",
    # round 10
    "emb_ivfadc_persisted_topk",
    "emb_ivf_delete_probe",
    "cdx_surt_pct_deep",
    "cdx_query_batch",
    "quality_classifier_trained",
    "text_bpe_byte_level",
    "cdx_query_batch_parquet",
    "multimodal_audio_meta",
    "emb_ivfpq_delete_probe",
    "emb_ivfpq_refined_topk",
    "decontaminate_semantic",
    # round 11
    "emb_ann_query_batch",
    "emb_ann_refined_batch",
    "emb_ivf_query_batch",
    "emb_ivf_store_rebuild",
    "emb_ivfsq_persisted_topk",
    "emb_ivfpq_refined_store",
    "emb_ivfpq_refined_int8",
    "multimodal_video_meta",
    "cdx_query_batch_closest",
    # round 12
    "emb_ann_filtered_topk",
    "emb_ann_filtered_batch",
    "emb_ivfpq_filtered_topk",
    "warc_media_meta",
    "emb_ivfpq_opq_topk",
    "emb_ivfsq_query_batch",
    "emb_ivfpq_refined_filtered",
    "emb_ivfpq_opq_refined",
    "emb_ann_range_search",
    "emb_ivfsq_range_search",
    "multimodal_web_image_dims",
    "emb_ivfpq_range_search",
    "emb_ann_range_batch",
    "emb_ivf_metric_ip",
    "emb_ivf_metric_l2",
    "events_zorder_box",
    "events_zorder_quantile_box",
    "emb_ivfpq_range_batch",
    "emb_ivfsq_range_batch",
    "emb_ivfpq_opq_range",
    "emb_ann_range_filtered_batch",
    # round 13
    "text_html_main_content",
    "warc_html_quality_verdicts",
    "text_bpe_pretrained_ids",
    "parquet_index_zorder_box",
    "text_vec_doc_embedding",
    "text_arpa_logprob",
    "emb_graph_beam_topk",
    "warc_wet_roundtrip",
    "emb_graph_beam_batch",
    "emb_graph_beam_filtered",
    "warc_pretrain_funnel",
    # round 14
    "emb_graph_grid_build",
    "emb_graph_nnd_build",
    "emb_graph_delete_probe",
    "emb_graph_append_walk",
    "text_sp_unigram_ids",
    "warc_rearchive_roundtrip",
    "warc_revisit_dedup_roundtrip",
    # round 15
    "emb_graph_nnd_sparse_ids",
    "text_wordpiece_ids",
    "emb_graph_beam_batch_filtered",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _reclaim(spark) -> None:
    """Release blocks finished queries leaked into the executor block
    manager (persist() feature frames, localCheckpoint() iterative
    state — correctly never unpersisted by the queries; the frames
    die with the query, but a 160+-query session accumulates all of
    them).  clearCache() drops every cached dataframe (queries never
    reuse a previous query's cache) and a driver gc.collect() lets
    the ContextCleaner reap dead localCheckpoint RDD blocks.

    Called BETWEEN the passes, not per query: the round-13 A/B
    (BASELINE.md) showed per-query reclamation does not reduce the
    3-20x mid-bench excursions on python-stage-heavy queries (host
    variance dominates), so the timed pass runs undisturbed."""
    import gc

    try:
        spark.catalog.clearCache()
    except Exception:
        pass
    gc.collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("webarchive-indexing-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]

    # untimed warmup pass: JVM, JIT, codegen caches, parquet footers
    for name in names:
        materialize(qs[name](spark, sf_dir))
    _reclaim(spark)

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    _reclaim(spark)

    # probe pins: the store-building queries above pin build+probe as
    # one number; here each store family builds ONCE (untimed) and the
    # serving probe is timed alone — the per-request cost a deployment
    # actually pays, immune to fixture-build and /tmp-pressure noise.
    from webarchive_indexing_spark.queries.probes import PROBES  # noqa: E402,PLC0415

    ctxs: dict[str, object] = {}
    for p in PROBES.values():
        if p.family not in ctxs:
            ctxs[p.family] = p.build(spark, sf_dir)
    probe_timings: dict[str, float] = {}
    for name, p in PROBES.items():
        materialize(p.probe(spark, ctxs[p.family]))  # untimed warmup
        t0 = time.perf_counter()
        materialize(p.probe(spark, ctxs[p.family]))
        probe_timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "probes": probe_timings,
        "sf": sf,
    }
    # PINS.json: the per-query capability pins (quiet best-of-4 /
    # authored BASELINE.md values).  Report this run against them so
    # a single driver run carries its own baseline comparison; only
    # meaningful at the pinned scale factor (sf0.1).
    pins_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PINS.json")
    if os.path.exists(pins_path) and sf == "0.1":
        with open(pins_path) as fh:
            pdata = json.load(fh)
        pins = pdata["pins"]
        shared = [n for n in timings if n in pins]
        pin_sum = sum(pins[n]["sec"] for n in shared)
        if pin_sum > 0:
            out["vs_pins"] = {
                "queries": len(shared),
                "pinned_sec": round(pin_sum, 3),
                "measured_sec": round(sum(timings[n] for n in shared), 3),
                "ratio": round(sum(timings[n] for n in shared) / pin_sum, 3),
                "over_2x": sorted(
                    n for n in shared if timings[n] > 2 * pins[n]["sec"]
                ),
            }
        ppins = pdata.get("probe_pins", {})
        pshared = [n for n in probe_timings if n in ppins]
        ppin_sum = sum(ppins[n]["sec"] for n in pshared)
        if ppin_sum > 0:
            out["vs_probe_pins"] = {
                "probes": len(pshared),
                "pinned_sec": round(ppin_sum, 3),
                "measured_sec": round(
                    sum(probe_timings[n] for n in pshared), 3
                ),
                "ratio": round(
                    sum(probe_timings[n] for n in pshared) / ppin_sum, 3
                ),
                "over_2x": sorted(
                    n
                    for n in pshared
                    if probe_timings[n] > 2 * ppins[n]["sec"]
                ),
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
