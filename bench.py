#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The printed line keeps the full per-query map but rounds to 2 decimals
and leads with the headline value; the SAME payload (3-decimal
precision) is also written to BENCH_LOCAL.json next to this script, so
a truncated stdout capture can never destroy the result (round 1's
BENCH_r01.json ended up with "parsed": null because only a tail of the
~4 KB line survived).

Each query is forced end-to-end with a noop sink (full computation, no
driver collect overhead) after one warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_service_spark.plans.queries import registry, views  # noqa: E402
from etl_service_spark.session import get_spark  # noqa: E402

HEADLINERS = [
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_local_supplier",
    "tpch_q13_custdist",
    "chain_join_revenue",
    "top_parts_by_revenue",
    "events_window_agg",
    "events_sessionize",
    "events_session_window_native",
    "events_asof_join",
    "events_funnel",
    "events_range_join",
    "events_multires_rollup",
    "ana_argmax_last_run",
    "etl_copy_timesliced",
    "etl_copy_align_audit",
    "dim_scd2_merge",
    "dim_scd2_pit_lookup",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cluster_components",
    "dedup_cluster_twophase",
    "graph_pagerank",
    "sketch_kmv_distinct",
    "sketch_cms_heavy_hitters",
    "sketch_histogram_quantiles",
    "sketch_bloom_membership",
    "text_quality_score",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "text_top_terms_per_language",
    "events_moving_average",
    "events_interarrival_stats",
    "orders_cube_revenue",
    "dedup_fuzzy_names",
    "profile_orders_columns",
    "corpus_dup_rate_by_source",
    "corpus_stratified_sample",
    "corpus_training_pipeline",
    "corpus_contamination",
    "ann_cosine_topk",
    "emb_cosine_neardup",
    "ann_lsh_bucketed",
    "ann_ivf_topk",
    "emb_kmeans",
    "emb_quantize_int8",
    "media_binary_stats",
    "media_frame_sample",
    "media_chunk_windows",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q15_top_supplier",
    "tpch_q19_or_pushdown",
    "tpch_q21_lone_late_supplier",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q12_priority_classes",
    "tpch_q16_supplier_variety",
    "tpch_q20_volume_suppliers",
    "orders_running_spend",
    "events_value_time_corr",
    "nation_top_customer_argmax",
    "events_value_deciles",
    "q17_small_qty_revenue",
    "tpch_q18_bulk_customers",
    "events_cohort_retention",
    "anti_join_never_shipped",
    "events_salted_agg",
    "events_salted_join",
    "events_attribution_join",
    "text_repetition_quality",
    "lineitem_unpivot_stats",
    "privacy_k_anonymity",
    "privacy_pseudonymize",
    "dq_expectation_report",
    "corpus_pack_sequences",
    "sketch_kmv_audience_overlap",
    "sketch_hll_distinct",
    "events_gapfill_hourly",
    "text_bigram_lm_score",
    "dedup_chunk_exact",
    "events_hopping_window",
    "events_user_rate_cap",
    "privacy_l_diversity",
    "privacy_scrub_pii",
    "corpus_shard_plan",
    "dedup_best_keeper",
    "dedup_semantic",
    "text_sentence_split",
    "ann_recall_report",
    "ann_matryoshka_recall",
    "ann_ivf_nprobe_sweep",
    # ann_ivf_incremental is registry-gated but not benched: it is a
    # stateful multi-commit maintenance simulation (build/merge/rebuild
    # snapshots), not a single query wall - its per-tick cost is what
    # test_ivf_assign_stream_* pins.
    "dedup_lsh_recall_report",
    "dedup_strategy_sweep",
    "events_variant_extract",
    "events_gaps_islands",
    "orders_rfm_segments",
    "text_langid_confusion",
    "corpus_resample_plan",
    "corpus_length_histogram",
    "events_anomaly_mad",
    "emb_pq_codes",
    "ann_pq_adc_topk",
    "ann_pq_recall_report",
    "graph_triangle_count",
    "dedup_containment",
    "corpus_temperature_mixture",
    "orders_pareto_share",
    "join_bloom_prefilter_revenue",
    "sketch_hll_weekly_rollup",
    "corpus_token_budget",
    "events_markov_transitions",
    "events_top_paths",
    "corpus_cross_source_overlap",
    "text_zipf_profile",
    "events_distribution_drift",
    "corpus_dedup_survivorship",
    "text_ngram_novelty",
    "orders_gap_distribution",
    "emb_hamming_knn_graph",
    "events_burst_windows",
    "graph_kcore",
    "text_boilerplate_prefixes",
    "text_pmi_collocations",
    "events_changepoint_scan",
    "events_late_data_audit",
    "events_seasonal_residuals",
    "profile_key_skew",
    "dedup_lsh_cost_audit",
    "dedup_lsh_band_tuning",
    "text_chunk_overlap",
    "text_gopher_rules",
    "text_hashed_linear_score",
    "profile_join_size_estimate",
    "profile_range_boundaries",
    "corpus_weighted_sample",
    "corpus_split_leakage",
    "corpus_domain_quota",
    "src_schema_evolution",
    "snap_merge_upsert",
    "emb_centroid_outliers",
    "text_bpe_merges",
    "text_bpe_encode",
    "corpus_token_budget_bpe",
    "events_moment_stats",
    "profile_group_cardinality",
    "corpus_domain_quota_salted",
    "corpus_filter_waterfall",
    "events_ab_lift",
    "sketch_hll_sliding_distinct",
    "dedup_minhash_estimate_audit",
    "recon_users_customers_full_outer",
    "media_image_dims_sniff",
    "media_audio_meta_sniff",
    "media_video_meta_sniff",
    "text_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "text_rake_keywords",
    "snap_incremental_agg",
    "events_forecast_backtest",
    "corpus_dsir_weights",
    "corpus_dsir_quota",
    "cfg_param_reload",
    "cfg_mail_recipients",
    "media_resize",
    "dedup_exact_substr_spans",
    "dedup_exact_substr_removal",
    "text_bpe_fertility",
    "text_ngram_coverage",
    "emb_whitening_stats",
    "events_watermark_lateness",
    "dq_volume_anomaly",
    "ann_hamming_banded",
    "ann_hamming_banded_recall",
    "cfg_stale_reset",
    "media_wav_rms_windows",
    "dedup_threshold_curve",
    "privacy_dp_epsilon_ledger",
    "corpus_epoch_mix_schedule",
    "dedup_url_canonical",
]


def _env_stanza() -> dict:
    """Host-contention fingerprint recorded WITH the numbers: round 5's
    driver bench drifted 1.2x uniformly vs a 2.4x-faster quiet-box run
    of the same commit — without load context such drift is
    uninterpretable round-over-round. loadavg is sampled at start and
    (by the caller) at end; a 1-minute load near/above the core count
    means the timings measured a busy box, not the plans."""
    la = os.getloadavg()
    return {
        "os_cpus": os.cpu_count(),
        "spark_cpus": os.environ.get("SPARK_GRAFT_CPUS", "(default)"),
        "load_1m_start": round(la[0], 2),
        "load_5m_start": round(la[1], 2),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    env = _env_stanza()
    spark = get_spark("etl_service_spark_bench")
    cases = registry()
    views(spark, sf_dir)  # pay view registration once, like a real session

    # JVM/codegen warm-up + Python/Arrow worker spawn on unrelated
    # trivial jobs (worker startup is session init, not query cost)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from etl_service_spark.functions import portable as P

    P.warm_udfs(spark)

    # Each query is timed twice and the MIN is reported: single-JVM
    # local mode has 2-3x run-to-run noise from one-time codegen/JIT
    # and host contention, and min-of-N is the standard way to measure
    # the steady-state cost (what a long-running cluster session pays).
    timings: dict[str, float] = {}
    for name in HEADLINERS:
        case = cases[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = case.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    env["load_1m_end"] = round(os.getloadavg()[0], 2)
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "n_queries": len(timings),
        "env": env,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # Printed line stays well under common capture limits (~1 KB): the
    # headline value leads, the queries map is trimmed to the slowest 20
    # (2-decimal), and the full map lives in BENCH_LOCAL.json.
    slowest = dict(
        sorted(
            ((k, round(v, 2)) for k, v in timings.items()),
            key=lambda kv: -kv[1],
        )[:20]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "sf": float(sf),
                "n_queries": len(timings),
                "env": env,
                "queries": slowest,
                "full_results": "BENCH_LOCAL.json",
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
