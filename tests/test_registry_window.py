"""Driver-contract guard: the FIRST 50 registered queries are the
round's curated correctness-sample window (registry._PRIORITY_PREFIXES).
A new query whose name collides with an early prefix would silently
displace a staged never-sampled query — this pins the window so that
mistake fails loudly instead."""

from __future__ import annotations

from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

load_all_queries()

# the r5 window (COVERAGE.md "Driver correctness-sample window")
R5_WINDOW = [
    "text_lm_score", "events_rfm_segments", "retrieval_rrf_fusion",
    "source_csv_docs", "corpus_vocab_growth",
    "text_classifier_score", "text_classifier_confusion",
    "events_kmv_distinct", "events_kmv_union", "events_session_window",
    "events_ab_ttest", "events_user_overlap", "events_value_histogram",
    "events_lateness_profile", "events_cohort_ltv", "events_active_users",
    "events_interarrival_stats", "events_seasonality",
    "events_markov_transitions", "events_path_topk", "events_attribution",
    "events_anomaly_zscore",
    "ap08_net_effect_compaction", "ap09_reconciliation",
    "a12_incremental_rollup", "r15_variant_extract",
    "dedup_prefix_containment", "dedup_winnowing_pairs",
    "dedup_precision_minhash", "dedup_recall_minhash",
    "dedup_incremental", "dedup_corpus_keep", "sem_dedup",
    "text_winnowing_overlap", "text_hapax_ratio", "text_bm25_rank",
    "dsir_resample", "dsir_importance",
    "corpus_simpson_diversity", "corpus_token_budget",
    "corpus_filter_funnel", "corpus_funnel_counts",
    "corpus_divergence_chi2", "llm_curation_e2e",
    "slice_length_quantiles", "sample_fixed_n",
    "emb_centroid_shift", "emb_dim_stats",
    "mm_integrity_check", "source_jsonl_docs",
]


def test_driver_sample_window_is_the_curated_fifty():
    assert list(QUERIES)[:50] == R5_WINDOW
