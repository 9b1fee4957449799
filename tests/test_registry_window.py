"""Driver-contract guard: the FIRST 50 registered queries are the
round's curated correctness-sample window (registry._PRIORITY_PREFIXES).
A new query whose name collides with an early prefix would silently
displace a staged never-sampled query — this pins the window so that
mistake fails loudly instead."""

from __future__ import annotations

from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

load_all_queries()

# the r7 window: the 30-query never-driver-sampled backlog
# (changed-code first) + the 20 stalest r1/r2-evidence ids
# (COVERAGE.md "Driver correctness-sample window")
R7_WINDOW = [
    'mm_dedup_phash', 'emb_covariance_topk',
    'maint_partition_stats', 'maint_zorder_layout',
    'dedup_cluster_stats', 'dedup_rate_by_source',
    'text_langid_eval', 'text_cms_error',
    'ap07_scd2_history', 'bpe_merge_steps',
    'bpe_tokenize_count', 'bpe_fertility_by_lang',
    'dedup_line_global', 'text_gopher_rules',
    'gopher_rate_by_source', 'j09_bloom_prefilter_join',
    'emb_index_growth', 'sim_ivfpq_residual_topk',
    'emb_pq_residual_error', 'corpus_shard_manifest',
    'events_decayed_engagement', 'slice_length_mad',
    'st08_quarantine_replay', 'ap10_pit_lookup',
    'clf_calibration_by_length', 'a13_cube_report',
    'events_view_click_pairs', 'dq_constraint_report',
    'dq_profile_table', 'retrieval_hard_negatives',
    'a04_max_last_ts', 'a05_next_id',
    'a06_min_max_filtered', 'a07_count_union',
    'a08_exists_count', 'a09_percentiles',
    'a10_pivot_report', 'a11_rollup_report',
    'bench_q18_large_orders', 'bench_q1_pricing',
    'bench_q3_shipping', 'bench_q5_local_supplier',
    'text_langid', 'text_quality',
    'text_tokens', 'text_fingerprint',
    'plan_mapping_compile', 'plan_mapping_roundtrip',
    'j05_conflict_fullouter', 'cf01_lww',
]


def test_driver_sample_window_is_the_curated_fifty():
    assert list(QUERIES)[:50] == R7_WINDOW
