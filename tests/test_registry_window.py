"""Driver-contract guard: the FIRST 50 registered queries are the
round's curated correctness-sample window (registry._PRIORITY_PREFIXES).
A new query whose name collides with an early prefix would silently
displace a staged never-sampled query — this pins the window so that
mistake fails loudly instead."""

from __future__ import annotations

from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

load_all_queries()

# the r8 window: first driver evidence for the 7 r7-new operators and
# the r8-new graph_pagerank_dist, then the 35 stalest (r2-evidence)
# core ids, then the 7 oldest r3-evidence ids (COVERAGE.md "Driver
# correctness-sample window"; sink_target_apply displaced to r9)
R8_WINDOW = [
    'events_hll_distinct', 'events_hll_union',
    'sample_systematic_pps', 'events_pagerank',
    'sample_fixed_n_by_lang', 'dedup_ppjoin_exact',
    'dedup_recall_corpuswide', 'graph_pagerank_dist',
    'r01_filter_pending', 'r02_project_rename',
    'r03_case_flag', 'r04_codemap_join',
    'r05_cast_date_ts', 'r06_epoch_decode',
    'r07_decimal_decode', 'r08_default_coalesce',
    'r09_sha256_hash', 'r10_op_decode',
    'r11_pick_before_after', 'r12_string_funcs',
    'r13_ts_convert', 'r14_to_json_preview',
    'r15_variant_extract',
    's01_order_by_seq', 's02_topn_desc',
    's03_ring_buffer', 's04_union_merge_sort',
    's05_first_nonpk',
    'st01_loop_dedup', 'st02_state_upsert',
    'st03_state_ttl', 'st04_microbatch_trigger',
    'st05_late_and_order', 'st06_quarantine',
    'st07_backpressure_cfg',
    'cf02_sys_priority', 'cf03_field_merge',
    'cf04_upd_vs_del', 'cf05_policy_lookup',
    'cf06_pk_split',
    'j06_asof_join', 'j07_range_join_bucketed',
    'j08_salted_skew_join',
    'src_kafka_cdc', 'src_debezium_parse',
    'src_jdbc_snapshot', 'src_jdbc_lookup',
    'src_point_lookup', 'src_schema_drift',
    'sink_cdc_append',
]


def test_driver_sample_window_is_the_curated_fifty():
    assert list(QUERIES)[:50] == R8_WINDOW


def test_window_has_zero_overlap_with_r7_sample():
    """VERDICT r7 #1: overlap with the r07 driver sample must be 0."""
    import json
    import pathlib

    r7 = pathlib.Path(__file__).resolve().parents[1] / "CORRECTNESS_r07.json"
    sampled = set(json.loads(r7.read_text()))
    assert not set(R8_WINDOW) & sampled
