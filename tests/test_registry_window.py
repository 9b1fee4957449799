"""Driver-contract guard: the FIRST 50 registered queries are the
round's curated correctness-sample window (registry._PRIORITY_PREFIXES).
A new query whose name collides with an early prefix would silently
displace a staged never-sampled query — this pins the window so that
mistake fails loudly instead."""

from __future__ import annotations

from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

load_all_queries()

# the r9 window: first driver evidence for the six r9-new operators,
# then the 27 remaining r3-evidence ids (sink_target_apply — displaced
# from the r8 window — first), then the oldest r4-evidence ids filling
# to 50 (COVERAGE.md "Driver correctness-sample window")
R9_WINDOW = [
    'graph_pagerank_mass', 'sample_cluster_balanced', 'emb_proto_prune',
    'pack_padding_waste', 'train_order_shuffle', 'source_orc_docs',
    'sink_target_apply', 'sink_audit_log',
    'st08_quarantine_replay',
    'a01_global_counters', 'a02_group_by_topic',
    'a03_group_by_status', 'pipeline_e2e',
    'j01_broadcast_lookup', 'j02_merge_upsert_join',
    'j03_antijoin_seen', 'j04_target_exists',
    'ap01_merge_cdc', 'ap02_ins_to_upd',
    'ap03_notfound_log', 'ap04_delete_idempotent',
    'ap05_exactly_once_mark', 'ap06_sequential_replay',
    'mm_attach_meta', 'mm_decode_features',
    'mm_frame_sample', 'mm_resize',
    'pii_redact', 'doc_chunking',
    'bench_q2_mincost', 'bench_q20_dominant',
    'bench_q16_suppcnt', 'bench_q17_small_qty',
    'seq_packing', 'doc_length_quantiles',
    'dedup_segment_boilerplate', 'text_gini_concentration',
    'emb_pq_error', 'emb_pq_residual_error',
    'sim_topk_bruteforce', 'sim_ann_lsh',
    'sim_ann_topk_all', 'sim_ivf_topk',
    'sim_ivfpq_topk', 'sim_ivfpq_residual_topk',
    'ann_recall_lsh', 'ann_recall_ivf',
    'ann_recall_ivfpq', 'ann_recall_truncated',
    'dedup_exact',
]


def test_driver_sample_window_is_the_curated_fifty():
    assert list(QUERIES)[:50] == R9_WINDOW


def test_window_has_zero_overlap_with_r8_sample():
    """VERDICT r8 #1: overlap with the r08 driver sample must be 0."""
    import json
    import pathlib

    r8 = pathlib.Path(__file__).resolve().parents[1] / "CORRECTNESS_r08.json"
    sampled = set(json.loads(r8.read_text()))
    assert not set(R9_WINDOW) & sampled
