"""Query registry — the driver contract surface.

Every operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string over the fixture views (``region nation customer
supplier part orders lineitem events documents embeddings``).

``__spark_entry__.queries()`` / ``oracle_sql()`` simply expose these
dicts. Column names are aliased identically on both sides because the
driver's compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is DuckDB SQL or None
    for non-SQL-expressible ops (driver then records a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver samples the FIRST 50 registered queries (dict insertion
# order) for its CORRECTNESS gate; the sample rotates per round so every
# query eventually carries fresh driver evidence.
#
# WINDOW_STAGED_FOR anchors the ratchet (VERDICT r10 "What's wrong" #1):
# the window below is staged FOR that driver round, so the ratchet tests
# compare it against CORRECTNESS_r{WINDOW_STAGED_FOR-1} (zero overlap)
# and compute staleness from evidence files with round <
# WINDOW_STAGED_FOR only — green at every lifecycle point, including
# after the driver writes this round's own evidence file.
#
# Round 12 rotates to the 47-id r7-evidence tail named in VERDICT r11
# "Next round" #1 (aggregate/apply/scd core a04-a13 + ap07/ap10, the
# TPC-H q1/q3/q5/q18 block, tokenizer bpe_* family, text quality core,
# dq/maintenance audits), filled to exactly 50 with the round's new
# operators — a query registered mid-round MUST be staged in
# DRIVER_WINDOW or it stays never-sampled
# (tests/test_registry_window.py fails loudly). Zero overlap with the
# r11 sample by construction.
WINDOW_STAGED_FOR = 12

# Exact 50-id window (exact match, not prefix — prefix staging risked
# a new id silently colliding into the window, e.g. sample_fixed_n /
# sample_fixed_n_by_lang share a prefix).
DRIVER_WINDOW = [
    # ---- the r12 driver window: the 47 r7-evidence ids ----
    "a04_max_last_ts", "a05_next_id", "a06_min_max_filtered",
    "a07_count_union", "a08_exists_count", "a09_percentiles",
    "a10_pivot_report", "a11_rollup_report", "a13_cube_report",
    "ap07_scd2_history", "ap10_pit_lookup",
    "bench_q1_pricing", "bench_q3_shipping", "bench_q5_local_supplier",
    "bench_q18_large_orders",
    "bpe_fertility_by_lang", "bpe_merge_steps", "bpe_tokenize_count",
    "cf01_lww", "j05_conflict_fullouter", "j09_bloom_prefilter_join",
    "clf_calibration_by_length",
    "corpus_shard_manifest",
    "dedup_cluster_stats", "dedup_line_global", "dedup_rate_by_source",
    "dq_constraint_report", "dq_profile_table",
    "emb_covariance_topk", "emb_index_growth",
    "events_decayed_engagement", "events_view_click_pairs",
    "gopher_rate_by_source",
    "maint_partition_stats", "maint_zorder_layout",
    "mm_dedup_phash",
    "plan_mapping_compile", "plan_mapping_roundtrip",
    "retrieval_hard_negatives", "slice_length_mad",
    "text_cms_error", "text_fingerprint", "text_gopher_rules",
    "text_langid", "text_langid_eval", "text_quality", "text_tokens",
    # fill block to exactly 50: the r12-new operators (first driver
    # evidence for each)
    "dedup_span_intervals", "corpus_decontam_incremental",
    "ann_recall_ivf_stream",
    # ---- 50-query driver window ends here ----
]

# Tail ordering behind the cutoff — staging order only, not evidence.
# Prefix match, first hit wins; unmatched ids keep relative order at
# the end. Next in line for r13: the 50-id r8-evidence tail (rowops
# r01-r14, sorts s01-s05, stateful st01-st08, cdc sources, the
# classic dedup family) — recompute exactly from CORRECTNESS_r*.json
# before staging.
_PRIORITY_PREFIXES = [
    "a0", "a1", "ap0", "bench_q1", "bench_q2",
    "cf0", "j0",
    "corpus_", "sample_", "emb_", "events_", "text_",
    "dedup_", "dup_", "bench_",
    "graph_pagerank", "mm_", "pii_", "doc_", "seq_pack",
    "pack_padding", "train_order", "sim_", "ann_recall",
    "source_",
    "r0", "r1", "s0",
    "st0",
    "src_", "sink_", "pipeline_",
    "retrieval_", "slice_",
    "sem_", "llm_", "dsir_",
]


def _priority(name: str) -> tuple[int, int]:
    if name in DRIVER_WINDOW:
        return (0, DRIVER_WINDOW.index(name))
    for i, p in enumerate(_PRIORITY_PREFIXES):
        if name.startswith(p):
            return (1, i)
    return (2, 0)


def load_all_queries() -> None:
    """Import every module that registers queries, then order the
    registry so the driver's 50-query sample covers the §2 core and
    everything changed this round (idempotent)."""
    import cdc_sync_poc_spark.cdc.envelope  # noqa: F401
    import cdc_sync_poc_spark.cdc.pipeline  # noqa: F401
    import cdc_sync_poc_spark.llm.classifier  # noqa: F401
    import cdc_sync_poc_spark.llm.cleaning  # noqa: F401
    import cdc_sync_poc_spark.llm.curation  # noqa: F401
    import cdc_sync_poc_spark.llm.dedup  # noqa: F401
    import cdc_sync_poc_spark.llm.hygiene  # noqa: F401
    import cdc_sync_poc_spark.llm.lm_quality  # noqa: F401
    import cdc_sync_poc_spark.llm.multimodal  # noqa: F401
    import cdc_sync_poc_spark.llm.preprocess  # noqa: F401
    import cdc_sync_poc_spark.llm.retrieval  # noqa: F401
    import cdc_sync_poc_spark.llm.segment_stats  # noqa: F401
    import cdc_sync_poc_spark.llm.similarity  # noqa: F401
    import cdc_sync_poc_spark.llm.text  # noqa: F401
    import cdc_sync_poc_spark.llm.text_stats  # noqa: F401
    import cdc_sync_poc_spark.llm.tokenizer  # noqa: F401
    import cdc_sync_poc_spark.operators.aggregates  # noqa: F401
    import cdc_sync_poc_spark.operators.anomaly  # noqa: F401
    import cdc_sync_poc_spark.operators.apply  # noqa: F401
    import cdc_sync_poc_spark.operators.bench_relational  # noqa: F401
    import cdc_sync_poc_spark.operators.conflict  # noqa: F401
    import cdc_sync_poc_spark.operators.events_analytics  # noqa: F401
    import cdc_sync_poc_spark.operators.graph  # noqa: F401
    import cdc_sync_poc_spark.operators.joins  # noqa: F401
    import cdc_sync_poc_spark.operators.quality  # noqa: F401
    import cdc_sync_poc_spark.operators.rowops  # noqa: F401
    import cdc_sync_poc_spark.operators.sketches  # noqa: F401
    import cdc_sync_poc_spark.operators.sorts  # noqa: F401
    import cdc_sync_poc_spark.operators.scd  # noqa: F401
    import cdc_sync_poc_spark.operators.stateful  # noqa: F401
    import cdc_sync_poc_spark.sources.csvsrc  # noqa: F401
    import cdc_sync_poc_spark.sources.jsonl  # noqa: F401
    import cdc_sync_poc_spark.sources.orcsrc  # noqa: F401
    import cdc_sync_poc_spark.sources.layout  # noqa: F401

    ordered = sorted(QUERIES, key=_priority)
    for d in (QUERIES, ORACLES):
        snapshot = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(snapshot)
