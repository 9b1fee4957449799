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
# Round 13 rotates to the 50-id r8-evidence tail named in VERDICT r12
# "Next round" #1 — the §2 row-transform/stateful/CDC-source heart
# (rowops r01-r15, sorts s01-s05, stateful st01-st07, cf02-cf06,
# j06-j08, the CDC source/sink ids, classic dedup/recall, events_hll_*,
# graph_pagerank_dist, the two sampling ids) — last driver-sampled in
# r8. The tail alone fills 50; any operator registered new this round
# displaces an r8 id (non-strict oldest-tail ratchet: max(in)=8 ==
# min(out)=8), because a query registered mid-round MUST be staged in
# DRIVER_WINDOW or it stays never-sampled
# (tests/test_registry_window.py fails loudly). Zero overlap with the
# r12 sample by construction.
WINDOW_STAGED_FOR = 13

# Exact 50-id window (exact match, not prefix — prefix staging risked
# a new id silently colliding into the window, e.g. sample_fixed_n /
# sample_fixed_n_by_lang share a prefix).
DRIVER_WINDOW = [
    # ---- the r13 driver window ----
    # the round's new operators (first driver evidence for each); each
    # displaced one same-round r8-evidence EXTENSION id to the tail
    # (displaced: events_hll_union, events_pagerank,
    # sample_fixed_n_by_lang — all covered by tests/test_oracle_parity
    # locally, none §2-core, legal under the non-strict ratchet)
    "sem_dedup_incremental", "emb_ivf_resplit",
    "corpus_contamination_by_source",
    # the r8-evidence tail
    "cf02_sys_priority", "cf03_field_merge", "cf04_upd_vs_del",
    "cf05_policy_lookup", "cf06_pk_split",
    "dedup_ppjoin_exact", "dedup_recall_corpuswide",
    "events_hll_distinct",
    "graph_pagerank_dist",
    "j06_asof_join", "j07_range_join_bucketed", "j08_salted_skew_join",
    "r01_filter_pending", "r02_project_rename", "r03_case_flag",
    "r04_codemap_join", "r05_cast_date_ts", "r06_epoch_decode",
    "r07_decimal_decode", "r08_default_coalesce", "r09_sha256_hash",
    "r10_op_decode", "r11_pick_before_after", "r12_string_funcs",
    "r13_ts_convert", "r14_to_json_preview", "r15_variant_extract",
    "s01_order_by_seq", "s02_topn_desc", "s03_ring_buffer",
    "s04_union_merge_sort", "s05_first_nonpk",
    "sample_systematic_pps",
    "sink_cdc_append", "src_debezium_parse", "src_jdbc_lookup",
    "src_jdbc_snapshot", "src_kafka_cdc", "src_point_lookup",
    "src_schema_drift",
    "st01_loop_dedup", "st02_state_upsert", "st03_state_ttl",
    "st04_microbatch_trigger", "st05_late_and_order",
    "st06_quarantine", "st07_backpressure_cfg",
    # ---- 50-query driver window ends here ----
]

# Tail ordering behind the cutoff — staging order only, not evidence.
# Prefix match, first hit wins; unmatched ids keep relative order at
# the end. Next in line for r13: the 50-id r8-evidence tail (rowops
# r01-r14, sorts s01-s05, stateful st01-st08, cdc sources, the
# classic dedup family) — recompute exactly from CORRECTNESS_r*.json
# before staging.
_PRIORITY_PREFIXES = [
    "a0", "a1", "ap0", "ap1", "bench_q1", "bench_q2",
    "cf0", "j0",
    "corpus_", "sample_", "emb_", "events_", "text_",
    "dedup_", "dup_", "bench_",
    "graph_pagerank", "mm_", "pii_", "doc_", "seq_pack",
    "pack_padding", "train_order", "sim_", "ann_recall",
    "source_",
    "st0",
    "sink_", "pipeline_",
    "retrieval_", "slice_",
    "sem_", "llm_", "dsir_",
    "plan_", "clf_", "gopher_", "bpe_", "dq_", "maint_",
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
