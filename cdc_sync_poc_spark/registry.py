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

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# ---- plan memo (optimization round 14) -------------------------------
#
# Registered query builders are (spark, sf_dir) -> DataFrame, and for
# 250 of the 256 registered ids the builder is PURE PLAN ASSEMBLY: it
# fires zero Spark jobs and computes nothing from data — it only pays
# Python + py4j round trips to assemble the same logical plan every
# call (measured r14: ~50 s of construction across one pass of the 168
# benched queries, ~0.2-1.3 s each — comparable to the execution time
# at bench SF, and pure serial driver overhead at any scale). QUERIES
# therefore serves a per-(application, sf_dir) memo of the UNEXECUTED
# DataFrame handle — the prepared-statement pattern: the plan is built
# once per session, every action against it still executes against the
# parquet inputs. This is a plan cache, never a result cache; it is
# exactly the per-query memo pattern the lsh-curve/resplit plans
# already used, applied uniformly.
#
# PLAN_MEMO_EXCLUDE lists the builders whose CONSTRUCTION computes
# data (driver-side fixpoints/collects or eager materializations) —
# memoizing those would cache results across invocations, which the
# bench/driver contract forbids. Membership is measured, not guessed:
# a builder is excluded iff a warm re-construction still fires Spark
# jobs (tests/test_bench_contract.py pins the census).
#
# The raw (unmemoized) builder stays importable from its module —
# @register returns fn unchanged — so property tests that re-bind
# inputs via mock.patch keep exercising fresh plans.
PLAN_MEMO_EXCLUDE = {
    "dedup_minhash_cluster_incremental",  # driver union-find per call
    "emb_pq_error",        # eager codebook job at construction
    "emb_proto_prune",     # eager localCheckpoint of the scored frame
    "events_pagerank",     # driver-side power iteration per call
    "graph_pagerank_dist",  # eager count + iteration scaffolding
    "graph_pagerank_mass",  # eager count/dangling check per call
}

_PLAN_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is DuckDB SQL or None
    for non-SQL-expressible ops (driver then records a rows-only check).
    Pure-plan builders are served through the plan memo (above)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        if name in PLAN_MEMO_EXCLUDE:
            QUERIES[name] = fn
        else:

            @functools.wraps(fn)
            def memoized(spark: SparkSession, sf_dir: str) -> DataFrame:
                key = (spark.sparkContext.applicationId, sf_dir, name)
                df = _PLAN_MEMO.get(key)
                if df is None:
                    df = fn(spark, sf_dir)
                    _PLAN_MEMO[key] = df
                return df

            QUERIES[name] = memoized
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
# Round 14 rotates to the oldest staleness tail named in VERDICT r13
# "Next round" #2: the 3 r8 stragglers (events_hll_union,
# events_pagerank, sample_fixed_n_by_lang) + 44 of the 50 r9-evidence
# ids — the §2 join/agg/apply core (j01-j04, a01-a03, ap01-ap06,
# sink_target_apply, sink_audit_log, st08, pipeline_e2e) plus the
# classic dedup/similarity/multimodal/packing cohort. The tail is 53
# ids (> 50), so the non-strict oldest-tail ratchet (max(in)=9 ==
# min(out)=9) splits the r9 cohort: the 3 new r14 operators displace
# 6 r9 EXTENSION ids to the r15 tail (displaced: ann_recall_ivf,
# ann_recall_ivfpq, ann_recall_lsh, ann_recall_truncated,
# sim_ann_topk_all, sim_topk_bruteforce — all covered by
# tests/test_oracle_parity locally, none §2-core).
WINDOW_STAGED_FOR = 14

# Exact 50-id window (exact match, not prefix — prefix staging risked
# a new id silently colliding into the window, e.g. sample_fixed_n /
# sample_fixed_n_by_lang share a prefix).
DRIVER_WINDOW = [
    # ---- the r14 driver window ----
    # the round's new operators (first driver evidence for each)
    "sim_rerank_exact_topk", "emb_proto_prune_stream",
    "dedup_minhash_cluster_incremental",
    # the 3 r8-evidence stragglers
    "events_hll_union", "events_pagerank", "sample_fixed_n_by_lang",
    # the r9-evidence tail (44 of 50)
    "a01_global_counters", "a02_group_by_topic", "a03_group_by_status",
    "ap01_merge_cdc", "ap02_ins_to_upd", "ap03_notfound_log",
    "ap04_delete_idempotent", "ap05_exactly_once_mark",
    "ap06_sequential_replay",
    "bench_q2_mincost", "bench_q16_suppcnt", "bench_q17_small_qty",
    "bench_q20_dominant",
    "dedup_exact", "dedup_segment_boilerplate",
    "doc_chunking", "doc_length_quantiles",
    "emb_pq_error", "emb_pq_residual_error", "emb_proto_prune",
    "graph_pagerank_mass",
    "j01_broadcast_lookup", "j02_merge_upsert_join", "j03_antijoin_seen",
    "j04_target_exists",
    "mm_attach_meta", "mm_decode_features", "mm_frame_sample", "mm_resize",
    "pack_padding_waste", "pii_redact", "pipeline_e2e",
    "sample_cluster_balanced",
    "seq_packing",
    "sim_ann_lsh", "sim_ivf_topk", "sim_ivfpq_residual_topk",
    "sim_ivfpq_topk",
    "sink_audit_log", "sink_target_apply",
    "source_orc_docs", "st08_quarantine_replay",
    "text_gini_concentration", "train_order_shuffle",
    # ---- 50-query driver window ends here ----
]

# Tail ordering behind the cutoff — staging order only, not evidence.
# Prefix match, first hit wins; unmatched ids keep relative order at
# the end. Next in line for r15: the 6 ids displaced this round
# (ann_recall_*, sim_ann_topk_all, sim_topk_bruteforce) + the 50-id
# r10-evidence tail — recompute exactly from CORRECTNESS_r*.json
# before staging.
_PRIORITY_PREFIXES = [
    "a0", "a1", "ap0", "ap1", "bench_q1", "bench_q2",
    "cf0", "j0",
    "corpus_", "sample_", "emb_", "events_", "text_",
    "dedup_", "dup_", "bench_",
    "graph_pagerank", "mm_", "sim_", "ann_recall",
    "source_",
    "r0", "r1", "s0", "src_",
    "st0",
    "sink_",
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
