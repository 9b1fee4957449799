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
# query eventually carries fresh driver evidence. Round 8 executes
# VERDICT r7 "Next round" #1: bank FIRST driver evidence for the 7
# r7-new operators (staged at 51+ all of r7, green in the local gate),
# then refresh the STALEST remaining evidence — the r2-era core
# (rowops r01–r15, sorts s01–s05, stateful st01–st07, conflict
# cf02–cf06, joins j06–j08 = 35 ids; st08/cf01/j05 carry fresh r7
# rows and rotate behind) — and fill the last 8 slots with the oldest
# r3-evidence ids (src_* ×6, sink_cdc_append, sink_target_apply).
# Everything else keeps rotating behind the cutoff (still covered by
# the local exact gate every session), oldest evidence first in line
# for r9 (sink_audit_log leads). Prefix match, first hit wins;
# unmatched ids keep relative order at the end.
_PRIORITY_PREFIXES = [
    # ---- the r8 driver window ----
    # first-evidence: the 7 operators added in r7 + the r8-new
    # distributed PageRank (first evidence beats refreshing a stale-
    # but-green row, so it displaces sink_target_apply to r9)
    "events_hll", "sample_systematic", "events_pagerank",
    "sample_fixed_n_by_lang", "dedup_ppjoin", "dedup_recall_corpuswide",
    "graph_pagerank_dist",
    # 35 stalest (r2) core ids
    "r0", "r1",  # rowops r01..r15
    "s0",  # sorts s01..s05
    "st01", "st02", "st03", "st04", "st05", "st06", "st07",
    "cf02", "cf03", "cf04", "cf05", "cf06",
    "j06", "j07", "j08",
    # 7 oldest r3-evidence ids (sink_target_apply displaced to r9 by
    # graph_pagerank_dist above)
    "src_",  # kafka_cdc debezium_parse jdbc_snapshot jdbc_lookup
             # point_lookup schema_drift
    "sink_cdc_append",
    # ---- 50-query driver window ends here ----
    # next in line for r9: the remaining r3-evidence ids
    "sink_", "st08", "a01", "a02", "a03", "pipeline_",
    "j01", "j02", "j03", "j04",
    "ap01", "ap02", "ap03", "ap04", "ap05", "ap06",
    "mm_attach", "mm_decode", "mm_frame", "mm_resize",
    "pii_", "doc_chunk", "bench_q2_", "bench_q20",
    "bench_q16", "bench_q17",
    # then r4-evidence
    "seq_pack", "doc_length", "dedup_segment", "text_gini", "emb_pq",
    "sim_", "ann_recall",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram", "dedup_embedding", "dedup_normalized",
    "dedup_minhash_cluster", "dedup_span",
    "text_tfidf", "text_top_terms", "events_sessionize",
    "text_rarity", "emb_label", "dup_ngram",
    "text_oov", "text_lexical", "text_repetition",
    # freshest evidence (the r5/r6 driver window) rotates last
    "text_lm_score", "events_rfm", "retrieval_rrf_fusion",
    "source_csv", "corpus_vocab", "text_classifier", "events_kmv",
    "sem_dedup", "dsir_", "llm_curation", "sample_fixed_n",
    "mm_integrity", "source_jsonl", "slice_length_quantiles",
    "corpus_", "sample_", "emb_", "events_", "text_",
    "a12", "ap08", "ap09",
    "dedup_", "bench_",
]


def _priority(name: str) -> int:
    for i, p in enumerate(_PRIORITY_PREFIXES):
        if name.startswith(p):
            return i
    return len(_PRIORITY_PREFIXES)


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
    import cdc_sync_poc_spark.sources.layout  # noqa: F401

    ordered = sorted(QUERIES, key=lambda n: (_priority(n), 0))
    for d in (QUERIES, ORACLES):
        snapshot = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(snapshot)
