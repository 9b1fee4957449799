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
# query eventually carries fresh driver evidence. Round 9 executes
# VERDICT r8 "Next round" #1: first evidence for the r9-new
# dangling-mass PageRank, then retire the r3-evidence staleness tail —
# sink_target_apply (displaced from the r8 window) leads, followed by
# the rest of the r3 block (sinks, st08, a01–a03, pipeline_e2e,
# j01–j04, ap01–ap06, multimodal, PII, chunking, TPC-H reports) — and
# the window fills to 50 with the OLDEST r4-evidence ids (packing,
# doc-length, segment dedup, gini, PQ errors, the ANN top-k family +
# its recall audits, and dedup_exact); the six operators REGISTERED in
# round 9 lead the window so none stays never-sampled. After this
# round no
# registered query's latest driver evidence predates r4. Everything
# else keeps rotating behind the cutoff (still covered by the local
# exact gate every session). Prefix match, first hit wins; unmatched
# ids keep relative order at the end.
_PRIORITY_PREFIXES = [
    # ---- the r9 driver window ----
    # first-evidence: the six r9-new operators (dangling-mass PageRank,
    # cluster-balanced embedding sampler, prototypicality pruning,
    # padding-waste audit, epoch shuffle, ORC source) — a query
    # registered mid-round MUST be inserted here or it stays
    # never-sampled (test_units window invariant fails loudly)
    "graph_pagerank_mass", "sample_cluster_balanced", "emb_proto_prune",
    "pack_padding_waste", "train_order_shuffle", "source_orc_docs",
    # the 17 stalest (r3-evidence) CDC ids
    "sink_target_apply", "sink_audit_log", "st08",
    "a01", "a02", "a03", "pipeline_",
    "j01", "j02", "j03", "j04",
    "ap01", "ap02", "ap03", "ap04", "ap05", "ap06",
    # remaining r3-evidence: multimodal, PII, chunking, TPC-H reports
    "mm_attach", "mm_decode", "mm_frame", "mm_resize",
    "pii_", "doc_chunk",
    "bench_q2_", "bench_q20", "bench_q16", "bench_q17",
    # oldest r4-evidence ids fill the window to exactly 50
    "seq_pack", "doc_length", "dedup_segment", "text_gini",
    "emb_pq",      # emb_pq_error + emb_pq_residual_error
    "sim_",        # the 6 ANN top-k ids
    "ann_recall",  # the 4 recall audits
    "dedup_exact",
    # ---- 50-query driver window ends here ----
    # (dedup_minhash_lsh / dedup_simhash / dedup_ngram_jaccard — and
    # earlier dedup_normalized / dedup_embedding_cosine — displaced to
    # r10 by the six first-evidence ids: first evidence beats
    # refreshing a stale-but-green row)
    # next in line for r10: the remaining r4-evidence ids
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram",
    "dedup_embedding", "dedup_minhash_cluster", "dedup_span",
    "text_tfidf", "text_top_terms", "events_sessionize",
    "text_rarity", "emb_label", "dup_ngram",
    "text_oov", "text_lexical", "text_repetition",
    # then r5/r6 evidence
    "text_lm_score", "events_rfm", "retrieval_rrf_fusion",
    "source_csv", "corpus_vocab", "text_classifier", "events_kmv",
    "sem_dedup", "dsir_", "llm_curation", "sample_fixed_n",
    "mm_integrity", "source_jsonl", "slice_length_quantiles",
    # freshest (r7/r8 driver windows) rotates last; the generic family
    # prefixes intentionally catch the r8-window ids — position past
    # the cutoff is staging order, not evidence
    "corpus_", "sample_", "emb_", "events_", "text_",
    "a12", "ap08", "ap09",
    "dedup_", "bench_",
    "graph_pagerank_dist",
    "r0", "r1", "s0",
    "st0", "cf0", "j0", "src_", "sink_",
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
    import cdc_sync_poc_spark.sources.orcsrc  # noqa: F401
    import cdc_sync_poc_spark.sources.layout  # noqa: F401

    ordered = sorted(QUERIES, key=lambda n: (_priority(n), 0))
    for d in (QUERIES, ORACLES):
        snapshot = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(snapshot)
