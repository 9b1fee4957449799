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
# query eventually carries fresh driver evidence. Round 10 executes
# VERDICT r9 "Next round" #1: the window is the REAL staleness tail
# computed from CORRECTNESS_r*.json — the 33 ids whose newest driver
# row is r3 (TPC-H report block, events analytics, stratified sample,
# corpus mix/split/contamination, embedding quantize/norm/centroids,
# text ratio filters, span dedup, n-gram dup fraction), then the 9
# r4-evidence ids (the classic dedup family, sessionize, tf-idf tops),
# then any r10-new operators (a query registered mid-round MUST be
# inserted in the fill block or it stays never-sampled —
# tests/test_registry_window.py fails loudly), filled to exactly 50
# with the OLDEST r6-evidence ids. Zero overlap with the r09 sample.
# The staleness statement is GENERATED, not claimed: see
# tests/test_registry_window.py::test_window_covers_the_oldest_evidence,
# which recomputes latest-evidence-per-id from the CORRECTNESS files
# and asserts the window covers the oldest tail — so this comment can
# no longer drift from reality (VERDICT r9 "What's wrong" #1).
# Everything else keeps rotating behind the cutoff (still covered by
# the local exact gate every session). Prefix match, first hit wins;
# unmatched ids keep relative order at the end.
_PRIORITY_PREFIXES = [
    # ---- the r10 driver window ----
    # the 33 r3-evidence ids (oldest tail first: TPC-H reports)
    "bench_q4_", "bench_q6_", "bench_q7_", "bench_q8_", "bench_q9_",
    "bench_q10_", "bench_q11_", "bench_q12_", "bench_q13_",
    "bench_q14_", "bench_q15_", "bench_q19_", "bench_q21_",
    "bench_q22_",
    "events_window_agg", "events_funnel", "events_retention",
    "events_rolling_stats", "events_concurrency",
    "sample_stratified",
    "corpus_mix_weights", "corpus_train_split", "corpus_contamination",
    "emb_quantize_error", "emb_norm_stats", "emb_label_centroids",
    "text_oov_ratio", "text_lexical_concentration", "text_rarity_score",
    "text_repetition_filter", "text_cooccur_lift",
    "dedup_span_exact", "dup_ngram_fraction",
    # the 9 r4-evidence ids
    "dedup_normalized", "dedup_minhash_lsh", "dedup_minhash_cluster",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "events_sessionize", "text_tfidf_top_term", "text_top_terms",
    # fill block: the four r10-new operators first (a query registered
    # mid-round MUST be staged here or it stays never-sampled — the
    # generated window test fails loudly; an Avro source was also
    # probed and env-gated: no spark-avro connector jar in the sandbox,
    # see README "Environment gates"), then the oldest r6-evidence ids
    # to exactly 50
    "text_ngram_novelty", "dedup_minhash_estimate",
    "corpus_dedup_rate_by_source", "emb_hard_negatives",
    "dedup_lsh_curve",
    "text_lm_score", "events_rfm_segments", "retrieval_rrf_fusion",
    # ---- 50-query driver window ends here ----
    # next in line for r11: the remaining r6-evidence ids in their r6
    # sample order
    "source_csv_docs",
    "corpus_vocab_growth", "text_classifier_score",
    "text_classifier_confusion", "events_kmv_distinct",
    "events_kmv_union", "events_session_window", "events_ab_ttest",
    "events_user_overlap", "events_value_histogram",
    "events_lateness_profile", "events_cohort_ltv",
    "events_active_users", "events_interarrival_stats",
    "events_seasonality", "events_markov", "events_path_topk",
    "events_attribution", "events_anomaly",
    "ap08", "ap09", "a12",
    "dedup_prefix_containment", "dedup_winnowing_pairs",
    "dedup_precision_minhash", "dedup_recall_minhash",
    "dedup_incremental", "dedup_corpus_keep", "sem_dedup",
    "text_winnowing_overlap", "text_hapax_ratio", "text_bm25_rank",
    "dsir_", "corpus_simpson", "corpus_token_budget",
    "corpus_filter_funnel", "corpus_funnel_counts", "corpus_divergence",
    "llm_curation", "slice_length_quantiles", "sample_fixed_n",
    "emb_centroid_shift", "emb_dim_stats", "mm_integrity",
    "source_jsonl",
    # freshest (r7/r8/r9 driver windows) rotates last; the generic
    # family prefixes intentionally catch those ids — position past
    # the cutoff is staging order, not evidence
    "corpus_", "sample_", "emb_", "events_", "text_",
    "dedup_", "bench_",
    "graph_pagerank", "mm_", "pii_", "doc_", "seq_pack",
    "pack_padding", "train_order", "sim_", "ann_recall",
    "source_orc",
    "r0", "r1", "s0",
    "st0", "cf0", "j0", "ap0", "a0",
    "src_", "sink_", "pipeline_",
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
