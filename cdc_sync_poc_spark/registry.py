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
# query eventually carries fresh driver evidence. Round 5 executes
# VERDICT r4 "Next round" #3: retire the never-driver-sampled backlog.
# 55 registered queries had no driver row after r4 (all r4-session
# additions); the 50-slot window takes 50 of them — including every
# query whose module changed THIS round (text_lm_score, events_rfm,
# retrieval_rrf, source_csv_docs, corpus_vocab_growth) — and the 5
# left out are pure metering/diagnostic queries (dedup_cluster_stats,
# dedup_rate_by_source, text_langid_eval, text_cms_error,
# ap07_scd2_history), staged first for r6 per the verdict's
# "prioritize operators over metering" tie-break. Everything with a
# driver row keeps rotating behind the cutoff (still covered by the
# local exact gate every session). Prefix match, first hit wins;
# unmatched ids keep relative order at the end.
_PRIORITY_PREFIXES = [
    # ---- the r5 driver window: 50 never-sampled queries ----
    # changed-this-round first (histcut rewrite + lazy-count fix get
    # fresh evidence on exactly the code that moved)
    "text_lm_score", "events_rfm", "retrieval_rrf_fusion", "source_csv",
    "corpus_vocab",
    # classifier + events additions
    "text_classifier",  # 2: score + confusion
    "events_kmv",  # 2: distinct + union
    "events_session_window", "events_ab_ttest", "events_user_overlap",
    "events_value_histogram", "events_lateness", "events_cohort_ltv",
    "events_active_users", "events_interarrival", "events_seasonality",
    "events_markov", "events_path", "events_attribution",
    "events_anomaly",
    # apply/rowops/aggregate additions
    "ap08", "ap09", "a12", "r15",
    # dedup family additions (incl. the banding precision/recall
    # meters — they validate the LSH knobs, worth driver evidence)
    "dedup_prefix", "dedup_winnowing", "dedup_precision",
    "dedup_recall", "dedup_incremental", "dedup_corpus",
    "sem_dedup",
    # text/corpus quality + selection family
    "text_winnowing", "text_hapax", "text_bm25",
    "dsir_resample", "dsir_importance",
    "corpus_simpson", "corpus_token_budget", "corpus_filter",
    "corpus_funnel", "corpus_divergence", "llm_curation",
    "slice_length_quantiles",  # exact: slice_length_mad is an r5-new
    # op that must not displace a staged never-sampled query
    # sampling / embeddings / multimodal / sources
    "sample_fixed_n", "emb_centroid", "emb_dim_stats",
    "mm_integrity", "source_jsonl",
    # ---- 50-query driver window ends here ----
    # first in line for r6: the 5 metering/diagnostic queries squeezed
    # out of the r5 window (locally exact-gated every session), then
    # every r5-session addition (never driver-sampled yet)
    "dedup_cluster_stats", "dedup_rate_by_source", "text_langid_eval",
    "text_cms", "ap07",
    "bpe_", "dedup_line_global", "text_gopher", "gopher_rate",
    "maint_zorder",
    "j09", "mm_dedup_phash", "emb_index_growth",
    "sim_ivfpq_residual", "emb_pq_residual", "emb_covariance",
    "corpus_shard_manifest", "events_decayed", "slice_length_mad",
    "st08", "ap10", "clf_calibration", "a13",
    "events_view_click", "dq_constraint", "dq_profile",
    "retrieval_hard_negatives",
    "maint_partition",
    # then everything already carrying a driver row, newest-evidence
    # last (r4-green first would be wasteful; keep stable order)
    "seq_pack", "doc_length", "dedup_segment", "text_gini", "emb_pq",
    "sim_", "ann_recall",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram", "dedup_embedding", "dedup_normalized",
    "dedup_minhash_cluster",
    "mm_attach", "mm_decode", "mm_frame", "mm_resize",
    "ap01", "ap02", "ap03", "ap04", "ap05",
    "text_tfidf", "text_top_terms", "events_sessionize",
    "j01", "j02", "j03", "j04",
    "src_", "sink_",
    "a01", "a02", "a03", "pipeline_", "a04", "s03",
    "bench_q2_", "bench_q20", "bench_q16", "bench_q17", "bench_q18",
    "pii_", "doc_chunk", "j05", "j06", "j07", "j08",
    "text_rarity", "emb_label", "dup_ngram",
    "st01", "ap06", "dedup_span",
    "text_oov", "text_lexical", "text_repetition", "corpus_",
    "sample_", "emb_", "events_", "text_", "s04",
    "r0", "r1", "s0", "st0", "cf0",
    "a0", "a1", "bench_", "plan_",
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
