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
# query eventually carries fresh driver evidence. Round 4 front-loads,
# per VERDICT r3 "Next round" #3:
#   (a) seq_packing — the one red r3 row (oracle ::BIGINT cast applied);
#   (b) doc_length_quantiles — the only query never in any sample;
#   (c) every module changed THIS round: joins.py (j04 un-broadcast →
#       all j*), cdc/envelope.py (classified_view un-broadcast → all
#       src_*/sink_* plus its consumers a01-a04, s03/s04, ap05,
#       pipeline_e2e), llm/similarity.py (sim_ivf Lloyd fusion +
#       ann_recall_ivf → all sim_*/ann_recall_*), llm/preprocess.py
#       (pii_redact/doc_chunking ride along);
#   (d) queries whose module changed AFTER their last green row:
#       mm_* (r1, multimodal touched), ap01-ap04 (r1, apply touched),
#       text_tfidf/text_top_terms/events_sessionize (r1, text_stats
#       touched), dedup_{exact,minhash_lsh,simhash,ngram,embedding,
#       normalized} (r2, dedup/curation touched).
# Everything with a green row at-or-after its module's last change
# rotates behind the cutoff (still covered by the local exact gate).
# Prefix match, first hit wins; unmatched ids keep relative order at
# the end.
_PRIORITY_PREFIXES = [
    # (a) + (b), then the three round-4 additions (first-ever evidence
    # outranks refreshing riders: pii_redact/doc_chunking keep their
    # r3-green rows, j08 its r2 row — all still locally exact-gated)
    "seq_pack", "doc_length",
    "dedup_segment", "text_gini", "emb_pq",
    # (c) similarity.py: 5 sim_* + 2 ann_recall_* = 7
    "sim_", "ann_recall",
    # (d) dedup family changed after its r2 rows, plus minhash_cluster
    # whose shared _verify_jaccard was restructured this round: 7
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram", "dedup_embedding", "dedup_normalized",
    "dedup_minhash_cluster",
    # (d) multimodal (4 — explicit so the session's new mm_integrity
    # stays below the cutoff), apply r1 rows (4) + ap05
    "mm_attach", "mm_decode", "mm_frame", "mm_resize",
    "ap01", "ap02", "ap03", "ap04", "ap05",
    # (d) text_stats r1 rows: 3
    "text_tfidf", "text_top_terms", "events_sessionize",
    # (c) joins.py (j05-j08 displaced below the cutoff by the round-4
    # ops — their functions are untouched this round): 4
    "j01", "j02", "j03", "j04",
    # (c) envelope.py: 5 src_* + 3 sink_*
    "src_", "sink_",
    # (c) classified_view consumers (s03/s04/a04 displaced — the shared
    # helper is still checked four ways by a01-a03 + pipeline_e2e; the
    # session's new ops ann_recall_truncated + src_schema_drift took two
    # window slots, and first-ever evidence outranks refreshing riders)
    "a01", "a02", "a03", "pipeline_", "a04", "s03",
    # ---- 50-query driver window ends here ----
    # first in line for the r5 rotation: this session's new ops the
    # window could not fit (never driver-sampled; locally exact-gated)
    "text_classifier", "events_kmv", "events_session_window",
    "dedup_prefix", "events_ab_ttest", "ap08", "events_user_overlap",
    "corpus_simpson", "events_value_histogram", "events_lateness",
    "text_langid_eval", "emb_dim_stats", "events_cohort_ltv",
    "dedup_rate_by_source", "source_csv", "mm_integrity",
    "retrieval_", "a12", "events_active_users", "text_winnowing",
    "text_cms", "dsir_resample", "corpus_token_budget", "ap09",
    "dedup_winnowing", "r15", "dedup_precision", "events_rfm",
    "dedup_cluster_stats", "sample_fixed_n", "emb_centroid",
    "text_hapax", "events_interarrival", "corpus_vocab",
    "events_seasonality", "slice_length",
    # then the earlier round-4 ops in the same boat
    "text_lm_score", "text_bm25", "dsir_", "events_markov",
    "sem_dedup", "corpus_filter", "corpus_funnel", "llm_curation",
    "dedup_incremental", "events_path", "corpus_divergence",
    "dedup_recall", "events_attribution",
    "events_anomaly", "source_jsonl", "s04", "dedup_corpus", "ap07",
    "bench_q2_", "bench_q20", "bench_q16", "bench_q17", "bench_q18",
    "pii_", "doc_chunk", "j05", "j06", "j07", "j08",
    # preprocess remainder (r3-green, code untouched this round)
    "text_rarity", "emb_label", "dup_ngram",
    # r3-green, modules unchanged
    "st01", "ap06", "dedup_span",
    "text_oov", "text_lexical", "text_repetition", "corpus_",
    "sample_", "emb_", "events_", "text_",
    # r2-green, modules unchanged
    "r0", "r1", "s0", "st0", "cf0",
    # r1/r3-green relational + plan suite, unchanged
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
    import cdc_sync_poc_spark.operators.aggregates  # noqa: F401
    import cdc_sync_poc_spark.operators.anomaly  # noqa: F401
    import cdc_sync_poc_spark.operators.apply  # noqa: F401
    import cdc_sync_poc_spark.operators.bench_relational  # noqa: F401
    import cdc_sync_poc_spark.operators.conflict  # noqa: F401
    import cdc_sync_poc_spark.operators.events_analytics  # noqa: F401
    import cdc_sync_poc_spark.operators.joins  # noqa: F401
    import cdc_sync_poc_spark.operators.rowops  # noqa: F401
    import cdc_sync_poc_spark.operators.sketches  # noqa: F401
    import cdc_sync_poc_spark.operators.sorts  # noqa: F401
    import cdc_sync_poc_spark.operators.scd  # noqa: F401
    import cdc_sync_poc_spark.operators.stateful  # noqa: F401
    import cdc_sync_poc_spark.sources.csvsrc  # noqa: F401
    import cdc_sync_poc_spark.sources.jsonl  # noqa: F401

    ordered = sorted(QUERIES, key=lambda n: (_priority(n), 0))
    for d in (QUERIES, ORACLES):
        snapshot = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(snapshot)
