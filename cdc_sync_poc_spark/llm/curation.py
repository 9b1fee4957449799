"""Corpus-curation operators (LLM-data-pipeline extension, round 2):
repetition-based quality filtering, deterministic stratified sampling,
normalization-then-dedup, corpus mixing weights, and embedding
quantization accounting — the steps between "raw crawl" and "training
mix" that SURVEY §7.1 M6's dedup/similarity family feeds into.

Scale design:

* text_repetition_filter — entirely map-side: every metric (top-bigram
  fraction, duplicate-trigram fraction) is an expression over the
  per-row words array; no explode, no shuffle, no Python. At 100 TB
  this runs at scan speed.
* sample_stratified — map-only Bernoulli keep decision from a
  deterministic md5-derived bucket (never rand(): retries and replays
  must sample identically); per-stratum rates are a broadcast-free
  literal CASE. Downsampling a 100 TB crawl is a pure scan.
* dedup_normalized — canonicalize (casefold / trim / whitespace
  collapse) BEFORE content hashing, then one shuffle on the hash:
  catches the near-misses exact dedup loses to formatting noise.
* corpus_mix_weights — two-level agg (per-source, then global) over
  integer token counts; the smoothed denominator folds a SORTED list so
  both engines sum in the same order (cross-partition double-sum order
  is otherwise nondeterministic).
* emb_quantize_error — map-only int8 quantization roundtrip per vector
  (scale = 127/max|v|), reporting the reconstruction error a retrieval
  pipeline would budget for.

All arithmetic follows the bit-exact cross-engine recipe: integer
counts, double division of exact integers, sequential folds, md5-hex
hashing parsed identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table, spread_small_input

# Gopher-style repetition cuts, tuned to the synthetic corpus (observed
# top-bigram fraction 0.01-0.17 median 0.03; duplicate-trigram fraction
# 0-0.07): production crawls use looser cuts (0.18 / 0.30, Rae et al.
# 2021 table A1); these split this corpus non-trivially.
TOP_BIGRAM_MAX = 0.05
DUP_TRIGRAM_MAX = 0.02

# per-lang keep rates, scaled to integer basis points (bucket < rate_bp
# out of 10000) so the keep decision compares integers, not floats
SAMPLE_RATES_BP = {"en": 2500, "zh": 5000, "de": 8000, "es": 8000, "fr": 8000}
SAMPLE_DEFAULT_BP = 10000


def _bg_sql(col: str) -> str:
    """Spark SQL: the word-bigram array of token-array column ``col``
    (shared by text_repetition_filter and the funnel so the two can
    never diverge on the same metric).

    Written as slice + zip_with, NOT transform(sequence, i ->
    element_at(col, i)...): the lambda form references ``col`` once
    PER ELEMENT, so when a consumer's filter is pushed into the scan
    and CollapseProject inlines ``col`` = split(text) into every
    reference, each bigram re-splits the document — O(words²) per row.
    The zip form references ``col`` a constant number of times, so the
    same inlining costs a handful of splits per row and the expression
    stays O(words) wherever the optimizer moves it (funnel_verdict_frame
    documents the pushdown; measured 8 s → sub-second on the
    llm_curation_e2e build at sf0.1). Requires size({col}) >= 2 —
    both consumers gate on >= 3."""
    return (
        f"zip_with(slice({col}, 1, size({col}) - 1),"
        f" slice({col}, 2, size({col}) - 1),"
        f" (x, y) -> concat_ws(' ', x, y))"
    )


def _tg_sql(col: str) -> str:
    """Spark SQL: the word-trigram array of token-array column ``col``
    (same constant-reference zip form as _bg_sql; requires
    size({col}) >= 3)."""
    return (
        f"zip_with(zip_with(slice({col}, 1, size({col}) - 2),"
        f" slice({col}, 2, size({col}) - 2),"
        f" (x, y) -> concat_ws(' ', x, y)),"
        f" slice({col}, 3, size({col}) - 2),"
        f" (xy, z) -> concat_ws(' ', xy, z))"
    )


def _max_run_expr(arr_sql: str) -> str:
    """Spark SQL: the count of the most frequent element of ``arr_sql``
    as a sort + ONE linear fold (longest run in the sorted array).
    Equals the declarative max-count-over-distinct form the oracles
    state, but higher-order array functions run interpreted (outside
    whole-stage codegen), so the O(distinct × n) distinct-then-filter
    form is a per-row hot spot the moment a consumer inlines it into a
    filter predicate — see funnel_verdict_frame."""
    return (
        f"aggregate(array_sort({arr_sql}),"
        " named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),"
        " (acc, x) -> named_struct("
        "   'prev', x,"
        "   'run', CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1 END,"
        "   'best', GREATEST(acc.best,"
        "     CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1 END)),"
        " acc -> acc.best)"
    )


@register(
    "text_repetition_filter",
    oracle=f"""
WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
b AS (
  SELECT doc_id, lang,
         list_transform(range(1, len(words)),
                        i -> concat(words[i], ' ', words[i+1])) AS bg,
         list_transform(range(1, len(words) - 1),
                        i -> concat(words[i], ' ', words[i+1], ' ', words[i+2])) AS tg
  FROM w WHERE len(words) >= 3
),
m AS (
  SELECT doc_id, lang,
         CAST(list_max(list_transform(list_distinct(bg),
              x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)
           / CAST(len(bg) AS DOUBLE) AS top_bigram_frac,
         1.0 - CAST(len(list_distinct(tg)) AS DOUBLE)
           / CAST(len(tg) AS DOUBLE) AS dup_trigram_frac
  FROM b
)
SELECT doc_id, lang,
       round(top_bigram_frac, 6) AS top_bigram_frac,
       round(dup_trigram_frac, 6) AS dup_trigram_frac,
       (top_bigram_frac < {TOP_BIGRAM_MAX}
        AND dup_trigram_frac < {DUP_TRIGRAM_MAX}) AS keep
FROM m
""",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (Gopher rules family): fraction
    of bigram mass held by the most frequent bigram + fraction of
    duplicated trigrams, with a keep verdict. Every metric is a pure
    array expression over the words column — map-only, no explode, no
    shuffle; the natural first pass over a raw crawl."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("w")
    ).filter(F.size("w") >= 3)
    withg = base.select(
        "doc_id",
        "lang",
        F.expr(_bg_sql("w")).alias("bg"),
        F.expr(_tg_sql("w")).alias("tg"),
    )
    top_bg = F.expr(_max_run_expr("bg"))
    top_frac = top_bg.cast("double") / F.size("bg").cast("double")
    dup_frac = F.lit(1.0) - (
        F.size(F.array_distinct(F.col("tg"))).cast("double")
        / F.size("tg").cast("double")
    )
    return withg.select(
        "doc_id",
        "lang",
        F.round(top_frac, 6).alias("top_bigram_frac"),
        F.round(dup_frac, 6).alias("dup_trigram_frac"),
        ((top_frac < TOP_BIGRAM_MAX) & (dup_frac < DUP_TRIGRAM_MAX)).alias("keep"),
    )


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {bp}" for lang, bp in sorted(SAMPLE_RATES_BP.items())
    )
    return f"CASE lang {whens} ELSE {SAMPLE_DEFAULT_BP} END"


@register(
    "sample_stratified",
    oracle=f"""
WITH s AS (
  SELECT doc_id, lang, source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 10000 AS bucket,
         {_rate_case_sql()} AS rate_bp
  FROM documents
)
SELECT doc_id, lang, source, bucket FROM s WHERE bucket < rate_bp
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: keep a row iff its
    md5-derived bucket (0..9999) falls under the stratum's rate in
    basis points — rebalancing an over-represented language the way a
    training-mix pipeline does. Deterministic by construction (never
    rand(): task retries, replays, and the oracle must all sample the
    same rows); map-only, integer comparisons, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 10000
    )
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(bp))
            for lang, bp in sorted(SAMPLE_RATES_BP.items())
        ],
        F.lit(SAMPLE_DEFAULT_BP),
    )
    return (
        docs.select("doc_id", "lang", "source", bucket.alias("bucket"), rate.alias("r"))
        .filter(F.col("bucket") < F.col("r"))
        .select("doc_id", "lang", "source", "bucket")
    )


@register(
    "dedup_normalized",
    oracle="""
WITH n AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS norm_hash
  FROM documents
)
SELECT norm_hash, min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies
FROM n GROUP BY norm_hash
""",
)
def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup AFTER canonicalization (casefold, trim, whitespace
    collapse): catches duplicates that differ only in formatting noise,
    which raw content hashing (dedup_exact) misses. Normalization is a
    map-side expression; then the same single hash-shuffle as exact
    dedup."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
    return (
        docs.select("doc_id", F.md5(norm).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


# Shared by corpus_mix_weights / corpus_token_budget: per-source token
# totals and the SORTED-fold sqrt denominator (a bare SUM over doubles
# is partition-order-dependent; folding a sorted list fixes the
# addition order on both engines).
_PER_SRC_CTE = """
per_src AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
  FROM documents GROUP BY source
)
"""
_SQRT_DENOM_SQL = "list_sum(list_sort(list(sqrt(CAST(n_tokens AS DOUBLE)))))"
_SQRT_DENOM_EXPR = (
    "aggregate(array_sort(collect_list(sqrt(CAST(n_tokens AS DOUBLE)))),"
    " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)


def _per_source_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_tokens): the Spark twin of _PER_SRC_CTE."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", F.size(F.split(F.col("text"), " ")).alias("nw"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nw").cast("bigint").alias("n_tokens"),
        )
    )


@register(
    "corpus_mix_weights",
    oracle="WITH "
    + _PER_SRC_CTE
    + f""",
tot AS (
  SELECT sum(n_tokens)::BIGINT AS tot_tokens,
         {_SQRT_DENOM_SQL} AS denom
  FROM per_src
)
SELECT p.source, p.n_docs, p.n_tokens,
       round(CAST(p.n_tokens AS DOUBLE) / CAST(t.tot_tokens AS DOUBLE), 6)
         AS weight_prop,
       round(sqrt(CAST(p.n_tokens AS DOUBLE)) / t.denom, 6) AS weight_sqrt
FROM per_src p, tot t
""",
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix weights per source: proportional-to-tokens and
    sqrt-smoothed (temperature-style upweighting of small sources).
    Token counts aggregate as exact integers; the smoothed denominator
    folds a SORTED list of per-source sqrt values so both engines add
    doubles in the same order (a bare SUM over doubles is
    partition-order-dependent). Two hash aggs + a broadcast of the
    1-row total — scan-bound at any corpus size."""
    per_src = _per_source_tokens(spark, sf_dir)
    tot = per_src.agg(
        F.sum("n_tokens").cast("bigint").alias("tot_tokens"),
        F.expr(_SQRT_DENOM_EXPR).alias("denom"),
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("tot_tokens").cast("double"), 6
        ).alias("weight_prop"),
        F.round(
            F.sqrt(F.col("n_tokens").cast("double")) / F.col("denom"), 6
        ).alias("weight_sqrt"),
    )


@register(
    "emb_quantize_error",
    oracle="""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v,
         127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
  FROM e
),
q AS (
  SELECT vec_id, scale,
         list_transform(v, x -> round(x * scale)) AS qv, v
  FROM s
)
SELECT vec_id, round(scale, 6) AS scale,
       round(sqrt(list_sum(list_transform(range(1, 65),
             i -> (v[i] - qv[i] / scale) * (v[i] - qv[i] / scale)))), 6)
         AS l2_err
FROM q
""",
)
def emb_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization roundtrip per embedding: scale =
    127/max|v|, quantize-dequantize, report the L2 reconstruction
    error — the accounting a retrieval pipeline does before swapping
    float vectors for int8 storage (4x smaller index). Map-only
    expressions; the actual int8 cast would live in the parquet writer
    schema."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    base = emb.select("vec_id", v.alias("v"))
    scale = F.lit(127.0) / F.expr("array_max(transform(v, x -> abs(x)))")
    s = base.select("vec_id", "v", scale.alias("scale"))
    q = s.select(
        "vec_id", "scale", "v",
        F.expr("transform(v, x -> round(x * scale))").alias("qv"),
    )
    err = F.sqrt(
        F.expr(
            "aggregate(zip_with(v, qv, (x, y) -> (x - y / scale) * (x - y / scale)),"
            " CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
        )
    )
    return q.select(
        "vec_id",
        F.round(F.col("scale"), 6).alias("scale"),
        F.round(err, 6).alias("l2_err"),
    )


@register(
    "corpus_train_split",
    oracle="""
WITH s AS (
  SELECT doc_id, lang, n_chars,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 100 AS bucket,
         len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
tagged AS (
  SELECT CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
         lang, n_chars, n_tokens
  FROM s
)
SELECT split, lang, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       sum(n_tokens)::BIGINT AS total_tokens
FROM tagged GROUP BY split, lang
""",
)
def corpus_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split (80/10/10) by md5 bucket of
    doc_id — the same replay-safe construction as sample_stratified
    (never rand(): retries, replays, and the oracle must all route the
    same document to the same split), reported as per-(split, lang)
    document/char/token totals. Map-only routing + one low-cardinality
    hash agg; at 100 TB the split column becomes a partition key so
    each training job reads only its slice."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            "lang",
            "n_chars",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


def _emb_norm_stats_oracle() -> str:
    from cdc_sync_poc_spark.llm.similarity import _FP_SCALE, _VEC_CTES

    return f"""
WITH {_VEC_CTES}
SELECT label, count(*)::BIGINT AS n_vectors,
       min(nrm) AS min_norm, max(nrm) AS max_norm,
       CAST(sum(CAST(floor(nrm * {_FP_SCALE}) AS BIGINT)) AS DOUBLE)
         / ({_FP_SCALE} * count(*)) AS mean_norm
FROM n GROUP BY label
"""


@register("emb_norm_stats", oracle=_emb_norm_stats_oracle())
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-norm distribution stats (count, min, max,
    mean) — the sanity pass a retrieval pipeline runs before indexing
    to catch collapsed or exploding vectors. min/max of doubles are
    exact under any aggregation order; the MEAN uses the same
    fixed-point BIGINT sum as the IVF Lloyd update (llm/similarity.py
    _FP_SCALE) so Spark's hash agg and DuckDB agree bitwise. One
    map-combined hash agg, map-only otherwise."""
    from cdc_sync_poc_spark.llm.similarity import _FP_SCALE, _normed

    n = _normed(spark, sf_dir)
    return n.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
        (
            F.sum(F.floor(F.col("nrm") * _FP_SCALE).cast("long")).cast("double")
            / (F.lit(_FP_SCALE) * F.count("*"))
        ).alias("mean_norm"),
    )


# corpus_filter_funnel stage cuts (first-match-wins attribution order).
# langid is deliberately NOT a funnel stage: the marker heuristic
# (text_langid) mislabels most of this synthetic corpus (its tokens are
# English-ish for every lang value), which would degenerate the funnel
# to a single stage. Production funnels insert it between length and
# repetition.
FUNNEL_MIN_WORDS = 20
FUNNEL_MIN_STOPWORD = 0.02

_FUNNEL_REASON_SQL = f"""
CASE WHEN n_words < {FUNNEL_MIN_WORDS} THEN 'too_short'
     WHEN top_bigram_frac >= {TOP_BIGRAM_MAX}
          OR dup_trigram_frac >= {DUP_TRIGRAM_MAX} THEN 'repetition'
     WHEN stopword_ratio < {FUNNEL_MIN_STOPWORD} THEN 'low_stopword'
     ELSE 'kept' END
"""

_FUNNEL_CTES = """
w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
m AS (
  SELECT doc_id, lang, len(words)::BIGINT AS n_words,
         CASE WHEN len(words) >= 3 THEN
           CAST(list_max(list_transform(list_distinct(
                  list_transform(range(1, len(words)),
                                 i -> concat(words[i], ' ', words[i+1]))),
                x -> len(list_filter(
                       list_transform(range(1, len(words)),
                                      i -> concat(words[i], ' ', words[i+1])),
                       y -> y = x)))) AS DOUBLE)
             / CAST(len(words) - 1 AS DOUBLE)
         END AS top_bigram_frac,
         CASE WHEN len(words) >= 3 THEN
           1.0 - CAST(len(list_distinct(
                   list_transform(range(1, len(words) - 1),
                     i -> concat(words[i], ' ', words[i+1], ' ', words[i+2]))))
                 AS DOUBLE)
             / CAST(len(words) - 2 AS DOUBLE)
         END AS dup_trigram_frac,
         CAST(len(list_filter(words, x -> x IN ('the', 'a', 'of', 'and')))
              AS DOUBLE) / len(words) AS stopword_ratio
  FROM w
)
"""


def _funnel_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_verdict_frame(load_table(spark, sf_dir, "documents"))


def funnel_verdict_frame(docs: DataFrame, keep_text: bool = False) -> DataFrame:
    """Per-document first-drop-reason verdict over any (doc_id, lang,
    text) frame — the shared core of corpus_filter_funnel /
    corpus_funnel_counts (separated so property tests can sweep gate
    boundaries). Entirely map-side (every metric is an array expression
    over the words column, the text_repetition_filter shape), so the
    funnel runs at scan speed. ``keep_text=True`` carries the text
    column through so downstream stages (llm_curation_e2e) can filter
    on the verdict INLINE, without rejoining the corpus to itself.

    The top-bigram count is a sort + one linear fold (longest run in
    the SORTED bigram array — the same integer as the declarative
    max-count-over-distinct form the oracle states, which is O(distinct
    × n) per document). The distinction matters because higher-order
    array functions run INTERPRETED (outside whole-stage codegen), and
    when a consumer filters on ``reason`` the whole metric expression
    is pushed into the scan predicate and re-evaluated per row — the
    quadratic form there cost ~150 s on sf0.1's single-split scan; the
    linear form is ~1 s. Same reason the input is spread: the predicate
    lands on the scan task(s), so scan parallelism bounds verdict
    parallelism (no-op on a real many-split lake)."""
    from cdc_sync_poc_spark.sources.loader import spread_small_input

    carry = ["text"] if keep_text else []
    base = spread_small_input(
        docs.select(
            "doc_id", "lang", F.split(F.col("text"), " ").alias("words"), *carry
        )
    )
    bg = _bg_sql("words")
    tg = _tg_sql("words")
    max_run = _max_run_expr(bg)
    m = base.select(
        "doc_id",
        "lang",
        *carry,
        F.size("words").cast("bigint").alias("n_words"),
        F.expr(
            f"CASE WHEN size(words) >= 3 THEN"
            f" CAST({max_run} AS DOUBLE)"
            f" / CAST(size(words) - 1 AS DOUBLE) END"
        ).alias("top_bigram_frac"),
        F.expr(
            f"CASE WHEN size(words) >= 3 THEN"
            f" 1.0D - CAST(size(array_distinct({tg})) AS DOUBLE)"
            f" / CAST(size(words) - 2 AS DOUBLE) END"
        ).alias("dup_trigram_frac"),
        F.expr(
            "CAST(size(filter(words, x -> x IN ('the', 'a', 'of', 'and')))"
            " AS DOUBLE) / size(words)"
        ).alias("stopword_ratio"),
    )
    return m.withColumn("reason", F.expr(_FUNNEL_REASON_SQL))


@register(
    "corpus_filter_funnel",
    oracle=f"""
WITH {_FUNNEL_CTES}
SELECT doc_id, lang, n_words,
       {_FUNNEL_REASON_SQL} AS reason,
       {_FUNNEL_REASON_SQL} = 'kept' AS kept
FROM m
""",
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb/FineWeb-style quality funnel: each document passes the
    length, repetition (Gopher cuts), and stopword-density gates in a
    fixed order; the FIRST failing gate is the document's recorded drop
    reason (so stage attrition is attributable, not overlapping).
    Map-only — the verdict is one CASE over array expressions; at
    100 TB the funnel is a single scan-speed pass whose output column
    set downstream stages filter on."""
    return _funnel_frame(spark, sf_dir).select(
        "doc_id",
        "lang",
        "n_words",
        "reason",
        (F.col("reason") == "kept").alias("kept"),
    )


@register(
    "corpus_funnel_counts",
    oracle=f"""
WITH {_FUNNEL_CTES},
r AS (SELECT {_FUNNEL_REASON_SQL} AS reason FROM m),
tot AS (SELECT count(*)::BIGINT AS n_total FROM r)
SELECT reason, count(*)::BIGINT AS n,
       round(CAST(count(*) AS DOUBLE) / n_total, 6) AS frac
FROM r CROSS JOIN tot
GROUP BY reason, n_total
""",
)
def corpus_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel attrition report: documents per first-drop reason and the
    corpus fraction each stage removes — the table a curation run
    publishes per snapshot. One map-side verdict pass + a reason-domain
    hash agg (≤4 groups) + a 1-row broadcast for the denominator."""
    r = _funnel_frame(spark, sf_dir).select("reason")
    tot = r.agg(F.count("*").alias("n_total"))
    return (
        r.crossJoin(F.broadcast(tot))
        .groupBy("reason", "n_total")
        .agg(F.count("*").alias("n"))
        .select(
            "reason",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_total"), 6).alias("frac"),
        )
    )


_E2E_ORACLE = f"""
WITH {_FUNNEL_CTES},
kept AS (SELECT doc_id FROM m WHERE {_FUNNEL_REASON_SQL} = 'kept'),
dd AS (
  SELECT d.doc_id, d.lang, d.text,
         row_number() OVER (PARTITION BY md5(d.text)
                            ORDER BY d.doc_id) AS rn
  FROM documents d JOIN kept USING (doc_id)
),
uniq AS (SELECT doc_id, lang, text FROM dd WHERE rn = 1),
samp AS (
  SELECT doc_id, lang, text FROM uniq
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
          % 10000 < {{rate_case}}
),
toks AS (
  SELECT doc_id, lang,
         len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM samp
),
packed AS (
  SELECT doc_id, lang, n_tokens,
         COALESCE(sum(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM toks
)
SELECT doc_id, lang, n_tokens,
       (prev // {{pack_budget}})::BIGINT AS bin_id,
       (prev % {{pack_budget}})::BIGINT AS bin_offset
FROM packed
"""


def _e2e_oracle() -> str:
    from cdc_sync_poc_spark.llm.preprocess import PACK_BUDGET

    return _E2E_ORACLE.format(
        rate_case=f"({_rate_case_sql()})", pack_budget=PACK_BUDGET
    )


@register("llm_curation_e2e", oracle=_e2e_oracle())
def llm_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline in one lineage — quality funnel →
    exact content dedup (lowest-id survivor) → deterministic stratified
    downsampling → contiguous sequence packing — emitting the
    training-ready (doc, bin, offset) layout. This is the LLM-side twin
    of the CDC pipeline_e2e: the stages are the already-verified
    operators composed by Catalyst into a single plan, proving they
    chain (no materialization boundaries between stages).

    Scale shape: funnel + sampling are map-side predicates that fuse
    into the scan; dedup is one shuffle on the content hash; packing is
    the two-level prefix sum (local cumsum + broadcast carry) — so the
    whole pipeline is two shuffles (content hash, pack chunks) plus one
    broadcast, end to end, at any corpus size."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    kept = (
        funnel_verdict_frame(docs, keep_text=True)
        .filter(F.col("reason") == "kept")
        .select("doc_id", "lang", "text")
    )
    wdd = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    uniq = (
        kept.withColumn("rn", F.row_number().over(wdd))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "text")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 10000
    )
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(bp))
            for lang, bp in sorted(SAMPLE_RATES_BP.items())
        ],
        F.lit(SAMPLE_DEFAULT_BP),
    )
    # The packer consumes its input twice (local cumsum + the
    # chunk-carry aggregation); without a persist the whole funnel +
    # dedup + sample subtree would be recomputed for each branch. The
    # survivor frame is the DEDUPLICATED SAMPLED corpus — in production
    # it is exactly the frame a pipeline writes to storage between
    # stages anyway, so caching it here mirrors the real checkpoint.
    # Only the 3-column (doc_id, lang, n_tokens) projection persists
    # (r8): packing never reads text again, so checkpointing the text
    # column was pure cache weight — tokenize before the persist.
    samp = uniq.filter(bucket < rate).select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    ).persist()
    from cdc_sync_poc_spark.llm.preprocess import (
        _bins_from_prev,
        packing_prev_from_tokens,
    )

    return _bins_from_prev(packing_prev_from_tokens(samp))


EMB_STAT_FIX = 1 << 20  # per-dimension moment fixed point
_EMB_STAT_FIX2 = EMB_STAT_FIX * EMB_STAT_FIX


@register(
    "emb_dim_stats",
    oracle=f"""
WITH q AS (
  SELECT t.dim::BIGINT AS dim,
         floor(embedding[t.dim]::DOUBLE * {EMB_STAT_FIX})::BIGINT AS qx
  FROM embeddings, range(1, 65) t(dim)
),
agg AS (
  SELECT dim, count(*)::BIGINT AS n, sum(qx)::BIGINT AS s1,
         sum(qx * qx)::BIGINT AS s2,
         min(qx)::BIGINT AS qmin, max(qx)::BIGINT AS qmax
  FROM q GROUP BY dim
)
SELECT dim, n,
       round(CAST(s1 AS DOUBLE) / {EMB_STAT_FIX} / n, 6) AS mean,
       round((CAST(s2 AS DOUBLE) / {_EMB_STAT_FIX2}
              - (CAST(s1 AS DOUBLE) / {EMB_STAT_FIX})
                * (CAST(s1 AS DOUBLE) / {EMB_STAT_FIX}) / n) / (n - 1), 6)
         AS variance,
       round(CAST(qmin AS DOUBLE) / {EMB_STAT_FIX}, 6) AS min_x,
       round(CAST(qmax AS DOUBLE) / {EMB_STAT_FIX}, 6) AS max_x
FROM agg
""",
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding moments (mean/variance/min/max over the
    corpus for each of the 64 dims) — the calibration table behind
    scalar quantization, PQ codebook init, and whitening: dimensions
    with degenerate variance get fewer bits or get dropped.

    posexplode fans each vector to (dim, x) map-side; values are
    floored to EMB_STAT_FIX fixed point (multiply by a power of two is
    EXACT on doubles, so both engines floor the same number) and the
    64-group agg folds exact BIGINTs with map-side combine — partials
    are 64 rows per task regardless of corpus size. The s2 sums grow as
    n * x^2 * 2^40: BIGINT holds ~1e9 unit-scale vectors per dimension;
    beyond that the same plan runs with DECIMAL(38) sums."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        F.posexplode(F.col("embedding")).alias("pos", "x")
    ).select(
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.floor(F.col("x").cast("double") * EMB_STAT_FIX).cast("bigint").alias("qx"),
    )
    agg = q.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("qx").alias("s1"),
        F.sum(F.col("qx") * F.col("qx")).alias("s2"),
        F.min("qx").alias("qmin"),
        F.max("qx").alias("qmax"),
    )
    s1d = F.col("s1").cast("double")
    return agg.select(
        "dim",
        "n",
        F.round(s1d / EMB_STAT_FIX / F.col("n"), 6).alias("mean"),
        F.round(
            # NULL on a single-vector corpus (n-1 = 0), matching the
            # oracle's division-by-zero NULL instead of an ANSI crash
            F.when(
                F.col("n") > 1,
                (
                    F.col("s2").cast("double") / _EMB_STAT_FIX2
                    - (s1d / EMB_STAT_FIX) * (s1d / EMB_STAT_FIX) / F.col("n")
                )
                / (F.col("n") - 1),
            ),
            6,
        ).alias("variance"),
        F.round(F.col("qmin").cast("double") / EMB_STAT_FIX, 6).alias("min_x"),
        F.round(F.col("qmax").cast("double") / EMB_STAT_FIX, 6).alias("max_x"),
    )


TOKEN_BUDGET = 100_000  # planning budget for corpus_token_budget


@register(
    "corpus_token_budget",
    oracle="WITH "
    + _PER_SRC_CTE
    + f""",
tot AS (
  SELECT {_SQRT_DENOM_SQL} AS denom
  FROM per_src
),
plan AS (
  SELECT p.source, p.n_tokens,
         floor({TOKEN_BUDGET} * sqrt(CAST(p.n_tokens AS DOUBLE)) / t.denom)
           ::BIGINT AS quota
  FROM per_src p, tot t
)
SELECT source, n_tokens, quota,
       least(quota, n_tokens) AS alloc,
       round(CAST(quota AS DOUBLE) / n_tokens, 6) AS repeat_factor
FROM plan
""",
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation plan: distribute TOKEN_BUDGET across
    sources by the sqrt-smoothed mix (corpus_mix_weights' temperature
    weighting turned into concrete per-source quotas) — the planning
    table a data-mixing run executes. ``alloc`` caps each quota at the
    tokens actually available; ``repeat_factor`` > 1 exposes sources
    the mix would need to up-sample (epoch > 1), the early warning for
    small-source exhaustion. Same sorted-fold denominator trick as
    corpus_mix_weights (cross-partition double-sum order is otherwise
    nondeterministic); everything else is one hash agg + a broadcast
    1-row total."""
    per_src = _per_source_tokens(spark, sf_dir).drop("n_docs")
    tot = per_src.agg(F.expr(_SQRT_DENOM_EXPR).alias("denom"))
    plan = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.floor(
            F.lit(TOKEN_BUDGET)
            * F.sqrt(F.col("n_tokens").cast("double"))
            / F.col("denom")
        )
        .cast("bigint")
        .alias("quota"),
    )
    return plan.select(
        "source",
        "n_tokens",
        "quota",
        F.least("quota", "n_tokens").alias("alloc"),
        F.round(F.col("quota").cast("double") / F.col("n_tokens"), 6).alias(
            "repeat_factor"
        ),
    )


SAMPLE_FIXED_N = 100


@register(
    "sample_fixed_n",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS hk,
         row_number() OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
  FROM documents
)
SELECT doc_id, lang, source, sample_rank::BIGINT AS sample_rank
FROM ranked WHERE sample_rank <= {SAMPLE_FIXED_N}
""",
)
def sample_fixed_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N deterministic sample: rank every document by its md5
    draw and keep the first SAMPLE_FIXED_N — the "give me exactly 10k
    docs, reproducibly, from any machine" primitive that rate-based
    sampling (sample_stratified's keep-if-hash-below-rate) cannot
    provide, since rates only hit N in expectation.

    Scale: orderBy(hash).limit(N) plans as TakeOrderedAndProject — K
    rows per partition to the driver, no global sort at any corpus
    size; the rank is then assigned on the N-row result. The hash
    order also makes the sample STABLE under corpus growth: adding
    documents only ever displaces the highest-ranked members (the
    bottom-k property the KMV sketch relies on)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    hk = F.md5(F.col("doc_id").cast("string"))
    top = (
        docs.select("doc_id", "lang", "source", hk.alias("hk"))
        .orderBy("hk", "doc_id")
        .limit(SAMPLE_FIXED_N)
    )
    w = Window.orderBy("hk", "doc_id")  # N-row frame: single task fine
    return top.withColumn(
        "sample_rank", F.row_number().over(w).cast("bigint")
    ).select("doc_id", "lang", "source", "sample_rank")


COV_FIX = 1 << 14  # emb_covariance_topk per-coordinate fixed point
_COV_FIX2 = COV_FIX * COV_FIX
COV_TOP = 20  # reported strongest off-diagonal pairs


@register(
    "emb_covariance_topk",
    oracle=f"""
WITH fp AS (
  SELECT list_transform(embedding,
                        x -> CAST(floor(x::DOUBLE * {COV_FIX}) AS BIGINT)) AS f
  FROM embeddings
),
pr AS (
  SELECT i.i::BIGINT AS i, j.j::BIGINT AS j, count(*)::BIGINT AS n,
         sum(f[i.i] * f[j.j])::BIGINT AS sp,
         sum(f[i.i])::BIGINT AS si, sum(f[j.j])::BIGINT AS sj
  FROM fp CROSS JOIN range(1, 65) i(i) CROSS JOIN range(1, 65) j(j)
  WHERE j.j > i.i
  GROUP BY 1, 2
),
cov AS (
  SELECT i, j,
         (CAST(sp AS DOUBLE) / {_COV_FIX2}
          - (CAST(si AS DOUBLE) / {COV_FIX})
            * (CAST(sj AS DOUBLE) / {COV_FIX}) / n) / (n - 1) AS c
  FROM pr WHERE n > 1
)
SELECT i, j, round(c, 9) AS covariance
FROM cov
ORDER BY abs(c) DESC, i, j
LIMIT {COV_TOP}
""",
)
def emb_covariance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongest cross-dimension covariances of the embedding corpus —
    the correlation monitor behind whitening and PQ subspace layout
    (PQ assumes subspaces are roughly independent; a pair of
    dimensions with large |covariance| that PQ splits across subspaces
    is exactly where ADC error concentrates; read next to
    emb_dim_stats, the per-dimension marginal moments).

    Exactness: coordinates are floored to COV_FIX fixed point, so each
    pairwise product is a BIGINT and the distributed sums are
    order-independent — one double expression at the end, identical on
    both engines. Headroom: |product| <= 2^28, so BIGINT sums hold
    ~3e10 vectors; beyond that the same plan runs with DECIMAL(38)
    sums (the emb_dim_stats note). Scale shape: the d^2/2 pair fan-out
    is map-side (inherent to any covariance computation) and the agg
    output is a fixed 2016 cells with map-side combine — partials per
    task are design-bounded, never corpus-bounded; the final top-K is
    TakeOrderedAndProject over 2016 rows.

    Plan: the pair fan-out is a broadcast CROSS JOIN against the tiny
    (i, j) pair table — each output row computes ONE element_at
    product inside whole-stage codegen, feeding the hash agg's
    map-side combine directly. The explode/flatten form is measurably
    pathological here: Catalyst's project-collapse inlines the
    array-building expression INTO the generator, re-evaluating the
    O(d^2) array once per OUTPUT row (O(d^4) per vector — 22 s vs
    ~1 s at sf0.1). The per-dimension sums (si, sj, n) ride the SAME
    (i, j) aggregation pass — the oracle's `pr` CTE shape: summing
    element_at(f, i) within the (i, j) group IS the per-dimension sum,
    because every group sees every row exactly once (r14, guide §2.4:
    the earlier separate `dims` aggregate was two extra full scans of
    the embedding table feeding two broadcast builds — 3 scans and 10
    jobs where one scan suffices). Nothing is collected, an empty
    table flows through as empty with no special case."""
    emb = load_table(spark, sf_dir, "embeddings")
    spark_ = emb.sparkSession
    fp_expr = (
        f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * {COV_FIX}) AS BIGINT))"
    )
    # the single-row-group fixture scan would serialize the d^2/2
    # product fan-out into one task — spread it (no-op on a real lake)
    fp = spread_small_input(emb.select(F.expr(fp_expr).alias("f")))
    ii = spark_.range(1, 65).select(F.col("id").alias("i"))
    jj = spark_.range(1, 65).select(F.col("id").alias("j"))
    pairs = ii.crossJoin(jj).filter(F.col("j") > F.col("i"))
    fi = F.expr("element_at(f, CAST(i AS INT))")
    fj = F.expr("element_at(f, CAST(j AS INT))")
    agg = (
        fp.crossJoin(F.broadcast(pairs))
        .select("i", "j", (fi * fj).alias("p"), fi.alias("x_i"), fj.alias("x_j"))
        .groupBy("i", "j")
        .agg(
            F.sum("p").alias("sp"),
            F.sum("x_i").alias("si"),
            F.sum("x_j").alias("sj"),
            F.count("*").alias("n"),
        )
    )
    c = (
        F.col("sp").cast("double") / F.lit(_COV_FIX2)
        - (F.col("si").cast("double") / F.lit(COV_FIX))
        * (F.col("sj").cast("double") / F.lit(COV_FIX))
        / F.col("n")
    ) / (F.col("n") - 1)
    return (
        agg.filter(F.col("n") > 1)
        .withColumn("c", c)
        .orderBy(F.abs(F.col("c")).desc(), F.asc("i"), F.asc("j"))
        .limit(COV_TOP)
        .select("i", "j", F.round("c", 9).alias("covariance"))
    )


N_SHARDS = 16  # corpus_shard_manifest training-export shard count


@register(
    "corpus_shard_manifest",
    oracle=f"""
WITH s AS (
  SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % {N_SHARDS} AS shard,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         strlen(text)::BIGINT AS n_bytes
  FROM documents
),
per AS (
  SELECT shard, count(*)::BIGINT AS n_docs,
         sum(n_tokens)::BIGINT AS total_tokens,
         sum(n_bytes)::BIGINT AS total_bytes
  FROM s GROUP BY shard
),
tot AS (SELECT sum(n_docs)::BIGINT AS n FROM per)
SELECT shard, n_docs, total_tokens, total_bytes,
       round(CAST(n_docs AS DOUBLE) * {N_SHARDS} / n, 6) AS balance_ratio
FROM per CROSS JOIN tot
""",
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export shard manifest: every document routes to one of
    N_SHARDS shards by md5 bucket of doc_id (replay-safe, the
    corpus_train_split construction — a re-run or a resumed export
    routes every doc identically), and the manifest reports per-shard
    doc/token/byte totals plus the balance ratio (n_docs x S / total;
    1.0 = perfectly even). This is the global "shuffle" step of a
    training-data export WITHOUT a global sort: the shard column
    becomes the write partition key, readers stream shards
    independently, and the manifest is what the training job's data
    loader checks before an epoch.

    Map-only routing + an N_SHARDS-group hash agg + one broadcast
    1-row total — no sort, no window, no corpus-sized shuffle (the
    write itself shuffles on the shard key, which is the point: that
    IS the shuffle the export needs, done once)."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % N_SHARDS
    )
    per = (
        docs.select(
            shard.alias("shard"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )
    tot = per.agg(F.sum("n_docs").alias("n"))
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "total_tokens",
        "total_bytes",
        F.round(F.col("n_docs").cast("double") * N_SHARDS / F.col("n"), 6).alias(
            "balance_ratio"
        ),
    )


# Systematic probability-proportional-to-size sampling: PPS_K evenly
# spaced thresholds over the cumulative-weight axis; the document whose
# weight interval contains a threshold is drawn (large docs can win
# multiple draws — standard PPS-with-replacement multiplicity). All
# integer arithmetic: thresholds t_j = floor((2j+1) * W / (2K)), so
# both engines derive identical draws with zero float involvement —
# the same determinism discipline as sample_stratified (task retries,
# replays, and the oracle all draw the same rows).
PPS_K = 24
_PPS_CHUNK = 256  # docs per prefix-sum chunk (two-level cumsum)


@register(
    "sample_systematic_pps",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
         coalesce(sum(CAST(n_chars AS BIGINT)) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS cum_prev
  FROM documents
),
tot AS (SELECT sum(weight) AS w FROM d),
thr AS (
  SELECT j, ((2 * j + 1) * tot.w) // (2 * {PPS_K}) AS t
  FROM range(0, {PPS_K}) r(j) CROSS JOIN tot
)
SELECT thr.j AS draw_id, d.doc_id, d.lang, d.weight
FROM thr JOIN d
  ON thr.t >= d.cum_prev AND thr.t < d.cum_prev + d.weight
""",
)
def sample_systematic_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (PPS) sampling of PPS_K documents with inclusion
    probability proportional to n_chars — the curation move that
    samples by TOKEN mass, not document count, so a review set or
    eval slice represents the corpus the way training sees it.

    Scale shape: the cumulative weight is the seq_packing two-level
    prefix sum (local cumsum inside doc_id-range chunks + a broadcast
    chunk-carry frame ~{_PPS_CHUNK}x smaller than the data — no
    corpus-wide row window); the K thresholds are a broadcast
    {PPS_K}-row table range-joined against each doc's weight interval
    (a map-side nested-loop against K constants, never a shuffle).
    Reference parity: none (extension surface); batch twin of the
    bottom-N sampler family (sample_fixed_n)."""
    docs = load_table(spark, sf_dir, "documents")
    spark_ = docs.sparkSession
    d = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("weight"),
        F.expr(f"doc_id div {_PPS_CHUNK}").alias("ck"),
    )
    w_local = (
        Window.partitionBy("ck")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = d.withColumn(
        "local_prev", F.coalesce(F.sum("weight").over(w_local), F.lit(0))
    )
    w_carry = (
        Window.partitionBy()
        .orderBy("ck")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # over the chunk-totals frame only: n_docs / _PPS_CHUNK rows
    ck_totals = d.groupBy("ck").agg(F.sum("weight").alias("ck_tot"))
    carry = ck_totals.select(
        "ck",
        F.coalesce(F.sum("ck_tot").over(w_carry), F.lit(0)).alias("ck_off"),
    )
    cum = local.join(F.broadcast(carry), "ck").select(
        "doc_id",
        "lang",
        "weight",
        (F.col("ck_off") + F.col("local_prev")).alias("cum_prev"),
    )
    # grand total from the tiny chunk-totals frame — no third scan of
    # the documents table
    total = ck_totals.agg(F.sum("ck_tot").alias("w"))
    thr = (
        spark_.range(0, PPS_K)
        .select(F.col("id").alias("j"))
        .crossJoin(F.broadcast(total))
        .select(
            "j",
            F.expr(f"((2 * j + 1) * w) div (2 * {PPS_K})").alias("t"),
        )
    )
    return cum.join(
        F.broadcast(thr),
        (F.col("t") >= F.col("cum_prev"))
        & (F.col("t") < F.col("cum_prev") + F.col("weight")),
    ).select(F.col("j").alias("draw_id"), "doc_id", "lang", "weight")


# Per-stratum exactly-N sampling: the balanced-eval-slice primitive —
# "exactly K documents PER LANGUAGE, reproducibly" — that neither the
# global bottom-N (sample_fixed_n: head languages crowd out tail ones)
# nor rate-based stratified sampling (sample_stratified: K only in
# expectation) provides.
PER_LANG_N = 8
_PLN_SALTS = 16  # two-level top-k fan-out (the KMV _bottom_k pattern)


@register(
    "sample_fixed_n_by_lang",
    oracle=f"""
WITH h AS (
  SELECT doc_id, lang, source,
         md5(CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
),
r AS (
  SELECT doc_id, lang, source, hk,
         row_number() OVER (PARTITION BY lang
                            ORDER BY hk, doc_id) AS sample_rank
  FROM h
)
SELECT doc_id, lang, source, hk, sample_rank::BIGINT AS sample_rank
FROM r WHERE sample_rank <= {PER_LANG_N}
""",
)
def sample_fixed_n_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly PER_LANG_N documents per language by md5 draw — stable
    under corpus growth per stratum (the bottom-k property), and
    deterministic across retries/replays/engines.

    Scale shape: the salted two-level top-k (the KMV ``_bottom_k``
    pattern, operators/sketches.py): rank inside (lang, salt) first —
    parallel, at most PER_LANG_N rows out per salt bucket — then rank
    the PER_LANG_N x {_PLN_SALTS} survivors per language. No stage ever
    sorts a whole language's documents in one task, which the naive
    single window-per-lang form would (a head language holds most of a
    100 TB crawl). Salt is hash-derived (never rand(): retries must
    rank identical rows)."""
    docs = load_table(spark, sf_dir, "documents")
    hk = F.md5(F.col("doc_id").cast("string"))
    d = docs.select("doc_id", "lang", "source", hk.alias("hk")).withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(_PLN_SALTS))
    )
    w1 = Window.partitionBy("lang", "salt").orderBy("hk", "doc_id")
    local = (
        d.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= PER_LANG_N)
        .drop("salt", "rn")
    )
    w2 = Window.partitionBy("lang").orderBy("hk", "doc_id")
    return (
        local.withColumn(
            "sample_rank", F.row_number().over(w2).cast("bigint")
        )
        .filter(F.col("sample_rank") <= PER_LANG_N)
        .select("doc_id", "lang", "source", "hk", "sample_rank")
    )
