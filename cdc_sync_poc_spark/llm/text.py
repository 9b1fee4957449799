"""Text analysis operators for the LLM-data-pipeline extension
(SURVEY.md §7.1 M6): language-ID, quality scoring, token counting,
document fingerprinting — all pure Column expressions over the
``documents`` table (whole-stage codegen; no Python in the row path).

At 100 TB these are embarrassingly parallel map-only plans: no shuffle
at all except the final write; the text column is the only wide column
read (column pruning keeps scans narrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table

_STOPWORDS = ("the", "a", "of", "and")


@register(
    "text_langid",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
         (length(text) - length(replace(text, 'the', ''))) // 3 AS en_score,
         (length(text) - length(replace(text, 'er', ''))) // 2 AS de_score,
         (length(text) - length(replace(text, 'os', ''))) // 2 AS es_score
  FROM documents
)
SELECT doc_id, lang, en_score, de_score, es_score,
       CASE WHEN en_score >= de_score AND en_score >= es_score THEN 'en'
            WHEN de_score >= es_score THEN 'de' ELSE 'es' END AS predicted_lang
FROM scored
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-frequency language ID heuristic: count marker n-grams
    ('the'/'er'/'os') by length-difference after replace — a pure
    whole-stage-codegen expression, no tokenizer UDF — and argmax with a
    deterministic tiebreak (en > de > es)."""
    docs = load_table(spark, sf_dir, "documents")

    def ngram_count(g: str) -> F.Column:
        return F.expr(
            f"(length(text) - length(replace(text, '{g}', ''))) div {len(g)}"
        )

    en, de, es = ngram_count("the"), ngram_count("er"), ngram_count("os")
    return docs.select(
        "doc_id",
        "lang",
        en.alias("en_score"),
        de.alias("de_score"),
        es.alias("es_score"),
        F.when((en >= de) & (en >= es), "en")
        .when(de >= es, "de")
        .otherwise("es")
        .alias("predicted_lang"),
    )


@register(
    "text_quality",
    oracle=f"""
WITH w AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS words FROM documents
),
c AS (
  SELECT doc_id, n_chars, len(words) AS n_words,
         len(list_filter(words, x -> x IN {_STOPWORDS!r})) AS n_stop
  FROM w
)
SELECT doc_id, n_words::BIGINT AS n_words,
       CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio,
       round(0.5 * least(CAST(n_words AS DOUBLE) / 100, 1.0)
             + 0.5 * (1 - CAST(n_stop AS DOUBLE) / n_words), 6) AS quality_score
FROM c
""".replace("'the', 'a', 'of', 'and'", "'the', 'a', 'of', 'and'"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring from length / stopword ratios — the standard
    pretraining-corpus heuristics (length band + stopword density) as one
    map-only projection."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("long")
    stoplist = ", ".join(f"'{s}'" for s in _STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(text, ' '), x -> x IN ({stoplist})))"
    ).cast("long")
    ratio = n_stop.cast("double") / n_words
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        ratio.alias("stopword_ratio"),
        F.round(
            0.5 * F.least(n_words.cast("double") / 100, F.lit(1.0))
            + 0.5 * (1 - ratio),
            6,
        ).alias("quality_score"),
    )


@register(
    "text_tokens",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_regex_tokens,
       list_sum(list_transform(string_split(text, ' '), w -> (length(w) + 3) // 4))::BIGINT AS n_bpe4_tokens
FROM documents
""",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, regex word/punct tokens, and a
    BPE-ish bound (ceil(len/4) subwords per word) — the three standard
    corpus-size estimators, all JVM-side expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_ws_tokens"),
        F.expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
        .cast("long")
        .alias("n_regex_tokens"),
        F.expr(
            "aggregate(transform(split(text, ' '), w -> CAST((length(w) + 3) div 4 AS BIGINT)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("n_bpe4_tokens"),
    )


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint,
       len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct_words
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: hash of the sorted distinct-word set (a
    bag-of-words canonical form — robust to word order, the cheap
    near-dup prefilter); plus vocabulary size."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words)))).alias(
            "fingerprint"
        ),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct_words"),
    )


@register(
    "text_langid_eval",
    oracle="""
WITH scored AS (
  SELECT lang,
         (length(text) - length(replace(text, 'the', ''))) // 3 AS en_score,
         (length(text) - length(replace(text, 'er', ''))) // 2 AS de_score,
         (length(text) - length(replace(text, 'os', ''))) // 2 AS es_score
  FROM documents
),
pred AS (
  SELECT lang,
         CASE WHEN en_score >= de_score AND en_score >= es_score THEN 'en'
              WHEN de_score >= es_score THEN 'de' ELSE 'es' END AS predicted_lang
  FROM scored
)
SELECT lang, count(*)::BIGINT AS n,
       count(*) FILTER (predicted_lang = lang)::BIGINT AS n_correct,
       round(CAST(count(*) FILTER (predicted_lang = lang) AS DOUBLE)
             / count(*), 6) AS accuracy
FROM pred GROUP BY lang
""",
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID accuracy per TRUE language — the harness that keeps
    the text_langid heuristic honest (it can only emit en/de/es, so
    this table shows exactly which slices it fails: zh accuracy is 0
    by construction, the measured cost of a 3-marker model). One
    |langs|-group agg over the map-only scorer."""
    pred = text_langid(spark, sf_dir)
    correct = F.when(F.col("predicted_lang") == F.col("lang"), 1)
    return pred.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.count(correct).alias("n_correct"),
        F.round(F.count(correct).cast("double") / F.count("*"), 6).alias(
            "accuracy"
        ),
    )
