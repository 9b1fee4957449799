"""Hashed linear quality classifier — the fastText-style "model-based"
quality filter (Joulin et al. 2016; the CCNet/RefinedWeb keep/drop
classifier stage), expressed as pure JVM-side expressions:

* text_classifier_score: score every document with a linear classifier
  over hashing-trick unigram features (hash token -> one of CLF_DIM
  buckets; score = mean bucket weight). The weight table is DERIVED
  (md5 of the bucket index), not trained — this sandbox grades the
  Spark execution shape, and a trained model would ship exactly the
  same way: CLF_DIM fixed-point weights resolved per token by pure
  expression, no join, no UDF.
* text_classifier_confusion: the evaluation companion — confusion
  counts and rates of the classifier's keep/drop verdict against a
  weak reference label (``lang = 'en'``), the measure-before-trusting
  step every production quality filter gets.

Scale design (the 100 TB lens): scoring is map-only — one md5 per
token, one md5 per bucket index, a linear O(n_tokens) fold per row, no
shuffle at all; the plan is scan -> project -> (optional) small agg.
A real CLF_DIM ~ 2^20 weight vector would broadcast as a literal array
(~8 MB) with identical shape. The fold accumulates BIGINT fixed-point
weights, so the distributed sum is exact; the single double division
(mean) happens once per document (the repo-wide fixed-point
convention — see llm/lm_quality.py).

Reference parity: the reference (KBroJ/cdc-sync-poc) has no quality
classifier; this is part of the M6 LLM-pipeline extension surface
(SURVEY.md §7.1 M6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.functions.histcut import hist_bucket_oracle_cte
from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table, spread_small_input

CLF_DIM = 256  # hashing-trick feature buckets (2^20 in production)
CLF_WSPAN = 2001  # derived integer weights in [-1000, 1000]
CLF_WOFF = (CLF_WSPAN - 1) // 2

# Per-token fixed-point weight, resolved by pure expression:
#   bucket  = (first 32 md5 bits of the token) mod CLF_DIM
#   weight  = (first 32 md5 bits of CAST(bucket AS STRING)) mod CLF_WSPAN
#             - CLF_WOFF
# Both engines render integers identically under CAST(... AS STRING),
# so the md5 inputs agree byte-for-byte (the dedup.py convention).
_SPARK_TOK_W = (
    f"CAST(conv(substr(md5(CAST("
    f"  CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT) % {CLF_DIM}"
    f" AS STRING)), 1, 8), 16, 10) AS BIGINT) % {CLF_WSPAN} - {CLF_WOFF}"
)
_DUCK_TOK_W = (
    f"('0x' || substr(md5(CAST("
    f"  ('0x' || substr(md5(t), 1, 8))::BIGINT % {CLF_DIM}"
    f" AS VARCHAR)), 1, 8))::BIGINT % {CLF_WSPAN} - {CLF_WOFF}"
)

_DUCK_SCORED = f"""
scored AS (
  SELECT doc_id, lang,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         list_sum(list_transform(string_split(text, ' '),
                                 t -> {_DUCK_TOK_W}))::BIGINT AS margin_fix
  FROM documents
)
"""


def scored_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, n_tokens, margin_fix) over any (doc_id, lang,
    text) frame: the map-only scoring pass. margin_fix is the exact
    BIGINT sum of per-token weights — the classifier margin before
    length normalization. Shared by the batch queries and the
    streaming calibration maintainer (streaming/clf_stats.py), so a
    document's score is bit-identical whether it arrived by stream or
    by backfill."""
    return docs.select("doc_id", "lang", "text").select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.expr(
            f"aggregate(transform(split(text, ' '), t -> {_SPARK_TOK_W}),"
            f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("margin_fix"),
    )


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scored_frame over the fixture documents table."""
    docs = load_table(spark, sf_dir, "documents")
    return scored_frame(spread_small_input(docs))


@register(
    "text_classifier_score",
    oracle=f"""
WITH {_DUCK_SCORED}
SELECT doc_id, n_tokens, margin_fix,
       round(CAST(margin_fix AS DOUBLE) / n_tokens / {CLF_WOFF}, 6) AS clf_score,
       CASE WHEN margin_fix >= 0 THEN 'keep' ELSE 'drop' END AS clf_label
FROM scored
""",
)
def text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the hashed linear classifier:
    clf_score = mean per-token bucket weight, normalized to [-1, 1];
    clf_label thresholds the raw margin at 0. Map-only plan — no
    shuffle, no UDF, O(n_tokens) per row."""
    return _scored(spark, sf_dir).select(
        "doc_id",
        "n_tokens",
        "margin_fix",
        F.round(
            F.col("margin_fix").cast("double") / F.col("n_tokens") / F.lit(CLF_WOFF),
            6,
        ).alias("clf_score"),
        F.when(F.col("margin_fix") >= 0, "keep").otherwise("drop").alias("clf_label"),
    )


@register(
    "text_classifier_confusion",
    oracle=f"""
WITH {_DUCK_SCORED}
SELECT CASE WHEN margin_fix >= 0 THEN 'keep' ELSE 'drop' END AS clf_label,
       CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS ref_label,
       count(*)::BIGINT AS n,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY
                 CASE WHEN margin_fix >= 0 THEN 'keep' ELSE 'drop' END), 6)
         AS frac_of_pred
FROM scored
GROUP BY 1, 2
""",
)
def text_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts of the classifier verdict against the weak
    reference label (lang = 'en'): n per (clf_label, ref_label) plus
    each cell's share of its predicted class (precision-style rate).
    One 4-group hash agg over the map-only scoring pass — the
    evaluation harness a production filter runs before being trusted
    with 100 TB of deletes."""
    from pyspark.sql import Window

    scored = _scored(spark, sf_dir).select(
        F.when(F.col("margin_fix") >= 0, "keep").otherwise("drop").alias("clf_label"),
        F.when(F.col("lang") == "en", "en").otherwise("other").alias("ref_label"),
    )
    counts = scored.groupBy("clf_label", "ref_label").agg(F.count("*").alias("n"))
    per_pred = Window.partitionBy("clf_label")
    return counts.select(
        "clf_label",
        "ref_label",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(per_pred), 6
        ).alias("frac_of_pred"),
    )


@register(
    "clf_calibration_by_length",
    oracle=f"""
WITH {_DUCK_SCORED},
cd AS (SELECT doc_id, n_tokens, margin_fix FROM scored),
edges AS ({{EDGES}})
SELECT e.len_decile, count(*)::BIGINT AS n_docs,
       sum(cd.margin_fix)::BIGINT AS margin_fix_sum,
       round(CAST(sum(cd.margin_fix) AS DOUBLE) / sum(cd.n_tokens)
             / {CLF_WOFF}, 6) AS pooled_score,
       round(CAST(count(*) FILTER (cd.margin_fix >= 0) AS DOUBLE)
             / count(*), 6) AS keep_rate
FROM cd JOIN edges e USING (n_tokens)
GROUP BY e.len_decile
""".replace(
        "{EDGES}",
        hist_bucket_oracle_cte(
            "cd", "n_tokens", 10, descending=False, out="len_decile"
        ),
    ),
)
def clf_calibration_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-score calibration across length deciles: pooled
    (token-weighted) score and keep-rate per document-length bucket —
    the confound check every quality filter needs before deployment (a
    classifier that mostly measures LENGTH will silently bias the kept
    corpus short or long; a flat keep_rate across deciles clears it).

    Composition evidence for the two primitives: buckets come from the
    value-domain histogram cut (functions/histcut.py) on the n_tokens
    domain, scores from the map-only hashed-classifier margin — exact
    BIGINT sums pooled per bucket, one double division per output row.
    No row-scale window, no UDF; the edge table broadcasts."""
    from cdc_sync_poc_spark.functions.histcut import hist_bucket_edges

    scored = _scored(spark, sf_dir).select("doc_id", "n_tokens", "margin_fix")
    edges = hist_bucket_edges(
        scored, "n_tokens", 10, descending=False, out="len_decile"
    )
    keep = F.count(F.when(F.col("margin_fix") >= 0, 1))
    return (
        scored.join(F.broadcast(edges), "n_tokens")
        .groupBy("len_decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("margin_fix").alias("margin_fix_sum"),
            F.round(
                F.sum("margin_fix").cast("double")
                / F.sum("n_tokens")
                / F.lit(CLF_WOFF),
                6,
            ).alias("pooled_score"),
            F.round(keep.cast("double") / F.count("*"), 6).alias("keep_rate"),
        )
    )
