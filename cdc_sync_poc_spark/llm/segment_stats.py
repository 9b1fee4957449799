"""Segment-level boilerplate detection and corpus concentration stats
(M6 extension) — the CCNet/RefinedWeb-style cleaning passes that run
between raw ingestion and dedup in a pre-training pipeline.

Boilerplate here uses fixed-width word segments as the repetition unit
(this corpus has no newlines; on a real web corpus the unit is the line
and the shape below is unchanged — swap the segmenter expression).

Concentration uses the Gini coefficient over term frequencies instead
of a Zipf log-log slope: the rank-weighted numerator and the n*total
denominator are exact BIGINT sums under any partitioning, and the ONE
double division at the end is correctly rounded everywhere — same
bit-exactness argument as the rational tf-idf in text_stats.py (libm
log() is not bit-identical across engines, so a slope fit would not
hash-match the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table, spread_small_input

SEG_WORDS = 8  # non-overlapping segment width (the "line" unit here)
BOILER_MIN_DOCS = 3  # a segment in >= this many distinct docs is boilerplate


@register(
    "dedup_segment_boilerplate",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
seg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) // {SEG_WORDS} + 1),
                i -> array_to_string(ws[(i-1)*{SEG_WORDS}+1:i*{SEG_WORDS}], ' ')))
           AS segment
  FROM w WHERE len(ws) >= {SEG_WORDS}
),
boiler AS (
  SELECT segment FROM seg
  GROUP BY segment HAVING count(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
)
SELECT s.doc_id,
       count(*)::BIGINT AS n_seg,
       count(b.segment)::BIGINT AS n_boiler,
       CAST(count(b.segment) AS DOUBLE) / count(*) AS boiler_frac
FROM seg s LEFT JOIN boiler b USING (segment)
GROUP BY s.doc_id
""",
)
def dedup_segment_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line/segment-level boilerplate detection (the CCNet/RefinedWeb
    cleaning pass): split each document into non-overlapping SEG_WORDS
    segments, count the distinct documents containing each segment
    corpus-wide, and report per document how much of it is boilerplate
    (segments shared by >= BOILER_MIN_DOCS docs — headers, footers,
    navigation chrome on a web corpus).

    Scale shape: segment fan-out is map-only; the distinct-doc count is
    one hash aggregate keyed by segment (map-side partial over
    (segment, doc) pairs); the boilerplate set is the repetition head
    of the corpus — orders of magnitude smaller than the segment table
    — so the back-join is left un-hinted for AQE to broadcast at
    runtime, and the final per-doc rollup re-aggregates on doc_id.
    Nothing is ever joined or grouped on a low-cardinality key."""
    docs = load_table(spark, sf_dir, "documents")
    return segment_boilerplate_frame(spread_small_input(docs))


def segment_boilerplate_frame(docs: DataFrame) -> DataFrame:
    """Core of dedup_segment_boilerplate over any (doc_id, text) frame
    (separated so property tests can drive it with arbitrary corpora)."""
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws")).filter(
        F.size("ws") >= SEG_WORDS
    )
    segs = F.expr(
        f"transform(sequence(1, size(ws) div {SEG_WORDS}),"
        f" i -> concat_ws(' ', slice(ws, (i-1)*{SEG_WORDS}+1, {SEG_WORDS})))"
    )
    seg = base.select("doc_id", F.explode(segs).alias("segment"))
    boiler = (
        seg.groupBy("segment")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .select("segment", F.lit(1).alias("hit"))
    )
    return (
        seg.join(boiler, "segment", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_seg"),
            F.count("hit").alias("n_boiler"),
            (F.count("hit").cast("double") / F.count("*")).alias("boiler_frac"),
        )
    )


@register(
    "text_gini_concentration",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
),
tc AS (
  SELECT source, term, count(*)::BIGINT AS c
  FROM tok GROUP BY source, term
),
rk AS (
  SELECT source, c,
         row_number() OVER (PARTITION BY source ORDER BY c, term) AS rnk,
         count(*) OVER (PARTITION BY source) AS n
  FROM tc
)
SELECT source,
       count(*)::BIGINT AS n_terms,
       sum(c)::BIGINT AS total_tokens,
       CAST(sum((2 * rnk - n - 1) * c) AS DOUBLE)
         / (count(*) * sum(c)) AS gini
FROM rk
GROUP BY source
""",
)
def text_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary concentration per source as the Gini coefficient of
    term frequencies — the mixing-dashboard stat that flags a source
    whose token mass collapses onto few types (spammy/templated text)
    without the bit-instability of a log-log Zipf fit: the rank-weighted
    numerator sum((2*rank - n - 1) * count) and the n * total
    denominator are exact BIGINTs; only the final division is floating
    point.

    Scale shape: one hash agg to term counts (vocabulary-sized output),
    one per-source ranking window over vocabulary rows (bounded by
    vocabulary, not corpus), one per-source rollup. The corpus itself
    is touched once, map-side."""
    docs = load_table(spark, sf_dir, "documents")
    return gini_concentration_frame(spread_small_input(docs))


def gini_concentration_frame(docs: DataFrame) -> DataFrame:
    """Core of text_gini_concentration over any (source, text) frame
    (separated so property tests can drive it with arbitrary corpora)."""
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tc = tok.groupBy("source", "term").agg(F.count("*").alias("c"))
    w = Window.partitionBy("source").orderBy(F.asc("c"), F.asc("term"))
    wn = Window.partitionBy("source")
    rk = tc.select(
        "source",
        "c",
        F.row_number().over(w).alias("rnk"),
        F.count("*").over(wn).alias("n"),
    )
    return rk.groupBy("source").agg(
        F.count("*").alias("n_terms"),
        F.sum("c").alias("total_tokens"),
        (
            F.sum((2 * F.col("rnk") - F.col("n") - 1) * F.col("c")).cast("double")
            / (F.count("*") * F.sum("c"))
        ).alias("gini"),
    )
