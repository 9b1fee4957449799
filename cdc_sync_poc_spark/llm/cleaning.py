"""Rule-based corpus cleaning (M6 extension): the Gopher quality-rule
bundle and C4-style corpus-wide line dedup — the two standard cleaning
passes (Rae et al. 2021 "Scaling Language Models" appendix A;
Raffel et al. 2020 C4 section 2.2) that run before model-based quality
scoring in a pre-training pipeline.

Both are pure DataFrame plans. The Gopher rules are one map-only
projection (no shuffle at any corpus size). Line dedup is the same
two-shuffle shape as dedup_segment_boilerplate: explode to the segment
unit, one hash agg to pick each segment's corpus-wide first occurrence,
an equi-join back on the segment key (reusing the agg's partitioning),
and one per-document agg to reassemble the surviving text.

This corpus has no newlines, so — exactly as dedup_segment_boilerplate
documents — the "line" unit is a fixed-width word segment; on a real
web corpus swap the segmenter expression for split(text, '\\n') and the
whole plan is unchanged. Unlike the boilerplate pass (which counts full
segments only), line dedup keeps the remainder tail as a final partial
segment so reassembly never truncates a document.

Determinism: every rule threshold compares BIGINT counts or a
correctly-rounded double ratio (single division, round(x, 6) on both
engines); the first-occurrence winner is min(doc_id * POS_ENC + pos),
pure BIGINT, order-independent under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.llm.segment_stats import SEG_WORDS
from cdc_sync_poc_spark.llm.text import _STOPWORDS
from cdc_sync_poc_spark.sources.loader import load_table, spread_small_input

# Gopher rule thresholds (Rae et al. 2021 appendix A, adapted to this
# fixture's 10-120-word documents: the word-count band is scaled down
# from Gopher's 50..100k so both outcomes occur in the test corpus; the
# other thresholds are Gopher's own).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_LEN_LO = 3.0
GOPHER_MEAN_LEN_HI = 10.0
GOPHER_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP = 2

# the "line" segment width — imported so the boilerplate pass and the
# line dedup stay on the same unit if it is ever retuned
LINE_WORDS = SEG_WORDS
POS_ENC = 1_000_000  # winner encoding: doc_id * POS_ENC + pos; holds
# for documents up to POS_ENC segments (= 8M words) — far beyond any
# real document; a longer one should be chunked upstream (doc_chunking).
# BIGINT headroom: doc_id may grow to ~9.2e12 before the product
# overflows — at 100 TB assign doc ids densely (or widen to DECIMAL).

_STOPLIST_SQL = ", ".join(f"'{s}'" for s in _STOPWORDS)


# Shared gopher-rule CTE: the per-doc flags as one SELECT over the
# split-words CTE — reused verbatim by the per-doc oracle and the
# per-source rate rollup so the rule SQL exists exactly once.
_GOPHER_CTE = f"""
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         len(ws)::BIGINT AS n_words,
         round(CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
               / len(ws), 6) AS mean_word_len,
         round(CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
                    AS DOUBLE) / len(ws), 6) AS alpha_frac,
         len(list_filter(ws, x -> x IN ({_STOPLIST_SQL})))::BIGINT AS n_stop,
         len(ws) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
           AS rule_word_count,
         round(CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
               / len(ws), 6) BETWEEN {GOPHER_MEAN_LEN_LO} AND {GOPHER_MEAN_LEN_HI}
           AS rule_mean_len,
         round(CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
                    AS DOUBLE) / len(ws), 6) >= {GOPHER_ALPHA_FRAC}
           AS rule_alpha,
         len(list_filter(ws, x -> x IN ({_STOPLIST_SQL}))) >= {GOPHER_MIN_STOP}
           AS rule_stopwords
  FROM w
)"""


@register(
    "text_gopher_rules",
    oracle=f"""
WITH {_GOPHER_CTE}
SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stop,
       rule_word_count, rule_mean_len, rule_alpha, rule_stopwords,
       rule_word_count AND rule_mean_len AND rule_alpha AND rule_stopwords
         AS gopher_pass
FROM g
""",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule bundle: per document, the standard repetition-
    free heuristic gates — word-count band, mean word length band,
    alphabetic-word fraction, minimum stopword count — each reported as
    its own flag (so downstream selection can ablate rules
    individually, the way the Gopher paper reports per-rule removal
    rates) plus the conjunction.

    One map-only projection over the documents scan: every rule is a
    higher-order-function fold on the split words array, evaluated
    JVM-side — zero shuffles, zero Python, scales embarrassingly. The
    two double ratios are single correctly-rounded divisions; all other
    comparisons are BIGINT."""
    return gopher_rules_frame(load_table(spark, sf_dir, "documents"))


def gopher_rules_frame(docs: DataFrame) -> DataFrame:
    """Core of text_gopher_rules over any (doc_id, text) frame."""
    ws = F.split(F.col("text"), " ")
    n_words = F.size(ws).cast("long")
    sum_len = F.expr("aggregate(split(text, ' '), 0L, (acc, x) -> acc + length(x))")
    mean_len = F.round(sum_len.cast("double") / n_words, 6)
    n_alpha = F.expr("size(filter(split(text, ' '), x -> x rlike '[a-z]'))").cast(
        "long"
    )
    alpha_frac = F.round(n_alpha.cast("double") / n_words, 6)
    n_stop = F.expr(
        f"size(filter(split(text, ' '), x -> x IN ({_STOPLIST_SQL})))"
    ).cast("long")
    rule_wc = n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    rule_ml = mean_len.between(GOPHER_MEAN_LEN_LO, GOPHER_MEAN_LEN_HI)
    rule_af = alpha_frac >= GOPHER_ALPHA_FRAC
    rule_st = n_stop >= GOPHER_MIN_STOP
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stop"),
        rule_wc.alias("rule_word_count"),
        rule_ml.alias("rule_mean_len"),
        rule_af.alias("rule_alpha"),
        rule_st.alias("rule_stopwords"),
        (rule_wc & rule_ml & rule_af & rule_st).alias("gopher_pass"),
    )


@register(
    "dedup_line_global",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
seg0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, (len(ws) + {LINE_WORDS} - 1) // {LINE_WORDS} + 1),
                i -> struct_pack(pos := i,
                                 seg := array_to_string(
                                   ws[(i-1)*{LINE_WORDS}+1:i*{LINE_WORDS}], ' '))))
           AS s
  FROM w
),
seg AS (SELECT doc_id, s.pos AS pos, s.seg AS segment FROM seg0),
win AS (
  SELECT segment, min(doc_id * {POS_ENC} + pos) AS w
  FROM seg GROUP BY segment
)
SELECT s.doc_id,
       count(*)::BIGINT AS n_seg,
       sum(CASE WHEN s.doc_id * {POS_ENC} + s.pos = w.w THEN 1 ELSE 0 END)::BIGINT
         AS n_kept,
       coalesce(string_agg(
         CASE WHEN s.doc_id * {POS_ENC} + s.pos = w.w THEN s.segment END,
         ' ' ORDER BY s.pos), '') AS text_kept
FROM seg s JOIN win w USING (segment)
GROUP BY s.doc_id
""",
)
def dedup_line_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide line dedup: every occurrence of a repeated
    line (here: LINE_WORDS-word segment, remainder tail included) is
    removed EXCEPT its first occurrence corpus-wide — first = smallest
    (doc_id, pos), encoded as one BIGINT min so the winner falls out of
    a hash aggregate, never a window. Documents are reassembled from
    their surviving segments in position order; a fully-deduped
    document stays in the output with empty text (so the caller decides
    the drop policy, matching C4's separate length filter).

    Plan: map-side explode -> hash agg on segment (winner) -> equi-join
    seg[segment] x win[segment] -> per-doc hash agg whose reassembly is
    array_sort over the ALREADY per-doc-collected kept segments (O(doc
    length log doc length) per row, no window, no global sort). The win
    side carries NO broadcast hint: at test SF Catalyst auto-broadcasts
    it from file-size stats (observed plan), while at corpus scale the
    distinct-segment table's size estimate forces a shuffle join that
    shares the winner agg's hash partitioning on segment — the decision
    stays with the optimizer, where it belongs. Both shuffle keys
    (segment, doc_id) hash uniformly at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return line_dedup_frame(spread_small_input(docs))


def line_segments(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, segment): LINE_WORDS-word segments with the
    remainder tail included — shared by the batch dedup and the
    streaming segment index (streaming/line_dedup.py), so a segment
    key is bit-identical on both paths."""
    return docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform("
                f"  sequence(1, cast(ceil(size(split(text, ' ')) / {LINE_WORDS}.0) as int)),"
                f"  i -> array_join(slice(split(text, ' '), (i-1)*{LINE_WORDS}+1, {LINE_WORDS}), ' '))"
            )
        ).alias("pos0", "segment"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "segment")


def reassemble_kept(seg_with_kept: DataFrame) -> DataFrame:
    """Per-doc rollup of a (doc_id, pos, segment, kept) frame: totals
    plus the surviving text in position order (array_sort over the
    already-collected per-doc rows — no window)."""
    kept_struct = F.when(F.col("kept"), F.struct("pos", "segment"))
    return seg_with_kept.groupBy("doc_id").agg(
        F.count("*").alias("n_seg"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s.segment
            ),
            " ",
        ).alias("text_kept"),
    )


def line_dedup_frame(docs: DataFrame) -> DataFrame:
    """Core of dedup_line_global over any (doc_id, text) frame.

    The corpus-wide winner is a min over the segment WINDOW on one
    explicit segment repartition (r15, guide §2.4): the old form
    aggregated winners separately and joined them back on segment —
    at bench SF that join broadcast a corpus-sized winner table (a §5
    hazard at scale) and at scale it re-exchanged the segment rows a
    second time. One exchange of segment rows total; the per-doc
    reassembly agg is the only other shuffle (A/B at sf0.1:
    0.72 -> 0.61 s, identical rows)."""
    seg = line_segments(docs)
    enc = F.col("doc_id") * POS_ENC + F.col("pos")
    w = Window.partitionBy("segment")
    marked = (
        seg.repartition("segment")
        .withColumn("kept", enc == F.min(enc).over(w))
    )
    return reassemble_kept(marked)


@register(
    "gopher_rate_by_source",
    oracle=f"""
WITH {_GOPHER_CTE}
SELECT d.source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN g.rule_word_count THEN 1 ELSE 0 END)::BIGINT AS n_word_count,
       sum(CASE WHEN g.rule_mean_len THEN 1 ELSE 0 END)::BIGINT AS n_mean_len,
       sum(CASE WHEN g.rule_alpha THEN 1 ELSE 0 END)::BIGINT AS n_alpha,
       sum(CASE WHEN g.rule_stopwords THEN 1 ELSE 0 END)::BIGINT AS n_stopwords,
       round(CAST(sum(CASE WHEN g.rule_word_count AND g.rule_mean_len
                            AND g.rule_alpha AND g.rule_stopwords
                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS pass_rate
FROM g JOIN documents d USING (doc_id)
GROUP BY d.source
""",
)
def gopher_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher scoreboard: how many documents each ingest
    source passes per rule, and its overall pass rate — the slice-level
    quality report a curation pipeline publishes every run (a source
    whose pass rate collapses is a crawler or parser regression, caught
    BEFORE the tokens reach training).

    One map-only rule projection (the same gopher_rules_frame columns)
    followed by one sources-sized hash agg — shuffle volume is
    #sources, never #documents. Per-rule counts stay BIGINT; the single
    double division happens once per source row."""
    docs = load_table(spark, sf_dir, "documents")
    g = gopher_rules_frame(docs).join(docs.select("doc_id", "source"), "doc_id")
    passes = (
        F.col("rule_word_count")
        & F.col("rule_mean_len")
        & F.col("rule_alpha")
        & F.col("rule_stopwords")
    )
    return g.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("rule_word_count").cast("long")).alias("n_word_count"),
        F.sum(F.col("rule_mean_len").cast("long")).alias("n_mean_len"),
        F.sum(F.col("rule_alpha").cast("long")).alias("n_alpha"),
        F.sum(F.col("rule_stopwords").cast("long")).alias("n_stopwords"),
        F.round(
            F.sum(passes.cast("long")).cast("double") / F.count("*"), 6
        ).alias("pass_rate"),
    )
