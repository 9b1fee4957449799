"""Corpus-level text statistics (M6 extension): tf-idf term ranking,
global top terms, and event sessionization — the analysis passes a
training-data pipeline runs after cleaning/dedup.

tf-idf uses the rational form tf * N / df (no logarithm): libm log()
implementations are not guaranteed bit-identical across engines, while
double multiply/divide are correctly rounded everywhere — so the ranking
is identical AND the scores hash-match the oracle. (ml.feature's
HashingTF/IDF would be the MLlib route; this stays in SQL for
verifiability and avoids fixed-dim hashing collisions entirely.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import literal_frame, load_table, spread_small_input

_TOK_CTES = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM tok GROUP BY doc_id, term
),
doclen AS (SELECT doc_id, count(*)::BIGINT AS n_terms FROM tok GROUP BY doc_id),
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
"""


@register(
    "text_tfidf_top_term",
    oracle=f"""
WITH {_TOK_CTES},
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE) * n.n_docs / (doclen.n_terms * df.df) AS tfidf
  FROM tf
  JOIN doclen ON tf.doc_id = doclen.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN n
)
SELECT doc_id, term AS top_term, round(tfidf, 9) AS tfidf
FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rn
  FROM scored)
WHERE rn = 1
""",
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most characteristic term per document by rational tf-idf
    (tf * N / (doc_len * df)): two hash aggregates (term frequencies,
    document frequencies) + a broadcast of the tiny df/N sides + one
    row_number window per doc. The df table is vocabulary-sized, so at
    100 TB it broadcasts while the tf side stays partitioned by doc."""
    docs = load_table(spark, sf_dir, "documents")
    tok = spread_small_input(docs).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    doclen = tok.groupBy("doc_id").agg(F.count("*").alias("n_terms"))
    df = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double")
                * F.col("n_docs")
                / (F.col("n_terms") * F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("tfidf", 9).alias("tfidf"))
    )


@register(
    "text_top_terms",
    oracle="""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
SELECT term, count(*)::BIGINT AS n
FROM tok GROUP BY term
ORDER BY n DESC, term LIMIT 20
""",
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 vocabulary terms — the corpus Zipf head. Hash
    aggregate with map-side combine then a 20-row TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    tok = spread_small_input(docs).select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    return (
        tok.groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


@register(
    "events_sessionize",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id, session_no::BIGINT AS session_no,
       count(*)::BIGINT AS n_events,
       (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS duration_s
FROM sessions GROUP BY user_id, session_no
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: the lag/cumsum
    island pattern (partitioned by user — embarrassingly parallel, no
    global order). The streaming twin is F.session_window with a
    watermark; the batch island form is the oracle-checkable ground
    truth for it."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_session = F.when(
        F.lag("ts").over(w).isNull() | ((us - F.lag(us).over(w)) > 1_800_000_000), 1
    ).otherwise(0)
    sessions = ev.withColumn("new_session", new_session).withColumn(
        "session_no",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.expr("(max(unix_micros(ts)) - min(unix_micros(ts))) div 1000000").alias(
            "duration_s"
        ),
    )


@register(
    "doc_length_quantiles",
    oracle="""
WITH hist AS (
  SELECT n_chars, count(*)::BIGINT AS c FROM documents GROUP BY n_chars
),
cum AS (
  SELECT n_chars,
         sum(c) OVER (ORDER BY n_chars
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS cum_c
  FROM hist
),
tot AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT q.q::BIGINT AS q, min(cum.n_chars)::BIGINT AS value
FROM (VALUES (25), (50), (75), (90), (99)) q(q), cum, tot
WHERE cum.cum_c * 100 >= q.q * tot.n
GROUP BY q.q
""",
)
def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus length quantiles via the value-domain histogram —
    the 100 TB quantile pattern (contrast a09_percentiles, which sorts
    inside each group). One hash agg collapses N documents to the
    distinct-length histogram (bounded by the length DOMAIN, ~hundreds
    of values, independent of corpus size); the cumulative sum then
    runs over that domain-sized table, so the unpartitioned window is
    O(domain) work on one task, never O(rows). Quantile selection is
    cross-multiplied BIGINT (cum*100 >= q*n) — no float rank
    arithmetic, bit-exact on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    hist = docs.groupBy("n_chars").agg(F.count("*").alias("c"))
    w = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select("n_chars", F.sum("c").over(w).alias("cum_c"))
    tot = docs.agg(F.count("*").alias("n"))
    qs = literal_frame(spark, [(25,), (50,), (75,), (90,), (99,)], "q long")
    return (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(qs))
        .filter(F.col("cum_c") * 100 >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(F.min("n_chars").alias("value"))
    )


COOC_WINDOW = 3  # text_cooccur_lift max token distance
COOC_TOP = 50  # text_cooccur_lift result size


@register(
    "text_cooccur_lift",
    oracle=f"""
WITH w AS (SELECT string_split(text, ' ') AS words FROM documents),
p AS (
  SELECT unnest(flatten(list_transform(range(1, len(words)), i ->
           list_transform(range(i + 1, least(i + {COOC_WINDOW}, len(words)) + 1),
             j -> array_to_string(list_sort([words[i], words[j]]), ' ')))))
         AS pair
  FROM w WHERE len(words) >= 2
),
pc AS (SELECT pair, count(*)::BIGINT AS c_ab FROM p GROUP BY pair),
u AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
uc AS (SELECT term, count(*)::BIGINT AS c FROM u GROUP BY term),
tot AS (SELECT count(*)::BIGINT AS n FROM u),
split AS (
  SELECT string_split(pair, ' ')[1] AS ta, string_split(pair, ' ')[2] AS tb,
         c_ab
  FROM pc
)
SELECT s.ta, s.tb, s.c_ab,
       round(CAST(s.c_ab AS DOUBLE) * CAST(t.n AS DOUBLE)
             / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 6) AS lift
FROM split s
JOIN uc ca ON ca.term = s.ta
JOIN uc cb ON cb.term = s.tb
CROSS JOIN tot t
ORDER BY lift DESC, s.ta, s.tb LIMIT {COOC_TOP}
""",
)
def text_cooccur_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-occurring term pairs by lift (observed pair frequency over
    the independence expectation — PMI without the logarithm, so
    bit-exact across engines: pure integer counts, one double
    multiply/divide chain in a fixed order). Pairs come from a
    COOC_WINDOW-token sliding window (linear O(n·w) fan-out, never the
    quadratic all-pairs-in-document form), normalized to sorted order
    so (a,b) and (b,a) pool. Two hash aggs (pair, term) + two joins of
    the pair table against the unigram counts + TakeOrderedAndProject
    for the top-COOC_TOP — no global sort. The unigram side broadcasts
    (vocabulary ≪ corpus; at web scale it is still only ~10^7 rows —
    the pair table, which is corpus-sized, is never broadcast)."""
    docs = load_table(spark, sf_dir, "documents")
    base = spread_small_input(
        docs.select(F.split(F.col("text"), " ").alias("w"))
    ).filter(F.size("w") >= 2)
    pair_expr = F.expr(
        f"flatten(transform(sequence(1, size(w) - 1), i ->"
        f" transform(sequence(i + 1, least(i + {COOC_WINDOW}, size(w))), j ->"
        f" array_join(array_sort(array(element_at(w, i), element_at(w, j))),"
        f" ' '))))"
    )
    pc = (
        base.select(F.explode(pair_expr).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("c_ab"))
        .select(
            F.split(F.col("pair"), " ").getItem(0).alias("ta"),
            F.split(F.col("pair"), " ").getItem(1).alias("tb"),
            "c_ab",
        )
    )
    toks = spread_small_input(docs.select("text")).select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    uc = toks.groupBy("term").agg(F.count("*").alias("c"))
    # n = sum of the unigram counts — a tiny reaggregation of uc, not a
    # third explode pass over the corpus (r14, guide §2.3); and the two
    # unigram joins broadcast the SAME unaliased uc subtree (renames
    # applied ABOVE the join), so the second build is a ReusedExchange
    # instead of a recompute
    tot = uc.agg(F.sum("c").alias("n"))
    u1 = uc.alias("u1")
    u2 = uc.alias("u2")
    lift = F.round(
        F.col("c_ab").cast("double")
        * F.col("n").cast("double")
        / (F.col("ca").cast("double") * F.col("cb").cast("double")),
        6,
    )
    return (
        pc.join(F.broadcast(u1), F.col("ta") == F.col("u1.term"))
        .join(F.broadcast(u2), F.col("tb") == F.col("u2.term"))
        .crossJoin(F.broadcast(tot))
        .select(
            "ta",
            "tb",
            "c_ab",
            F.col("u1.c").alias("ca"),
            F.col("u2.c").alias("cb"),
            "n",
        )
        .select("ta", "tb", "c_ab", lift.alias("lift"))
        .orderBy(F.desc("lift"), "ta", "tb")
        .limit(COOC_TOP)
    )


@register(
    "corpus_simpson_diversity",
    oracle="""
WITH tok AS (
  SELECT lang, source, unnest(string_split(text, ' ')) AS term
  FROM documents
),
ct AS (
  SELECT lang, source, term, count(*)::BIGINT AS c
  FROM tok GROUP BY lang, source, term
)
SELECT lang, source,
       sum(c)::BIGINT AS n_tokens,
       count(*)::BIGINT AS vocab,
       round(CAST(sum(c * c) AS DOUBLE) / sum(c) / sum(c), 6) AS simpson
FROM ct GROUP BY lang, source
""",
)
def corpus_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-slice lexical diversity: the Simpson concentration index
    sum(p_term^2) per (lang, source) — the collision probability of two
    random tokens, the diversity dial a data-mixing recipe monitors per
    slice (contrast text_lexical_concentration, which is per-document).

    Exactness without entropy's log: Simpson = sum(c^2) / n^2 is pure
    BIGINT arithmetic up to one final double division — no fixed-point
    scheme needed at all. Two hash aggs (term counts, then slice
    rollup), both map-side combined; no windows, no joins."""
    docs = load_table(spark, sf_dir, "documents")
    tok = spread_small_input(docs.select("lang", "source", "text")).select(
        "lang", "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    ct = tok.groupBy("lang", "source", "term").agg(F.count("*").alias("c"))
    return ct.groupBy("lang", "source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("vocab"),
        F.round(
            F.sum(F.col("c") * F.col("c")).cast("double")
            / F.sum("c")
            / F.sum("c"),
            6,
        ).alias("simpson"),
    )


@register(
    "text_hapax_ratio",
    oracle="""
WITH tok AS (
  SELECT lang, source, unnest(string_split(text, ' ')) AS term
  FROM documents
),
ct AS (
  SELECT lang, source, term, count(*)::BIGINT AS c
  FROM tok GROUP BY lang, source, term
)
SELECT lang, source,
       count(*)::BIGINT AS vocab,
       count(*) FILTER (c = 1)::BIGINT AS n_hapax,
       round(CAST(count(*) FILTER (c = 1) AS DOUBLE) / count(*), 6)
         AS hapax_ratio
FROM ct GROUP BY lang, source
""",
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena share per (lang, source): the fraction of each
    slice's vocabulary occurring exactly once — the Heaps-law
    vitality signal. Natural text keeps a large hapax share at any
    corpus size; templated or machine-generated feeds collapse toward
    zero, which makes this the cheap slice-level tripwire read next to
    corpus_simpson_diversity (token concentration) — hapax looks at
    the vocabulary's thin tail, Simpson at its heavy head. Two exact
    hash aggs, no windows, no joins."""
    docs = load_table(spark, sf_dir, "documents")
    tok = spread_small_input(docs.select("lang", "source", "text")).select(
        "lang", "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    ct = tok.groupBy("lang", "source", "term").agg(F.count("*").alias("c"))
    hapax = F.count(F.when(F.col("c") == 1, 1))
    return ct.groupBy("lang", "source").agg(
        F.count("*").alias("vocab"),
        hapax.alias("n_hapax"),
        F.round(hapax.cast("double") / F.count("*"), 6).alias("hapax_ratio"),
    )


@register(
    "corpus_vocab_growth",
    oracle="""
WITH n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
firstseen AS (
  SELECT term, min(doc_id) AS first_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  GROUP BY term
),
b AS (
  SELECT least(first_id * 10 // n.n_docs, 9)::BIGINT AS bucket,
         count(*)::BIGINT AS new_terms
  FROM firstseen CROSS JOIN n GROUP BY 1
)
SELECT bucket, new_terms,
       sum(new_terms) OVER (ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_vocab
FROM b
""",
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law): how many NEW terms each
    tenth of the corpus (by doc_id order) contributes, with the
    cumulative vocabulary — flattening growth signals the corpus is
    re-serving content (read next to text_hapax_ratio, which is the
    same signal per slice). Exact at any scale: one term -> min(doc_id)
    hash agg (vocabulary-sized output), a 10-bucket rollup, and the
    cumulative window over TEN rows — never over terms or documents.
    The doc count enters as a broadcast 1-row aggregate (the
    corpus_mix_weights pattern), keeping the whole query lazy — no
    driver-side action at plan-construction time (ADVICE r4)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n_docs"))
    tok = spread_small_input(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    firstseen = tok.groupBy("term").agg(F.min("doc_id").alias("first_id"))
    b = (
        firstseen.crossJoin(F.broadcast(n))
        .select(
            F.least(
                F.expr("first_id * 10 div n_docs"), F.lit(9)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("new_terms"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return b.select(
        "bucket",
        "new_terms",
        F.sum("new_terms").over(w).cast("bigint").alias("cum_vocab"),
    )


@register(
    "slice_length_quantiles",
    oracle="""
WITH hist AS (
  SELECT lang, n_chars, count(*)::BIGINT AS c
  FROM documents GROUP BY lang, n_chars
),
cum AS (
  SELECT lang, n_chars,
         sum(c) OVER (PARTITION BY lang ORDER BY n_chars
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS cum_c
  FROM hist
),
tot AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang)
SELECT cum.lang, q.q::BIGINT AS q, min(cum.n_chars)::BIGINT AS value
FROM (VALUES (25), (50), (75), (90), (99)) q(q)
JOIN tot ON TRUE
JOIN cum ON cum.lang = tot.lang
WHERE cum.cum_c * 100 >= q.q * tot.n
GROUP BY cum.lang, q.q
""",
)
def slice_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact length quantiles — doc_length_quantiles'
    histogram trick partitioned by slice: the distinct-length
    histogram is bounded by |langs| x length-domain regardless of
    corpus size, the cumulative window runs per lang over that
    domain-sized table, and the quantile probe is a tiny literal
    cross-join. The per-slice view is what catches one language's
    truncation bug hiding inside a healthy global distribution."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.groupBy("lang", "n_chars").agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "lang", "n_chars", F.sum("c").over(w).cast("bigint").alias("cum_c")
    )
    tot = docs.groupBy("lang").agg(F.count("*").alias("n"))
    qs = literal_frame(
        docs.sparkSession, [(25,), (50,), (75,), (90,), (99,)], "q long"
    )
    return (
        cum.join(F.broadcast(tot), "lang")
        .crossJoin(F.broadcast(qs))
        .filter(F.col("cum_c") * 100 >= F.col("q") * F.col("n"))
        .groupBy("lang", "q")
        .agg(F.min("n_chars").cast("bigint").alias("value"))
    )


@register(
    "slice_length_mad",
    oracle="""
WITH hist AS (
  SELECT lang, n_chars, count(*)::BIGINT AS c
  FROM documents GROUP BY lang, n_chars
),
cum AS (
  SELECT lang, n_chars,
         sum(c) OVER (PARTITION BY lang ORDER BY n_chars
                      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_c
  FROM hist
),
tot AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
med AS (
  SELECT cum.lang, min(cum.n_chars)::BIGINT AS med
  FROM cum JOIN tot USING (lang)
  WHERE cum.cum_c * 2 >= tot.n GROUP BY cum.lang
),
dev AS (
  SELECT d.lang, abs(d.n_chars - m.med)::BIGINT AS dv
  FROM documents d JOIN med m ON d.lang = m.lang
),
dhist AS (SELECT lang, dv, count(*)::BIGINT AS c FROM dev GROUP BY lang, dv),
dcum AS (
  SELECT lang, dv,
         sum(c) OVER (PARTITION BY lang ORDER BY dv
                      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_c
  FROM dhist
)
SELECT dcum.lang, m.med AS median_len, min(dcum.dv)::BIGINT AS mad
FROM dcum JOIN tot USING (lang) JOIN med m ON m.lang = dcum.lang
WHERE dcum.cum_c * 2 >= tot.n
GROUP BY dcum.lang, m.med
""",
)
def slice_length_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language median and median-absolute-deviation of document
    length — the robust spread monitor (a truncation bug shifts MAD
    long before it moves the mean, and outlier crawl blobs can't drag
    it the way they drag stddev). Two chained value-domain histogram
    cuts, proving the histcut machinery COMPOSES: pass 1 derives each
    language's exact median from the length histogram; the langs-sized
    median table broadcasts back onto the corpus to compute per-doc
    absolute deviations map-side; pass 2 runs the identical cut on the
    deviation domain. Both cumulative windows are O(length-domain) per
    language — never O(docs) — and everything else is hash aggs and
    broadcast joins. Pure integer arithmetic end to end."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")

    def _median_of(frame: DataFrame, col: str, out: str) -> DataFrame:
        hist = frame.groupBy("lang", col).agg(F.count("*").alias("c"))
        w = (
            Window.partitionBy("lang")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = hist.select("lang", col, F.sum("c").over(w).alias("cum_c"))
        tot = frame.groupBy("lang").agg(F.count("*").alias("n"))
        return (
            cum.join(F.broadcast(tot), "lang")
            .filter(F.col("cum_c") * 2 >= F.col("n"))
            .groupBy("lang")
            .agg(F.min(col).cast("bigint").alias(out))
        )

    med = _median_of(docs, "n_chars", "median_len")
    dev = docs.join(F.broadcast(med), "lang").select(
        "lang",
        "median_len",
        F.abs(F.col("n_chars") - F.col("median_len")).cast("bigint").alias("dv"),
    )
    mad = _median_of(dev, "dv", "mad")
    return med.join(mad, "lang").select("lang", "median_len", "mad")


# corpus_zipf_coverage: token-mass coverage of the top-k vocabulary —
# bounded head size so the rank window is a design constant, not data.
ZIPF_HEAD_MAX = 10000
ZIPF_KS = [1, 10, 100, 1000, 10000]


@register(
    "corpus_zipf_coverage",
    oracle=f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
counts AS (SELECT term, count(*)::BIGINT AS cnt FROM tok GROUP BY term),
tot AS (SELECT sum(cnt)::BIGINT AS total FROM counts),
head AS (
  SELECT term, cnt, rnk FROM (
    SELECT term, cnt,
           row_number() OVER (ORDER BY cnt DESC, term) AS rnk
    FROM counts)
  WHERE rnk <= {ZIPF_HEAD_MAX}
),
ks AS (SELECT unnest([{", ".join(str(k) for k in ZIPF_KS)}])::BIGINT AS k)
SELECT ks.k,
       sum(CASE WHEN h.rnk <= ks.k THEN 1 ELSE 0 END)::BIGINT AS n_terms,
       sum(CASE WHEN h.rnk <= ks.k THEN h.cnt ELSE 0 END)::BIGINT
         AS tokens_covered,
       round(CAST(sum(CASE WHEN h.rnk <= ks.k THEN h.cnt ELSE 0 END)
                  AS DOUBLE) / t.total, 9) AS coverage
FROM head h CROSS JOIN ks CROSS JOIN tot t
GROUP BY ks.k, t.total
ORDER BY ks.k
""",
)
def corpus_zipf_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-head coverage: what fraction of the corpus' total token
    mass the top-k vocabulary terms cover, for k in ZIPF_KS — the
    number a tokenizer/vocab budget decision actually needs ("how big
    a vocab covers 99% of tokens"), complementing corpus_vocab_growth
    (vocab size vs docs seen) and text_hapax_ratio (the tail).

    Scale shape: one hash aggregate with map-side combine builds term
    counts; the head is a TakeOrderedAndProject of ZIPF_HEAD_MAX rows —
    an absolute design constant, so the subsequent rank window runs on
    a bounded single partition BY CONSTRUCTION (never a data-sized
    global sort); the k-sweep rides the head frame as conditional
    aggregates, and the total is a 1-row broadcast. Pure integer
    arithmetic until the final correctly-rounded division — exact on
    both engines."""
    docs = load_table(spark, sf_dir, "documents")
    tok = spread_small_input(docs).select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    counts = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("bigint").alias("total"))
    head = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(ZIPF_HEAD_MAX)
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    ranked = head.withColumn("rnk", F.row_number().over(w))
    ks = literal_frame(spark, [(k,) for k in ZIPF_KS], "k bigint")
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_terms"),
            F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("tokens_covered"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            "n_terms",
            "tokens_covered",
            F.round(
                F.col("tokens_covered").cast("double") / F.col("total"), 9
            ).alias("coverage"),
        )
        .orderBy("k")
    )


@register(
    "text_char_diversity",
    oracle="""
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
per AS (
  SELECT doc_id, ch, count(*)::BIGINT AS c FROM ch GROUP BY doc_id, ch
)
SELECT doc_id,
       sum(c)::BIGINT AS n_chars,
       count(*)::BIGINT AS n_distinct,
       CASE WHEN sum(c) <= 1 THEN NULL
            ELSE round(CAST(sum(c * (c - 1)) AS DOUBLE)
                       / (sum(c) * (sum(c) - 1)), 9) END AS char_collision
FROM per GROUP BY doc_id
""",
)
def text_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character diversity: distinct characters and the
    character collision probability (Simpson index over the character
    unigram distribution, sum c_i(c_i-1)/(n(n-1))) — the rational twin
    of character entropy (libm log() is not bit-identical across
    engines; collision probability ranks garbage the same way: mashed-
    key/repeated-char junk scores high, natural text low). The quality
    gate a 100 TB pre-filter runs BEFORE tokenization, since it needs
    no vocabulary.

    Scale shape: map-side char explode then ONE two-key hash aggregate
    (doc_id, char) with map-side combine — the (doc, char) domain is
    ~doc_count x charset, far smaller than the char stream — and a
    doc-keyed re-aggregate. Pure integer sums until the final division;
    no broadcast, no window, no join.

    Degenerate guard (ADVICE r11): a one-character document makes the
    denominator n(n-1) zero — 0/0 is engine-divergent (NULL here, NaN
    under DuckDB's IEEE float-ops setting), so both sides return an
    explicit NULL for n <= 1, same pattern as dedup_lsh_curve."""
    docs = load_table(spark, sf_dir, "documents")
    ch = spread_small_input(docs).select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    )
    per = ch.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    n = F.sum("c").cast("bigint")
    coll = F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint")
    return per.groupBy("doc_id").agg(
        n.alias("n_chars"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.when(n <= F.lit(1), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                coll.cast("double") / (n * (n - F.lit(1))).cast("double"), 9
            )
        )
        .alias("char_collision"),
    )
