"""Pre-training preprocessing operators (LLM-data-pipeline extension,
SURVEY §7.1 M6 family): PII redaction, sliding-window chunking,
context-window sequence packing, corpus-frequency rarity scoring,
per-label embedding centroids, and the duplicated-n-gram quality
signal — the transform stage that sits between corpus hygiene
(llm/hygiene.py) and the training-data writer.

Scale design:

* pii_redact / doc_chunking: pure map-side column expressions (regex +
  explode) — zero shuffles; chunking fans out rows but never moves
  them, so the 100 TB plan is scan → project → write.
* seq_packing: a global running token offset is a prefix sum, which
  naively serializes into ONE task per lang. Implemented as the same
  two-level chunked prefix sum as st05 (operators/stateful.py): local
  cumsum inside (lang, doc-chunk) partitions + a tiny chunk-totals
  frame carrying the carry-in offsets, broadcast back. Every wide
  window is partitioned; the only single-partition window runs over
  n_docs/CHUNK_DOCS rows.
* text_rarity_score: the term-frequency join is the canonical skew
  case (stopwords are power-law hot keys). Uses the split-join
  pattern: the top-HOT_K head terms broadcast as a map-side join, the
  long tail shuffles on term — no reducer ever sees a stopword's full
  postings. The union is a disjoint partition of terms, so the result
  is bit-identical to the plain join the oracle runs.
* emb_label_centroids: elementwise float sums across rows are
  partition-order-dependent, so the mean folds fixed-point integers
  (floor(x * 2^20) as BIGINT — same construction as the IVF Lloyd
  round, llm/similarity.py) and divides once at the end: bit-exact
  across engines at any parallelism.
* dup_ngram_fraction: one shuffle on the uniform 128-bit gram hash
  (window count), one hash agg on doc_id. At 100 TB the window form
  can be swapped for agg + broadcast of the (small) duplicated-gram
  set without changing results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table, spread_small_input

# pii_redact: Java (Spark) and RE2 (DuckDB) agree on this character-class
# subset; no lookaround, no lazy quantifiers, no backrefs.
EMAIL_RE = r"[A-Za-z0-9_]+@[A-Za-z0-9_]+\.[A-Za-z]{2,}"
PHONE_RE = r"555-[0-9]{4}"

CHUNK_WORDS = 32  # doc_chunking window size
CHUNK_STRIDE = 24  # doc_chunking stride (8-word overlap)

PACK_BUDGET = 512  # seq_packing context-window token budget
PACK_CHUNK_DOCS = 64  # seq_packing docs per local prefix-sum partition

HOT_K = 64  # text_rarity_score head-term broadcast size
Q_FIX = 1 << 20  # emb_label_centroids fixed-point scale (2^20)
DUP_N = 8  # dup_ngram_fraction n-gram width


@register(
    "pii_redact",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      || ' today'
                 ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{EMAIL_RE}'))::BIGINT AS n_email,
       len(regexp_extract_all(t, '{PHONE_RE}'))::BIGINT AS n_phone,
       md5(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g')) AS clean_hash
FROM aug
""",
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: count and redact email / phone patterns per
    document (the scrub every pre-training pipeline runs before
    tokenization). The synthetic corpus contains no organic PII, so a
    deterministic doc_id-derived email (every 3rd doc) and phone
    (every 5th doc) are appended first — making the regexes fire on a
    varying, replayable subset that the oracle reproduces exactly.
    Map-only: two regexp_extract_all counts + two regexp_replace
    passes inside one projection, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" today"),
            ),
        ).otherwise(F.lit("")),
    )
    base = spread_small_input(docs.select("doc_id", aug.alias("t")))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return base.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_email"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phone"),
        F.md5(clean).alias("clean_hash"),
    )


@register(
    "doc_chunking",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
c AS (
  SELECT doc_id, words,
         unnest(range(1, len(words) + 1, {CHUNK_STRIDE})) AS chunk_start
  FROM w
)
SELECT doc_id,
       (chunk_start - 1) // {CHUNK_STRIDE} AS chunk_id,
       chunk_start,
       len(words[chunk_start : chunk_start + {CHUNK_WORDS - 1}])::BIGINT
         AS n_words,
       md5(array_to_string(
           words[chunk_start : chunk_start + {CHUNK_WORDS - 1}], ' '))
         AS chunk_hash
FROM c
""",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: CHUNK_WORDS-word windows at
    CHUNK_STRIDE spacing (8-word overlap so no span is split across a
    chunk boundary unseen), ragged tail kept — the unit-of-training
    fan-out step before tokenization. Map-side explode only: rows fan
    out ~n_words/stride× but never shuffle, so at 100 TB this stays a
    scan → project → write plan."""
    docs = load_table(spark, sf_dir, "documents")
    base = spread_small_input(
        docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    )
    exploded = base.select(
        "doc_id",
        "w",
        F.posexplode(F.expr(f"sequence(1, size(w), {CHUNK_STRIDE})")).alias(
            "chunk_id", "chunk_start"
        ),
    )
    chunk = F.expr(f"slice(w, chunk_start, {CHUNK_WORDS})")
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.size(chunk).cast("bigint").alias("n_words"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


@register(
    "seq_packing",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang,
         len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens,
         COALESCE(sum(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM d
)
SELECT doc_id, lang, n_tokens,
       (prev // {PACK_BUDGET})::BIGINT AS bin_id,
       (prev % {PACK_BUDGET})::BIGINT AS bin_offset
FROM c
""",
)
def seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: concatenate each language's token
    stream in doc_id order and split it into PACK_BUDGET-token context
    windows — each document reports the window (bin_id) and offset
    where it starts, exactly the concat-then-split packing used to
    build pre-training batches. The running offset is a prefix sum;
    computed two-level so no window ever runs over a whole language in
    one task (see module docstring): local cumsum inside
    (lang, doc_id div PACK_CHUNK_DOCS) + broadcast carry-in offsets
    from the tiny chunk-totals frame. The oracle states the same
    quantity as one flat window."""
    docs = load_table(spark, sf_dir, "documents")
    return seq_packing_frame(spread_small_input(docs))


def seq_packing_frame(docs: DataFrame) -> DataFrame:
    """Core of seq_packing over any (doc_id, lang, text) frame
    (separated so property tests can sweep chunk-boundary cases)."""
    return _bins_from_prev(packing_prev_frame(docs))


def _bins_from_prev(prev_frame: DataFrame) -> DataFrame:
    return prev_frame.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(f"prev div {PACK_BUDGET}").alias("bin_id"),
        (F.col("prev") % PACK_BUDGET).alias("bin_offset"),
    )


def packing_prev_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, n_tokens, prev) from a (doc_id, lang, text)
    frame — tokenizes, then runs the prefix sum."""
    return packing_prev_from_tokens(
        docs.select(
            "doc_id",
            "lang",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        )
    )


def packing_prev_from_tokens(toks: DataFrame) -> DataFrame:
    """(doc_id, lang, n_tokens, prev): each document's running token
    offset within its language stream — the two-level prefix sum,
    exposed separately so the STREAMING packer (streaming/packing.py)
    can add its cross-batch carry before the bin split, and so a
    caller that checkpoints the survivor corpus (llm_curation_e2e) can
    persist the 3-column token frame instead of full text."""
    d = toks.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(f"doc_id div {PACK_CHUNK_DOCS}").alias("ck"),
    )
    w_local = (
        Window.partitionBy("lang", "ck")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = d.withColumn(
        "local_prev", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    # Carry-in per (lang, ck): the chunk-totals frame is n_docs /
    # PACK_CHUNK_DOCS rows — its single-partition-per-lang window is
    # over a frame ~CHUNK_DOCS× smaller than the data (st05 pattern).
    w_carry = (
        Window.partitionBy("lang")
        .orderBy("ck")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        d.groupBy("lang", "ck")
        .agg(F.sum("n_tokens").alias("ck_tot"))
        .select(
            "lang",
            "ck",
            F.coalesce(F.sum("ck_tot").over(w_carry), F.lit(0)).alias("ck_off"),
        )
    )
    prev = F.col("ck_off") + F.col("local_prev")
    return local.join(F.broadcast(carry), ["lang", "ck"]).select(
        "doc_id",
        "lang",
        "n_tokens",
        prev.alias("prev"),
    )


@register(
    "text_rarity_score",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
freq AS (
  SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY term
)
SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
       sum(f.c)::BIGINT AS sum_freq,
       round(CAST(sum(f.c) AS DOUBLE) / count(*), 6) AS mean_term_freq
FROM toks t JOIN freq f USING (term)
GROUP BY t.doc_id
""",
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity score per document: mean corpus
    frequency of the document's tokens (low mean = rare/unusual
    vocabulary, high mean = stopword soup) — the CCNet-style
    frequency prior used as a curation signal. The term join is the
    canonical skew join (head terms are power-law hot): implemented as
    a split-join — top-HOT_K head terms broadcast, the long tail
    shuffles — which partitions the term space, so the union equals
    the oracle's plain join exactly (integer sums are order-free).

    Shape note (r14): pre-aggregating the token stream to per-doc term
    frequencies tf(doc, term) before the joins (guide §2.3) was
    measured SLOWER here (0.89 -> 1.93 s at sf0.1): per-doc term
    repetition is low, so the tf hash-agg shuffles nearly the whole
    token stream on a wide (doc_id, term) string key and saves almost
    nothing downstream — the explode-per-branch form keeps the hot
    branch entirely map-side. Kept as-is deliberately."""
    docs = load_table(spark, sf_dir, "documents")
    toks = spread_small_input(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count("*").alias("c"))
    hot = freq.orderBy(F.desc("c"), F.asc("term")).limit(HOT_K)
    cold = freq.join(F.broadcast(hot.select("term")), "term", "left_anti")
    hot_hits = toks.join(F.broadcast(hot), "term")
    cold_hits = toks.join(
        F.broadcast(hot.select("term")), "term", "left_anti"
    ).join(cold, "term")
    return (
        hot_hits.unionByName(cold_hits)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("c").alias("sum_freq"),
            F.round(
                F.sum("c").cast("double") / F.count("*"), 6
            ).alias("mean_term_freq"),
        )
    )


@register(
    "emb_label_centroids",
    oracle=f"""
WITH ex AS (
  SELECT label,
         unnest(range(1, 65)) AS dim,
         unnest(list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {Q_FIX}) AS BIGINT))) AS q
  FROM embeddings
)
SELECT label, dim, count(*)::BIGINT AS n_vecs,
       round(CAST(sum(q) AS DOUBLE) / {Q_FIX} / count(*), 6) AS centroid
FROM ex GROUP BY label, dim
""",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dimension) —
    the class-prototype computation behind centroid classifiers,
    outlier scoring, and IVF-style partition seeding. Elementwise
    double sums are partition-order-dependent, so each coordinate is
    fixed-pointed (floor(x · 2^20) as BIGINT — the construction the
    IVF Lloyd round uses, llm/similarity.py) and summed exactly; one
    double division at the end. posexplode shuffles (label, dim) keyed
    rows — 64× fan-out but uniform keys, map-side combined."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = spread_small_input(emb.select("label", "embedding")).select(
        "label",
        F.posexplode(
            F.expr(
                f"transform(embedding,"
                f" x -> CAST(floor(CAST(x AS DOUBLE) * {Q_FIX}) AS BIGINT))"
            )
        ).alias("pos", "q"),
    )
    return (
        ex.groupBy("label", (F.col("pos") + 1).cast("bigint").alias("dim"))
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(
                F.sum("q").cast("double") / Q_FIX / F.count("*"), 6
            ).alias("centroid"),
        )
        .select("label", "dim", "n_vecs", "centroid")
    )


@register(
    "dup_ngram_fraction",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(words) - {DUP_N - 2}),
             i -> md5(array_to_string(words[i : i + {DUP_N - 1}], ' '))))
           AS gh
  FROM w WHERE len(words) >= {DUP_N}
),
c AS (SELECT doc_id, gh, count(*) OVER (PARTITION BY gh) AS cnt FROM g)
SELECT doc_id, count(*)::BIGINT AS n_grams,
       sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup,
       round(CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_frac
FROM c GROUP BY doc_id
""",
)
def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-n-gram fraction per document: the share of a
    document's overlapping DUP_N-grams that occur more than once in
    the corpus (RefinedWeb/Gopher-style inter-document repetition
    signal — high fraction = boilerplate or near-dup content that
    document-level dedup missed). Unlike dedup_span_exact's disjoint
    spans, grams here OVERLAP, so every duplicated phrase is charged
    to every position it covers. One shuffle on the uniform gram hash
    (window count) + one doc_id hash agg."""
    docs = load_table(spark, sf_dir, "documents")
    base = spread_small_input(
        docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    ).filter(F.size("w") >= DUP_N)
    grams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {DUP_N - 1}),"
                f" i -> md5(concat_ws(' ', slice(w, i, {DUP_N}))))"
            )
        ).alias("gh"),
    )
    cnt = F.count("*").over(Window.partitionBy("gh"))
    dup = F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
    return (
        grams.withColumn("cnt", cnt)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            dup.alias("n_dup"),
            F.round(dup.cast("double") / F.count("*"), 6).alias("dup_frac"),
        )
    )


@register(
    "text_ngram_novelty",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(range(1, len(words) - {DUP_N - 2}),
             i -> md5(array_to_string(words[i : i + {DUP_N - 1}], ' '))))) AS gh
  FROM w WHERE len(words) >= {DUP_N}
),
own AS (SELECT gh, min(doc_id) AS owner FROM g GROUP BY gh)
SELECT g.doc_id, count(*)::BIGINT AS n_distinct,
       sum(CASE WHEN own.owner = g.doc_id THEN 1 ELSE 0 END)::BIGINT
         AS n_novel,
       round(CAST(sum(CASE WHEN own.owner = g.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novelty_frac
FROM g JOIN own USING (gh) GROUP BY g.doc_id
""",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-order n-gram novelty per document: the share of a
    document's DISTINCT DUP_N-grams whose FIRST owner (minimum doc_id
    over the corpus) is this document — the novelty-decay curve an
    incremental crawl watches to decide when a source has stopped
    contributing new content (complement of dup_ngram_fraction, which
    charges repetition to every occurrence; novelty charges each gram
    to exactly one document, so corpus novelty mass sums to the
    distinct-gram count).

    Scale shape (r14 rework, guide §2.3): per-doc gram DISTINCTNESS is
    map-side (array_distinct before the explode — no (doc_id, gh)
    shuffle); each gram's novelty credit goes to exactly ONE document
    (the min-doc_id owner), so the per-doc novel count is the owner
    table ROLLED UP BY OWNER — a gram-keyed min() hash agg (map-side
    combined on the uniform 128-bit hash) followed by a doc-keyed
    count. The old form instead joined the owner table back onto the
    gram rows and rolled the JOINED gram-sized frame up by doc —
    shipping every gram row through a join and a second gram-sized
    aggregate; now the only gram-sized exchanges are the two partial
    aggs' combined outputs, and the final join is doc-sized on both
    sides (AQE broadcasts whichever fits). Same integers by
    construction: n_distinct counts each doc's gram rows either way,
    and summing owner==doc over the join ≡ counting the owner table
    grouped by owner."""
    docs = load_table(spark, sf_dir, "documents")
    base = spread_small_input(
        docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    ).filter(F.size("w") >= DUP_N)
    grams = base.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(w) - {DUP_N - 1}),"
                    f" i -> md5(concat_ws(' ', slice(w, i, {DUP_N}))))"
                )
            )
        ).alias("gh"),
    )
    per_doc = grams.groupBy("doc_id").agg(F.count("*").alias("n_distinct"))
    novel = (
        grams.groupBy("gh")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_novel"))
    )
    n_novel = F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint")
    return per_doc.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_distinct",
        n_novel.alias("n_novel"),
        F.round(n_novel.cast("double") / F.col("n_distinct"), 6).alias(
            "novelty_frac"
        ),
    )


SHIFT_TAU = 0.05  # per-dimension drift alarm threshold


@register(
    "emb_centroid_shift",
    oracle=f"""
WITH ex AS (
  SELECT label, vec_id % 2 AS half,
         unnest(range(1, 65)) AS dim,
         unnest(list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {Q_FIX}) AS BIGINT))) AS q
  FROM embeddings
),
cent AS (
  SELECT label, half, dim, count(*)::BIGINT AS n, sum(q)::BIGINT AS s
  FROM ex GROUP BY label, half, dim
),
d AS (
  SELECT a.label, a.dim, a.n AS n_a, b.n AS n_b,
         abs(CAST(a.s AS DOUBLE) / a.n / {Q_FIX}
             - CAST(b.s AS DOUBLE) / b.n / {Q_FIX}) AS shift
  FROM cent a JOIN cent b
    ON a.label = b.label AND a.dim = b.dim AND a.half = 0 AND b.half = 1
)
SELECT label, max(n_a)::BIGINT AS n_a, max(n_b)::BIGINT AS n_b,
       round(max(shift), 6) AS max_abs_shift,
       count(*) FILTER (shift > {SHIFT_TAU})::BIGINT AS n_dims_shifted
FROM d GROUP BY label
""",
)
def emb_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: split the corpus into two deterministic
    halves (vec_id parity — standing in for reference snapshot vs new
    batch), compute each half's per-label centroid, and report the
    worst per-dimension shift plus how many dimensions moved beyond
    SHIFT_TAU — the alarm that catches a silently swapped or
    re-trained embedding model before a 100 TB re-index runs against
    incompatible vectors.

    Exactness: per-(label, half, dim) fixed-point BIGINT sums (the
    emb_label_centroids construction), one correctly-rounded division
    per cell, and only order-INDEPENDENT reductions (max, filtered
    count) across dimensions — no cross-dimension double sum whose
    order could differ between engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = spread_small_input(
        emb.select("label", (F.col("vec_id") % 2).alias("half"), "embedding")
    ).select(
        "label",
        "half",
        F.posexplode(
            F.expr(
                f"transform(embedding,"
                f" x -> CAST(floor(CAST(x AS DOUBLE) * {Q_FIX}) AS BIGINT))"
            )
        ).alias("pos", "q"),
    )
    # ONE scan + explode: both halves fold in the same conditional
    # aggregation (the events_ab_ttest pattern) — a filtered self-join
    # of the cent table would push the parity filter into TWO separate
    # embeddings scans and run the 64x explode twice
    half_a, half_b = F.col("half") == 0, F.col("half") == 1
    cent = ex.groupBy("label", (F.col("pos") + 1).alias("dim")).agg(
        F.count(F.when(half_a, 1)).alias("n_a"),
        F.sum(F.when(half_a, F.col("q"))).alias("s_a"),
        F.count(F.when(half_b, 1)).alias("n_b"),
        F.sum(F.when(half_b, F.col("q"))).alias("s_b"),
    )
    shift = F.abs(
        F.col("s_a").cast("double") / F.col("n_a") / Q_FIX
        - F.col("s_b").cast("double") / F.col("n_b") / Q_FIX
    )
    d = cent.filter((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        "label", "n_a", "n_b", shift.alias("shift")
    )
    return d.groupBy("label").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.round(F.max("shift"), 6).alias("max_abs_shift"),
        F.count(F.when(F.col("shift") > SHIFT_TAU, 1)).alias("n_dims_shifted"),
    )


PAD_BATCH_DOCS = 8  # pack_padding_waste: docs per length-bucketed batch


@register(
    "pack_padding_waste",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang,
         len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
packed AS (
  SELECT sum((tot + {PACK_BUDGET - 1}) // {PACK_BUDGET})::BIGINT AS n_units,
         sum(tot)::BIGINT AS n_tokens,
         (sum((tot + {PACK_BUDGET - 1}) // {PACK_BUDGET})
          * {PACK_BUDGET})::BIGINT AS n_slots
  FROM (SELECT lang, sum(n_tokens) AS tot FROM d GROUP BY lang)
),
bucketed_rows AS (
  SELECT lang, n_tokens,
         CASE WHEN n_tokens <= 1 THEN 1
              ELSE 1 << length(bin(n_tokens - 1)) END AS bucket,
         row_number() OVER (
           PARTITION BY lang,
             CASE WHEN n_tokens <= 1 THEN 1
                  ELSE 1 << length(bin(n_tokens - 1)) END
           ORDER BY doc_id) AS rn
  FROM d
),
batches AS (
  SELECT lang, bucket, (rn - 1) // {PAD_BATCH_DOCS} AS batch_id,
         count(*)::BIGINT AS n_docs, max(n_tokens)::BIGINT AS mx,
         sum(n_tokens)::BIGINT AS toks
  FROM bucketed_rows GROUP BY 1, 2, 3
),
bucketed AS (
  SELECT count(*)::BIGINT AS n_units, sum(toks)::BIGINT AS n_tokens,
         sum(n_docs * mx)::BIGINT AS n_slots
  FROM batches
)
SELECT 'packed' AS method, n_units, n_tokens, n_slots,
       round(CAST(n_slots - n_tokens AS DOUBLE) / n_slots, 6) AS waste_frac
FROM packed
UNION ALL
SELECT 'bucketed' AS method, n_units, n_tokens, n_slots,
       round(CAST(n_slots - n_tokens AS DOUBLE) / n_slots, 6) AS waste_frac
FROM bucketed
""",
)
def pack_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-efficiency audit: how many context-window token slots
    each batching strategy burns on the same corpus — the number that
    justifies sequence packing in a pre-training pipeline.

    * ``packed`` — contiguous concat-then-split packing (seq_packing):
      the only waste is each language stream's final partial bin, so
      slots = ceil(tokens/budget) * budget per language, derived from
      the per-language token totals (one tiny agg — the packer's own
      bin math, no window needed).
    * ``bucketed`` — the classic pad-to-batch-max baseline: docs land
      in power-of-two length buckets (bucket = 2^bitlen(n-1), the HLL
      bin()-length trick so both engines agree without log()),
      PAD_BATCH_DOCS docs per batch in doc_id order, every doc padded
      to its batch's max length.

    Scale shape: the bucketed rank is the packer's two-level pattern —
    row_number inside (lang, bucket, doc_id-chunk) + broadcast
    carry-in counts per chunk — so no window ever sorts a whole
    (lang, bucket) group in one task; the oracle states the same rank
    as one flat window."""
    docs = load_table(spark, sf_dir, "documents")
    d = spread_small_input(docs).select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )

    lang_tot = d.groupBy("lang").agg(F.sum("n_tokens").alias("tot"))
    bins = F.expr(f"(tot + {PACK_BUDGET - 1}) div {PACK_BUDGET}")
    packed = lang_tot.select(
        bins.alias("bins"), F.col("tot")
    ).agg(
        F.sum("bins").cast("bigint").alias("n_units"),
        F.sum("tot").cast("bigint").alias("n_tokens"),
        (F.sum("bins") * PACK_BUDGET).cast("bigint").alias("n_slots"),
    )

    bucket = F.expr(
        "CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT)"
        " ELSE shiftleft(CAST(1 AS BIGINT), length(bin(n_tokens - 1))) END"
    )
    db = d.withColumn("bucket", bucket).withColumn(
        "ck", F.expr(f"doc_id div {PACK_CHUNK_DOCS}")
    )
    w_local = Window.partitionBy("lang", "bucket", "ck").orderBy("doc_id")
    local = db.withColumn("local_rn", F.row_number().over(w_local))
    w_carry = (
        Window.partitionBy("lang", "bucket")
        .orderBy("ck")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        db.groupBy("lang", "bucket", "ck")
        .agg(F.count("*").alias("ck_n"))
        .select(
            "lang",
            "bucket",
            "ck",
            F.coalesce(F.sum("ck_n").over(w_carry), F.lit(0)).alias("ck_off"),
        )
    )
    batches = (
        local.join(F.broadcast(carry), ["lang", "bucket", "ck"])
        .withColumn("batch_id", F.expr(f"(ck_off + local_rn - 1) div {PAD_BATCH_DOCS}"))
        .groupBy("lang", "bucket", "batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("n_tokens").alias("mx"),
            F.sum("n_tokens").alias("toks"),
        )
    )
    bucketed = batches.agg(
        F.count("*").cast("bigint").alias("n_units"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
        F.sum(F.col("n_docs") * F.col("mx")).cast("bigint").alias("n_slots"),
    )

    waste = F.round(
        (F.col("n_slots") - F.col("n_tokens")).cast("double") / F.col("n_slots"), 6
    )
    return (
        packed.select(F.lit("packed").alias("method"), "n_units", "n_tokens", "n_slots")
        .unionByName(
            bucketed.select(
                F.lit("bucketed").alias("method"), "n_units", "n_tokens", "n_slots"
            )
        )
        .withColumn("waste_frac", waste)
    )


TRAIN_SHARDS = 16  # train_order_shuffle output shards
_SHUF_SEED = "e0"  # epoch seed baked into the order hash
_SHUF_BANDS_DIV = 1 << 40  # 48-bit hash -> 256 range bands per shard


@register(
    "train_order_shuffle",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5('{_SHUF_SEED}:' || CAST(doc_id AS VARCHAR)),
                         1, 12))::BIGINT AS hv
  FROM documents
)
SELECT doc_id, (hv % {TRAIN_SHARDS})::BIGINT AS shard,
       row_number() OVER (PARTITION BY hv % {TRAIN_SHARDS}
                          ORDER BY hv, doc_id)::BIGINT AS pos
FROM h
""",
)
def train_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: the global training order a
    pre-training data loader consumes. Each document's order key is a
    seeded 48-bit md5 hash; shard = hash mod TRAIN_SHARDS, position
    within the shard = rank by (hash, doc_id). Same seed -> same order
    on every run and both engines; a new epoch is a new seed, never a
    reshuffle job over state.

    Scale shape: a naive per-shard row_number sorts corpus/SHARDS rows
    in one task. Instead the rank is computed TeraSort-style: the
    uniform hash is split into 256 range bands, rows rank locally
    inside (shard, band) — 4096 independent groups — and each band
    adds the broadcast carry count of the bands below it. This is the
    packer's two-level prefix-sum pattern applied to ordering; the
    oracle states the identical rank as one flat window."""
    docs = load_table(spark, sf_dir, "documents")
    return train_order_frame(spread_small_input(docs.select("doc_id")))


def train_order_frame(docs: DataFrame) -> DataFrame:
    """Core of train_order_shuffle over any frame with ``doc_id`` —
    separated so the streaming twin (streaming/train_order.py) assigns
    the identical in-batch order before adding its per-shard carry."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{_SHUF_SEED}:"), F.col("doc_id").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    d = docs.select(
        "doc_id",
        hv.alias("hv"),
    ).withColumn("shard", (F.col("hv") % TRAIN_SHARDS).cast("bigint")).withColumn(
        "band", F.expr(f"hv div {_SHUF_BANDS_DIV}")
    )
    w_local = Window.partitionBy("shard", "band").orderBy("hv", "doc_id")
    local = d.withColumn("local_rn", F.row_number().over(w_local))
    w_carry = (
        Window.partitionBy("shard")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        d.groupBy("shard", "band")
        .agg(F.count("*").alias("band_n"))
        .select(
            "shard",
            "band",
            F.coalesce(F.sum("band_n").over(w_carry), F.lit(0)).alias("band_off"),
        )
    )
    return local.join(F.broadcast(carry), ["shard", "band"]).select(
        "doc_id",
        "shard",
        (F.col("band_off") + F.col("local_rn")).cast("bigint").alias("pos"),
    )
