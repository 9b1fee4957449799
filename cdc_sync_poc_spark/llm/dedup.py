"""Deduplication operators (LLM-data-pipeline extension, SURVEY §7.1 M6):
exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — each expressed as declarative DataFrame plans.

Scale design (the point of each operator at 100 TB):

* exact:   one shuffle on the content hash; map-side partial agg.
* minhash: shingle explode is map-only; the signature agg shuffles on
  (doc, seed) then (doc, band); LSH banding means the candidate join is
  an equi join on (band_id, band_key) — near-dup pairs without the
  O(n^2) cross join. Verification touches only candidate pairs.
* simhash: map-only signature then a groupBy on the 16-bit fingerprint.
* ngram-jaccard: pair generation restricted to (lang, source) buckets —
  the blocking-key pattern; the intersect join runs on the shingle key.
* embedding: pair generation restricted to label buckets (an IVF-style
  coarse quantization); exact cosine only within buckets.

Hash functions are md5 (lexicographic min-wise hashing) so Spark and the
DuckDB oracle agree bit-for-bit without sharing any RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table

N_HASHES = 12
BAND_SIZE = 4  # 3 bands of 4 -> s-curve threshold ~ (1/3)^(1/4) ~ 0.76
MINHASH_JACCARD_MIN = 0.2
NGRAM_JACCARD_MIN = 0.05
# near-dup cut tuned to the synthetic corpus (random-ish vectors: max
# within-label cosine ~0.5, p99 ~0.29 -> 0.3 keeps the top ~1% of pairs);
# production embeddings would use ~0.95
COSINE_DUP_MIN = 0.3


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep the lowest doc_id.
    One shuffle on the hash; at 100 TB this is the cheapest and first
    dedup pass (and the hash doubles as the content address)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def _shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) — distinct word 3-grams, map-only explode.
    Splits the text ONCE into an array column before the transform
    lambda (an element_at(split(...), i) inside the lambda would re-split
    per element — O(words^2) work per document)."""
    from cdc_sync_poc_spark.sources.loader import spread_small_input

    base = spread_small_input(
        docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    ).filter(F.size("w") >= 3)
    sh = F.array_distinct(
        F.expr(
            "transform(sequence(1, size(w) - 2),"
            " i -> concat_ws(' ', element_at(w, i),"
            " element_at(w, i + 1), element_at(w, i + 2)))"
        )
    )
    return base.select("doc_id", F.explode(sh).alias("shingle"))


_SHINGLE_CTES = """
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(words) - 1),
                i -> concat_ws(' ', words[i], words[i+1], words[i+2])))) AS shingle
  FROM w WHERE len(words) >= 3
),
scount AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id)
"""


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {_SHINGLE_CTES},
mh AS (
  SELECT doc_id, j, min(md5(concat(CAST(j AS VARCHAR), '|', shingle))) AS mh
  FROM sh CROSS JOIN range(1, {N_HASHES + 1}) t(j)
  GROUP BY doc_id, j
),
band AS (
  SELECT doc_id, (j - 1) // {BAND_SIZE} AS band_id,
         md5(string_agg(mh, ',' ORDER BY j)) AS band_key
  FROM mh GROUP BY doc_id, (j - 1) // {BAND_SIZE}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM band a JOIN band b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*)::BIGINT AS ni
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni), 6) AS jaccard
FROM inter i
JOIN scount ca ON ca.doc_id = i.doc_a
JOIN scount cb ON cb.doc_id = i.doc_b
WHERE CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni) >= {MINHASH_JACCARD_MIN}
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup: shingle -> 12 min-wise hashes -> 3 bands
    of 4 -> equi-join on band buckets -> exact-Jaccard verification of
    candidates only. Min-wise hashing over md5 hex strings (lexicographic
    min is a valid uniform min-hash and engine-portable)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs).cache()
    # all N_HASHES md5s as one array per shingle row, then element-wise
    # MIN aggregates in a single groupBy(doc_id) — no seed explosion, one
    # shuffle with map-side partial aggregation (the signature reduces to
    # one row per doc before it moves)
    hash_arr = F.array(
        *[
            F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))
            for j in range(1, N_HASHES + 1)
        ]
    )
    mh = (
        sh.select("doc_id", hash_arr.alias("hs"))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(F.col("hs")[j - 1]).alias(f"mh{j}")
                for j in range(1, N_HASHES + 1)
            ]
        )
    )
    n_bands = N_HASHES // BAND_SIZE
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.col(f"mh{b * BAND_SIZE + k}") for k in range(1, BAND_SIZE + 1)],
                )
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    band = mh.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band_id").alias("band_id"), F.col("bb.band_key").alias("band_key"))
    a = band.select(
        F.col("doc_id").alias("doc_a"), "band_id", F.col("band_key").alias("k_a")
    )
    b = band.select(
        F.col("doc_id").alias("doc_b"),
        F.col("band_id").alias("band_id_b"),
        F.col("band_key").alias("k_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("band_id") == F.col("band_id_b"))
            & (F.col("k_a") == F.col("k_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
        # tiny candidate set, consumed three times below (cand_docs,
        # final semi-join) — persist so the band pipeline runs once
        .persist()
    )
    # verification touches candidate docs only: the candidate-doc set is
    # tiny (LSH prunes hard), so broadcast-semi-join the shingle table
    # down to it BEFORE the intersect self-join — the full shingle table
    # is never shuffled for verification.
    cand_docs = (
        pairs.select(F.col("doc_a").alias("d"))
        .union(pairs.select(F.col("doc_b").alias("d")))
        .distinct()
    )
    shc = sh.join(F.broadcast(cand_docs), sh.doc_id == F.col("d"), "left_semi")
    scount = shc.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = shc.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    sb = shc.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("sh_b"))
    co = (
        sa.join(sb, (F.col("sh_a") == F.col("sh_b")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ni"))
    )
    inter = co.join(pairs, ["doc_a", "doc_b"], "left_semi")
    ca = scount.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = scount.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni"))
    return (
        inter.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .filter(jac >= MINHASH_JACCARD_MIN)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "dedup_simhash",
    oracle="""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
bits AS (
  SELECT doc_id, i,
         sum(CASE WHEN strpos('89abcdef', substr(md5(w), i, 1)) > 0
                  THEN 1 ELSE -1 END)::BIGINT AS s
  FROM tok CROSS JOIN range(1, 17) t(i)
  GROUP BY doc_id, i
)
SELECT doc_id,
       string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS simhash16
FROM bits GROUP BY doc_id
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit): per-token md5, vote +1/-1 per bit position by
    the high bit of each hex nibble, sign of the vote sum is the bit.
    Near-dups share fingerprints (or differ in few bits); grouping by
    fingerprint gives O(n) clustering."""
    from cdc_sync_poc_spark.sources.loader import spread_small_input

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        spread_small_input(docs)
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .select("doc_id", F.md5("w").alias("h"))
    )
    positions = F.explode(F.array(*[F.lit(i) for i in range(1, 17)])).alias("i")
    bits = (
        tok.select("doc_id", "h", positions)
        .select(
            "doc_id",
            "i",
            F.when(F.expr("substr(h, i, 1)").isin(*list("89abcdef")), 1)
            .otherwise(-1)
            .alias("v"),
        )
        .groupBy("doc_id", "i")
        .agg(F.sum("v").alias("s"))
    )
    return (
        bits.withColumn("b", F.when(F.col("s") >= 0, "1").otherwise("0"))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.expr("transform(array_sort(collect_list(struct(i, b))), x -> x.b)")
            ).alias("simhash16")
        )
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_SHINGLE_CTES},
meta AS (SELECT doc_id, lang, source FROM documents),
bpairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM meta a JOIN meta b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*)::BIGINT AS ni
  FROM bpairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni), 6) AS jaccard
FROM inter i
JOIN scount ca ON ca.doc_id = i.doc_a
JOIN scount cb ON cb.doc_id = i.doc_b
WHERE CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni) >= {NGRAM_JACCARD_MIN}
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup with blocking keys: candidate pairs only
    within (lang, source) buckets — the classic blocking pattern that
    turns O(n^2) into sum of per-bucket squares. Intersections computed
    via an equi join on the shingle key."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs).cache()
    meta = docs.select("doc_id", "lang", "source")
    a = meta.select(
        F.col("doc_id").alias("doc_a"), "lang", "source"
    )
    b = meta.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
    )
    bpairs = a.join(
        b,
        (F.col("lang") == F.col("lang_b"))
        & (F.col("source") == F.col("source_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    ).select("doc_a", "doc_b")
    scount = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b2"), F.col("shingle").alias("sh_b"))
    inter = (
        bpairs.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("doc_b2")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ni"))
    )
    ca = scount.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = scount.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jac >= NGRAM_JACCARD_MIN)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


_VEC_CTES = """
e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, label, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e
)
"""


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH {_VEC_CTES}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
             / (a.nrm * b.nrm), 6) AS cosine
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
      / (a.nrm * b.nrm) >= {COSINE_DUP_MIN}
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup within label buckets (IVF-style coarse
    partition: exact cosine only inside a bucket). All arithmetic in
    float64 with sequential folds so Spark and DuckDB agree bitwise."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    norm = F.sqrt(
        F.expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, y) -> acc + y)"
        )
    )
    n = emb.select("vec_id", "label", v.alias("v"), norm.alias("nrm"))
    a = n.select(
        F.col("vec_id").alias("vec_a"), "label", F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    dot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
        " (acc, z) -> acc + z)"
    )
    cos = dot / (F.col("na") * F.col("nb"))
    return (
        a.join(
            b,
            (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= COSINE_DUP_MIN)
        .select("vec_a", "vec_b", F.round(F.col("cosine_raw"), 6).alias("cosine"))
    )
