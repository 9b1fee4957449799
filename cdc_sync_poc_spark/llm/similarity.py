"""Similarity search over the ``embeddings`` table (array<float> column):
brute-force cosine top-k as the exact baseline, and an LSH-bucketed ANN
variant as the scale path (SURVEY §7.1 M6).

Scale design: brute-force is a broadcast of the (tiny) query vector over
a map-only scan + TakeOrderedAndProject top-k — linear, shuffle-free,
and the right baseline even at 100 TB (it reads every vector once). The
ANN variant prunes candidates to one hyperplane-sign bucket (a random-
hyperplane LSH specialization using coordinate hyperplanes) — bucket
assignment is map-only and the search touches ~1/2^8 of the data; the
production path would store the bucket as a partition key so partition
pruning skips the rest of the lake entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table

QUERY_VEC_ID = 0
TOP_K = 10
ANN_TOP_K = 5
N_SIGN_BITS = 8

_V64 = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

_VEC_CTES = f"""
e AS (SELECT vec_id, label, {_V64} AS v FROM embeddings),
n AS (
  SELECT vec_id, label, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e
),
q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = {QUERY_VEC_ID})
"""


def _normed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    norm = F.sqrt(
        F.expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, y) -> acc + y)"
        )
    )
    return emb.select("vec_id", "label", v.alias("v"), norm.alias("nrm"))


_DOT = (
    "aggregate(zip_with(v, qv, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
    " (acc, z) -> acc + z)"
)


@register(
    "sim_topk_bruteforce",
    oracle=f"""
WITH {_VEC_CTES}
SELECT n.vec_id,
       round(list_sum(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]))
             / (n.nrm * q.qn), 6) AS cosine
FROM n, q
WHERE n.vec_id <> {QUERY_VEC_ID}
ORDER BY list_sum(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]))
         / (n.nrm * q.qn) DESC, n.vec_id
LIMIT {TOP_K}
""",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a query vector (vec_id=0): broadcast the
    1-row query, map-side dot products, TakeOrderedAndProject top-k —
    no shuffle of the corpus."""
    n = _normed(spark, sf_dir)
    q = n.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = F.expr(_DOT) / (F.col("nrm") * F.col("qn"))
    return (
        n.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("cosine_raw", cos)
        .orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.round(F.col("cosine_raw"), 6).alias("cosine"))
    )


_BUCKET = (
    "array_to_string(list_transform(range(1, {nb}), "
    "i -> CASE WHEN v[i] >= 0 THEN '1' ELSE '0' END), '')"
).format(nb=N_SIGN_BITS + 1)


@register(
    "sim_ann_lsh",
    oracle=f"""
WITH {_VEC_CTES},
bucketed AS (SELECT vec_id, v, nrm, {_BUCKET} AS bucket FROM n),
qb AS (SELECT bucket AS qbucket, v AS qv, nrm AS qn FROM bucketed
       WHERE vec_id = {QUERY_VEC_ID})
SELECT b.vec_id, b.bucket,
       round(list_sum(list_transform(range(1, 65), i -> b.v[i] * q.qv[i]))
             / (b.nrm * q.qn), 6) AS cosine
FROM bucketed b, qb q
WHERE b.bucket = q.qbucket AND b.vec_id <> {QUERY_VEC_ID}
ORDER BY list_sum(list_transform(range(1, 65), i -> b.v[i] * q.qv[i]))
         / (b.nrm * q.qn) DESC, b.vec_id
LIMIT {ANN_TOP_K}
""",
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via hyperplane-sign LSH: bucket = sign bits of the first 8
    dims; search only the query's bucket. Deterministic, engine-portable
    bucketing; recall/latency tuned by the number of sign bits."""
    n = _normed(spark, sf_dir)
    bucket = F.expr(
        "array_join(transform(slice(v, 1, {nb}),"
        " x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')".format(nb=N_SIGN_BITS)
    )
    bucketed = n.withColumn("bucket", bucket)
    q = bucketed.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("bucket").alias("qbucket"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cos = F.expr(_DOT) / (F.col("nrm") * F.col("qn"))
    return (
        bucketed.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != QUERY_VEC_ID))
        .withColumn("cosine_raw", cos)
        .orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(ANN_TOP_K)
        .select("vec_id", "bucket", F.round(F.col("cosine_raw"), 6).alias("cosine"))
    )
