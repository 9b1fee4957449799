"""Similarity search over the ``embeddings`` table (array<float> column):
brute-force cosine top-k as the exact baseline, a single-query
LSH-bucketed ANN, and the batch multi-probe ANN a training-data
pipeline actually runs (top-k for EVERY vector).

Scale design: brute-force is a broadcast of the (tiny) query vector over
a map-only scan + TakeOrderedAndProject top-k — linear, shuffle-free,
and the right baseline even at 100 TB (it reads every vector once). The
ANN variants prune candidates to random-hyperplane sign buckets
(Charikar SimHash LSH with Rademacher ±1 hyperplanes): bucket
assignment is map-only; the batch query is an equi-join on the bucket
key — high-cardinality (2^N_SIGN_BITS grows with the configured bit
count, the scale knob) — followed by a per-query-vector top-k window.
Multi-probe (flipping the lowest-confidence sign bits) recovers recall
without growing the bucket count; the production path would store the
bucket as a partition key so partition pruning skips the rest of the
lake entirely.

The hyperplanes are deterministic Rademacher vectors derived from md5
in the DRIVER (plain Python, module import time) and inlined as literal
arrays into both the Spark expression and the DuckDB oracle SQL — no
engine-side RNG to mirror.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table

QUERY_VEC_ID = 0
TOP_K = 10
ANN_TOP_K = 5
N_SIGN_BITS = 8
N_PROBE_FLIPS = 2  # multi-probe: own bucket + flip of bit 1 and bit 2
EMB_DIM = 64
N_CELLS = 16  # IVF coarse-quantizer cells (scale knob: cell ~ n/cells)
N_PROBE_CELLS = 2  # IVF probes: search the query's nearest cells only


def _rademacher_planes(bits: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: component (b, i) is the low bit of
    md5("hp|b|i"). Rademacher entries are a valid Charikar hyperplane
    family, and deriving them from md5 keeps the construction
    reproducible across engines without sharing an RNG."""
    return [
        [
            1.0 if hashlib.md5(f"hp|{b}|{i}".encode()).digest()[0] & 1 else -1.0
            for i in range(dim)
        ]
        for b in range(bits)
    ]


HYPERPLANES = _rademacher_planes(N_SIGN_BITS, EMB_DIM)


def bucket_col(vcol: str = "v", n_bits: int = N_SIGN_BITS) -> F.Column:
    """Spark column: n_bits-char '0'/'1' bucket string — sign of
    <v, r_b> for each hyperplane, all in whole-stage codegen. Fewer
    bits = bigger buckets = more recall; more bits = harder pruning —
    the scale knob for any consumer of this primitive."""
    bits = []
    for w in HYPERPLANES[:n_bits]:
        arr = "array(" + ",".join(f"{x:.1f}D" for x in w) + ")"
        s = (
            f"aggregate(zip_with({vcol}, {arr}, (x, w) -> x * w),"
            " CAST(0.0 AS DOUBLE), (acc, y) -> acc + y)"
        )
        bits.append(f"CASE WHEN {s} >= 0 THEN '1' ELSE '0' END")
    return F.expr("concat(" + ",".join(bits) + ")")


def bucket_sql(vcol: str = "v", n_bits: int = N_SIGN_BITS) -> str:
    """DuckDB expression mirroring ``bucket_col`` bit-for-bit (same
    literal hyperplanes, same sequential double arithmetic)."""
    bits = []
    for w in HYPERPLANES[:n_bits]:
        arr = "[" + ",".join(f"{x:.1f}" for x in w) + "]::DOUBLE[]"
        s = (
            f"list_sum(list_transform(range(1, {EMB_DIM + 1}),"
            f" i -> {vcol}[i] * ({arr})[i]))"
        )
        bits.append(f"CASE WHEN {s} >= 0 THEN '1' ELSE '0' END")
    return "concat(" + ",".join(bits) + ")"


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


@register(
    "sim_ann_lsh",
    oracle=f"""
WITH {_VEC_CTES},
bucketed AS (SELECT vec_id, v, nrm, {bucket_sql("v")} AS bucket FROM n),
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
    """Single-query ANN via random-hyperplane LSH: bucket = sign bits of
    8 Rademacher projections; search only the query's bucket.
    Deterministic, engine-portable bucketing; recall/latency tuned by
    the number of sign bits (and by multi-probe — see
    sim_ann_topk_all for the batch + probe variant)."""
    n = _normed(spark, sf_dir)
    bucketed = n.withColumn("bucket", bucket_col("v"))
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


def _flip_sql(bucket: str, k: int) -> str:
    """DuckDB: bucket string with bit k (1-based) flipped."""
    return (
        f"concat(substr({bucket}, 1, {k - 1}),"
        f" CASE WHEN substr({bucket}, {k}, 1) = '1' THEN '0' ELSE '1' END,"
        f" substr({bucket}, {k + 1}))"
    )


def _flip_col(bucket: F.Column, k: int) -> F.Column:
    """Spark: bucket string with bit k (1-based) flipped."""
    return F.concat(
        F.substring(bucket, 1, k - 1),
        F.when(F.substring(bucket, k, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
        F.substring(bucket, k + 1, N_SIGN_BITS),
    )


_PROBE_LIST_SQL = "[" + ", ".join(
    ["bucket"] + [_flip_sql("bucket", k) for k in range(1, N_PROBE_FLIPS + 1)]
) + "]"


@register(
    "sim_ann_topk_all",
    oracle=f"""
WITH {_VEC_CTES},
b AS (SELECT vec_id, v, nrm, {bucket_sql("v")} AS bucket FROM n),
probes AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn,
         unnest({_PROBE_LIST_SQL}) AS bucket
  FROM b
),
scored AS (
  SELECT p.q_id, c.vec_id,
         list_sum(list_transform(range(1, 65), i -> c.v[i] * p.qv[i]))
         / (c.nrm * p.qn) AS cosr
  FROM probes p JOIN b c USING (bucket)
  WHERE c.vec_id <> p.q_id
),
ranked AS (
  SELECT q_id, vec_id, cosr,
         row_number() OVER (PARTITION BY q_id ORDER BY cosr DESC, vec_id) AS rnk
  FROM scored
)
SELECT q_id, vec_id AS nn_id, rnk, round(cosr, 6) AS cosine
FROM ranked WHERE rnk <= {ANN_TOP_K}
""",
)
def sim_ann_topk_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch multi-probe ANN: top-k neighbors for EVERY vector — the
    operator a 100 TB dedup/retrieval pipeline actually runs. Each
    vector probes its own sign bucket plus N_PROBE_FLIPS one-bit-flip
    buckets (multi-probe recall recovery); candidates come from an
    equi-join on the bucket key (high-cardinality, grows 2^bits);
    ranking is a row_number window partitioned by the query vector id —
    also high-cardinality, so no single-task stage anywhere. A
    candidate lives in exactly one bucket and probe buckets are
    distinct, so (query, candidate) pairs are already unique — no
    dedup step needed before ranking."""
    n = _normed(spark, sf_dir)
    bucketed = n.select("vec_id", "v", "nrm", bucket_col("v").alias("bucket"))
    probes = F.array(
        F.col("bucket"),
        *[_flip_col(F.col("bucket"), k) for k in range(1, N_PROBE_FLIPS + 1)],
    )
    qp = bucketed.select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.explode(probes).alias("bucket"),
    )
    cand = qp.join(bucketed, "bucket").filter(F.col("vec_id") != F.col("q_id"))
    cos = F.expr(_DOT) / (F.col("nrm") * F.col("qn"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosr"), F.asc("vec_id"))
    return (
        cand.withColumn("cosr", cos)
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= ANN_TOP_K)
        .select(
            "q_id",
            F.col("vec_id").alias("nn_id"),
            "rnk",
            F.round(F.col("cosr"), 6).alias("cosine"),
        )
    )


# Fixed-point scale for the Lloyd centroid update: v[i] * 2^20 is EXACT
# in binary floating point (power-of-two multiply only shifts the
# exponent), and floor of an exact double is engine-stable, so the
# per-cell per-dimension BIGINT sums are order-independent and agree
# bitwise between Spark's hash aggregate and DuckDB — no sorted-fold
# collect_list needed, the update stays a plain scalable hash agg.
_FP_SCALE = float(1 << 20)


def _ivf_assign_ctes(cents_cte: str, tag: str) -> str:
    """DuckDB CTE pair scoring every vector against centroid set
    ``cents_cte`` and ranking cells per vector (argmax cosine,
    tie-break on cell_id) — mirrors the Spark window below."""
    return f"""
sc{tag} AS (
  SELECT n.vec_id, c.cell_id, n.v, n.nrm,
         list_sum(list_transform(range(1, {EMB_DIM + 1}),
                  i -> n.v[i] * c.cv[i])) / (n.nrm * c.cn) AS cosc
  FROM n CROSS JOIN {cents_cte} c
),
rk{tag} AS (
  SELECT vec_id, cell_id, v, nrm,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosc DESC, cell_id) AS rn
  FROM sc{tag}
)"""


def _ivf_oracle() -> str:
    dim_sums = ", ".join(
        f"CAST(sum(CAST(floor(v[{i + 1}] * {_FP_SCALE}) AS BIGINT))"
        f" AS BIGINT) AS s{i}"
        for i in range(EMB_DIM)
    )
    coords = ", ".join(
        f"CAST(s{i} AS DOUBLE) / ({_FP_SCALE} * cnt)" for i in range(EMB_DIM)
    )
    return f"""
WITH {_VEC_CTES},
c0 AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM n
       ORDER BY vec_id LIMIT {N_CELLS}),
{_ivf_assign_ctes("c0", "0")},
a0 AS (SELECT vec_id, cell_id, v FROM rk0 WHERE rn = 1),
sums AS (
  SELECT cell_id, count(*)::BIGINT AS cnt, {dim_sums}
  FROM a0 GROUP BY cell_id
),
c1 AS (
  SELECT cell_id, cv,
         sqrt(list_sum(list_transform(cv, x -> x * x))) AS cn
  FROM (SELECT cell_id, [{coords}]::DOUBLE[] AS cv FROM sums)
),
{_ivf_assign_ctes("c1", "1")},
a1 AS (SELECT vec_id, cell_id, v, nrm FROM rk1 WHERE rn = 1),
qc AS (SELECT cell_id FROM rk1
       WHERE vec_id = {QUERY_VEC_ID} AND rn <= {N_PROBE_CELLS})
SELECT a.vec_id, a.cell_id,
       round(list_sum(list_transform(range(1, {EMB_DIM + 1}),
                      i -> a.v[i] * q.qv[i])) / (a.nrm * q.qn), 6) AS cosine
FROM a1 a JOIN qc USING (cell_id), q
WHERE a.vec_id <> {QUERY_VEC_ID}
ORDER BY list_sum(list_transform(range(1, {EMB_DIM + 1}),
                  i -> a.v[i] * q.qv[i])) / (a.nrm * q.qn) DESC, a.vec_id
LIMIT {ANN_TOP_K}
"""


def _score_cells(n: DataFrame, cents: DataFrame) -> DataFrame:
    """Score every vector against every (broadcast) centroid: map-only
    (the crossJoin build side is N_CELLS tiny rows).

    (Measured alternative, kept out: expanding the dot product to an
    explicit 64-term Add chain pushes past codegen's method-size
    limits and falls back to interpreted eval of a 191-node tree —
    slower than the sequential fold below.)"""
    cosc = F.expr(
        "aggregate(zip_with(v, cv, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
        " (acc, z) -> acc + z)"
    ) / (F.col("nrm") * F.col("cn"))
    return n.crossJoin(F.broadcast(cents)).withColumn("cosc", cosc)


def _argmax_cell(scored: DataFrame, *carry: str) -> DataFrame:
    """Per-vector argmax cosine with cell_id-ascending tie-break, as a
    HASH AGGREGATE rather than a window: max(struct(cosc, -cell_id))
    realizes the same (cosc DESC, cell_id ASC) ordering the oracle's
    row_number uses, and the map-side partial max collapses the N_CELLS
    scored rows per vector to ONE before any exchange — the broadcast
    crossJoin keeps a vector's scored rows in its input partition, so
    the shuffle carries 1/N_CELLS of the windowed variant's bytes and
    there is no sort anywhere. ``carry`` columns are functionally
    dependent on vec_id (identical within a group), so first() is
    deterministic."""
    aggs = [
        F.max(F.struct(F.col("cosc"), (-F.col("cell_id")).alias("ncell"))).alias(
            "best"
        )
    ] + [F.first(c).alias(c) for c in carry]
    return (
        scored.groupBy("vec_id")
        .agg(*aggs)
        .select("vec_id", (-F.col("best.ncell")).alias("cell_id"), *carry)
    )


@register("sim_ivf_topk", oracle=_ivf_oracle())
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN, the partition-pruning scale path: a coarse
    quantizer of N_CELLS centroids partitions the corpus into cells;
    a query searches only its N_PROBE_CELLS nearest cells.

    Centroids: deterministic sample-init (the N_CELLS lowest vec_ids)
    followed by ONE Lloyd refinement round — recompute each cell's
    centroid as the member mean, then re-assign every vector once. The
    iteration count is fixed so the DuckDB oracle replays the identical
    computation; the mean uses fixed-point BIGINT dimension sums
    (order-independent integer arithmetic, see _FP_SCALE) so both
    engines derive bit-identical centroids. Each round is the same
    physical shape: a map-side broadcast join (N_CELLS tiny centroid
    rows) + a per-vector argmax HASH AGGREGATE (max-struct, partial
    max map-side — see _argmax_cell), and the update is one hash
    aggregate with map-side combine — no window sort and no
    single-task stage anywhere. At rest the refined
    cell_id becomes a partition key, so a probe reads
    N_PROBE_CELLS/N_CELLS of the lake and skips the rest entirely —
    the IVF twin of the LSH bucket pruning in sim_ann_lsh /
    sim_ann_topk_all."""
    n = _normed(spark, sf_dir)
    cents0 = (
        n.orderBy("vec_id")
        .limit(N_CELLS)
        .select(
            F.col("vec_id").alias("cell_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
    )
    assigned0 = _argmax_cell(_score_cells(n, cents0), "v")

    # Lloyd update: per-cell mean via exact fixed-point integer sums
    # (one hash agg, 64 + 1 aggregates, map-side combined)
    sums = assigned0.groupBy("cell_id").agg(
        F.count("*").alias("cnt"),
        *[
            F.sum(F.floor(F.col("v")[i] * _FP_SCALE).cast("long")).alias(f"s{i}")
            for i in range(EMB_DIM)
        ],
    )
    mean_coords = F.array(
        *[
            F.col(f"s{i}").cast("double") / (F.lit(_FP_SCALE) * F.col("cnt"))
            for i in range(EMB_DIM)
        ]
    )
    cents1_plan = sums.select("cell_id", mean_coords.alias("cv")).withColumn(
        "cn",
        F.sqrt(
            F.expr(
                "aggregate(transform(cv, x -> x * x), CAST(0.0 AS DOUBLE),"
                " (acc, y) -> acc + y)"
            )
        ),
    )
    # materialize the N_CELLS refined centroids on the DRIVER and
    # re-inject them as a local relation — the centers exchange every
    # distributed k-means does per iteration (k rows, O(k*dim) bytes,
    # independent of corpus size). Three downstream subplans consume
    # the centroids (re-assignment broadcast, probe ranking, final
    # probe); inlining them means the round-0 chain executes exactly
    # once instead of once per consumer. Doubles round-trip the driver
    # bit-exactly, so oracle parity is unaffected.
    cents1 = spark.createDataFrame(
        cents1_plan.collect(), schema="cell_id long, cv array<double>, cn double"
    )

    scored1 = _score_cells(n, cents1)
    assigned1 = _argmax_cell(scored1, "v", "nrm")
    # probe cells: top-N_PROBE_CELLS for the single query vector — a
    # 16-row sort, driver-trivial at any scale
    qcells = (
        scored1.filter(F.col("vec_id") == QUERY_VEC_ID)
        .orderBy(F.desc("cosc"), F.asc("cell_id"))
        .limit(N_PROBE_CELLS)
        .select("cell_id")
    )
    q = n.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = F.expr(_DOT) / (F.col("nrm") * F.col("qn"))
    return (
        assigned1.join(F.broadcast(qcells), "cell_id")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("cosr", cos)
        .orderBy(F.desc("cosr"), F.asc("vec_id"))
        .limit(ANN_TOP_K)
        .select("vec_id", "cell_id", F.round(F.col("cosr"), 6).alias("cosine"))
    )


RECALL_SAMPLE_MOD = 5  # evaluate recall on vec_id % MOD == 0 queries


@register(
    "ann_recall_lsh",
    oracle=f"""
WITH {_VEC_CTES},
b AS (SELECT vec_id, v, nrm, {bucket_sql("v")} AS bucket FROM n),
qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket FROM b
       WHERE vec_id % {RECALL_SAMPLE_MOD} = 0),
probes AS (
  SELECT q_id, qv, qn, unnest({_PROBE_LIST_SQL}) AS bucket FROM qs
),
ann AS (
  SELECT q_id, vec_id FROM (
    SELECT p.q_id, c.vec_id,
           row_number() OVER (
             PARTITION BY p.q_id
             ORDER BY list_sum(list_transform(range(1, {EMB_DIM + 1}),
                      i -> c.v[i] * p.qv[i])) / (c.nrm * p.qn) DESC,
                      c.vec_id) AS rnk
    FROM probes p JOIN b c USING (bucket)
    WHERE c.vec_id <> p.q_id)
  WHERE rnk <= {ANN_TOP_K}
),
exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY list_sum(list_transform(range(1, {EMB_DIM + 1}),
                      i -> c.v[i] * q.qv[i])) / (c.nrm * q.qn) DESC,
                      c.vec_id) AS rnk
    FROM qs q CROSS JOIN n c
    WHERE c.vec_id <> q.q_id)
  WHERE rnk <= {ANN_TOP_K}
),
hits AS (
  SELECT a.q_id, count(*)::BIGINT AS n_hits
  FROM ann a JOIN exact e ON a.q_id = e.q_id AND a.vec_id = e.vec_id
  GROUP BY a.q_id
)
SELECT q.q_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / {ANN_TOP_K} AS recall
FROM qs q LEFT JOIN hits h ON q.q_id = h.q_id
""",
)
def ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the multi-probe LSH ANN against exact brute-force
    ground truth, per query vector — the evaluation job that justifies
    an index's bit/probe configuration before a 100 TB rollout. Runs
    on a deterministic 1/RECALL_SAMPLE_MOD query sample (the scale
    knob: ground truth is O(sample x corpus), so the sample bounds the
    quadratic side while the corpus is still read once, map-only, with
    the sampled queries broadcast). The ANN side reuses the exact
    probe/bucket pipeline of sim_ann_topk_all; both top-k rankings
    break cosine ties by vec_id, so the compared sets are
    deterministic on both engines."""
    n = _normed(spark, sf_dir)
    bucketed = n.select("vec_id", "v", "nrm", bucket_col("v").alias("bucket"))
    qs = bucketed.filter(F.col("vec_id") % RECALL_SAMPLE_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    probes = qs.select(
        "q_id",
        "qv",
        "qn",
        F.explode(
            F.array(
                F.col("bucket"),
                *[_flip_col(F.col("bucket"), k) for k in range(1, N_PROBE_FLIPS + 1)],
            )
        ).alias("bucket"),
    )
    cos = F.expr(_DOT) / (F.col("nrm") * F.col("qn"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosr"), F.asc("vec_id"))
    ann = (
        probes.join(bucketed, "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("cosr", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= ANN_TOP_K)
        .select("q_id", "vec_id")
    )
    exact = (
        n.crossJoin(F.broadcast(qs.select("q_id", "qv", "qn")))
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("cosr", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= ANN_TOP_K)
        .select("q_id", "vec_id")
    )
    hits = ann.join(exact, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count("*").alias("n_hits")
    )
    return (
        qs.select("q_id")
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / ANN_TOP_K
            ).alias("recall"),
        )
    )
