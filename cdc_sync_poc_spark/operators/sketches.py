"""Distinct-count sketches: K-Minimum-Values (KMV / bottom-k theta
sketch, Bar-Yossef et al. 2002) over the event stream — the bounded-
state cardinality estimator a 100 TB rollup uses where exact
count-distinct would shuffle every key.

Why KMV and not approx_count_distinct: Spark's HLL++ is opaque to the
DuckDB oracle, while KMV is a pure order statistic — both engines
derive the identical k smallest md5-based hashes and the identical
estimate (k-1) * 2^48 / h_(k), so the sketch itself is exact-checkable
(the repo-wide rule: every operator carries a value-hash oracle).

Scale design:

* The distinct pass shuffles on (group, hash) — high-cardinality key,
  map-side combined, no skew.
* The k smallest per group are found with the two-level (salted)
  top-k pattern: rank inside (group, hash mod SALT_BUCKETS) first —
  parallel, bounded k rows out per bucket — then rank the
  k * SALT_BUCKETS survivors per group. No stage ever sorts a whole
  group's distinct set in one task (contrast the naive window-per-
  group form, which funnels 1e9 distinct users into |groups| tasks).
* Union/merge (events_kmv_union) is the point of sketches in a
  distributed engine: the k smallest of (A ∪ B) are computable from
  the two k-sets alone, so per-partition / per-day sketches roll up
  without touching raw data again.

Reference parity: the reference has no sketches (its monitoring reads
are exact COUNT(*) polls, SimulatorController.java:92-96); this is M6
extension surface for the 100 TB rollup path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import literal_frame, load_table

KMV_K = 64
SALT_BUCKETS = 32
_H_SPACE = 1 << 48  # 48-bit hash domain: (k-1)*2^48 and h_k stay exact BIGINTs
# (KMV_K - 1) * 2^48 has a 6-bit significand, so its DOUBLE cast is exact
_EST_NUM = (KMV_K - 1) * _H_SPACE


def _hashed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hv): distinct 48-bit md5 hashes of event_id per
    type. One shuffle on the high-cardinality (type, hv) key."""
    ev = load_table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    return ev.select("event_type", hv.alias("hv")).distinct()


def _bottom_k(d: DataFrame, group_cols: list[str]) -> DataFrame:
    """k smallest hv per group via salted two-level ranking — the
    distributed top-k shape that never sorts a whole group in one
    task. Ties cannot occur: hv is distinct within each group."""
    w1 = Window.partitionBy(*group_cols, "salt").orderBy("hv")
    local = (
        d.withColumn("salt", F.col("hv") % SALT_BUCKETS)
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= KMV_K)
        .drop("salt", "rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("hv")
    return local.withColumn("rn", F.row_number().over(w2)).filter(
        F.col("rn") <= KMV_K
    )


_DUCK_HASHED = """
h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT AS hv
  FROM events
)
"""


@register(
    "events_kmv_distinct",
    oracle=f"""
WITH {_DUCK_HASHED},
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM h
)
SELECT event_type, max(nd)::BIGINT AS n_exact,
       CASE WHEN max(nd) <= {KMV_K} THEN CAST(max(nd) AS DOUBLE)
            ELSE round(CAST({_EST_NUM} AS DOUBLE)
                       / max(CASE WHEN rn = {KMV_K} THEN hv END), 3)
       END AS kmv_estimate
FROM r GROUP BY event_type
""",
)
def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct-event cardinality, exact AND KMV-estimated:
    estimate = (k-1) * 2^48 / h_(k) from the k smallest hashes (the
    small-set regime, n_distinct <= k, returns the exact count — the
    sketch IS the distinct set there). n_exact rides along so the
    estimator's error is measured, not asserted.

    One pass over the distinct frame (r15, guide §2.3/§2.4): the old
    form aggregated it once for n_exact and again through the salted
    bottom-k for h_(k), then joined the two on event_type. The exact
    count now rides the bottom-k itself — each level-1 salt bucket
    carries its size (count over the same (type, salt) window the
    ranking sorts), and the level-2 aggregate sums one representative
    row per bucket (rn = 1) while picking the k-th smallest hash — so
    the distinct frame is consumed once, the per-type join disappears,
    and the level-2 aggregate reuses the level-2 window's event_type
    partitioning (no extra exchange)."""
    d = _hashed_distinct(spark, sf_dir)
    w1 = Window.partitionBy("event_type", "salt").orderBy("hv")
    wb = Window.partitionBy("event_type", "salt")
    lvl1 = (
        d.withColumn("salt", F.col("hv") % SALT_BUCKETS)
        .withColumn("rn", F.row_number().over(w1))
        .withColumn("nb", F.count("*").over(wb))
        .filter(F.col("rn") <= KMV_K)
    )
    w2 = Window.partitionBy("event_type").orderBy("hv")
    per_type = (
        lvl1.withColumn("rn2", F.row_number().over(w2))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("rn") == 1, F.col("nb"))).alias("n_exact"),
            F.max(F.when(F.col("rn2") == KMV_K, F.col("hv"))).alias("hk"),
        )
    )
    est = F.when(
        F.col("n_exact") <= KMV_K, F.col("n_exact").cast("double")
    ).otherwise(F.round(F.lit(float(_EST_NUM)) / F.col("hk"), 3))
    return per_type.select("event_type", "n_exact", est.alias("kmv_estimate"))


@register(
    "events_kmv_union",
    oracle=f"""
WITH {_DUCK_HASHED},
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
),
merged AS (
  SELECT DISTINCT hv FROM r WHERE rn <= {KMV_K}
    AND event_type IN ('purchase', 'signup')
),
mr AS (
  SELECT hv, row_number() OVER (ORDER BY hv) AS rn, count(*) OVER () AS nm
  FROM merged
),
ex AS (
  SELECT count(DISTINCT hv)::BIGINT AS n_exact FROM h
  WHERE event_type IN ('purchase', 'signup')
)
SELECT 'purchase+signup' AS pair, ex.n_exact,
       CASE WHEN max(mr.nm) <= {KMV_K} THEN CAST(max(mr.nm) AS DOUBLE)
            ELSE round(CAST({_EST_NUM} AS DOUBLE)
                       / max(CASE WHEN mr.rn = {KMV_K} THEN mr.hv END), 3)
       END AS kmv_estimate
FROM mr CROSS JOIN ex GROUP BY ex.n_exact
""",
)
def events_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGE — estimate |purchase ∪ signup| from the two
    per-type k-sets alone (k smallest of the union of the sketches is
    a valid KMV sketch of the union; Beyer et al. 2007). This is why a
    100 TB rollup keeps sketches per partition/day: unions compose
    without rescanning raw events. Exact union count rides along for
    measured error."""
    d = _hashed_distinct(spark, sf_dir)
    pair = d.filter(F.col("event_type").isin("purchase", "signup"))
    sketches = _bottom_k(pair, ["event_type"]).select("hv").distinct()
    w = Window.orderBy("hv")  # merged sketch: <= 2k rows, single task OK
    mr = (
        sketches.withColumn("rn", F.row_number().over(w))
        .withColumn("nm", F.count("*").over(Window.partitionBy()))
        .filter(F.col("rn") <= KMV_K)
    )
    ex = pair.agg(F.count_distinct("hv").alias("n_exact"))
    est = F.when(
        F.col("nm") <= KMV_K, F.col("nm").cast("double")
    ).otherwise(F.round(F.lit(float(_EST_NUM)) / F.col("hk"), 3))
    top = mr.agg(
        F.max("nm").alias("nm"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("hv"))).alias("hk"),
    )
    return top.crossJoin(F.broadcast(ex)).select(
        F.lit("purchase+signup").alias("pair"),
        "n_exact",
        est.alias("kmv_estimate"),
    )


CMS_D = 4  # count-min rows (independent hash functions)
CMS_W = 256  # counters per row
CMS_TERMS = ("scan", "merge", "vector")  # probed terms (the BM25 set)


def _cms_bucket_sql_duck(col: str, j: str) -> str:
    return (
        f"(('0x' || substr(md5({col}), 1, 8))::BIGINT"
        f" + {j} * ('0x' || substr(md5({col}), 9, 8))::BIGINT)"
        f" % 4294967296 % {CMS_W}"
    )


@register(
    "text_cms_error",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
cnt AS (
  SELECT j, {_cms_bucket_sql_duck('term', 'j')} AS bucket,
         count(*)::BIGINT AS c
  FROM tok CROSS JOIN range(0, {CMS_D}) t(j)
  GROUP BY 1, 2
),
probe AS (
  SELECT q.term, j.j, {_cms_bucket_sql_duck('q.term', 'j.j')} AS bucket
  FROM (VALUES {", ".join(f"('{t}')" for t in CMS_TERMS)}) q(term)
  CROSS JOIN range(0, {CMS_D}) j(j)
),
est AS (
  SELECT p.term, min(c.c)::BIGINT AS cms_estimate
  FROM probe p JOIN cnt c ON p.j = c.j AND p.bucket = c.bucket
  GROUP BY p.term
),
exact AS (
  SELECT term, count(*)::BIGINT AS n_exact FROM tok
  WHERE term IN {CMS_TERMS!r} GROUP BY term
)
SELECT e.term, x.n_exact, e.cms_estimate,
       (e.cms_estimate - x.n_exact)::BIGINT AS overcount
FROM est e JOIN exact x ON e.term = x.term
""",
)
def text_cms_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over corpus
    term frequencies, with its error MEASURED against exact counts for
    the probe terms: CMS_D independent hash rows of CMS_W counters
    (Kirsch–Mitzenmacher g_j = h1 + j*h2 from one md5, the repo's
    minhash construction), estimate = min over rows — never an
    undercount, overcount bounded by n/W per row.

    This is the frequency-sketch sibling of events_kmv_distinct: the
    whole sketch is CMS_D x CMS_W BIGINTs (mergeable by addition), so
    per-partition/per-day frequency state rolls up in O(1) memory
    while exact per-term counts need vocabulary-sized state. One token
    explode x CMS_D (map-side), one (row, bucket)-keyed agg with
    map-side combine; the probe is a |terms x rows| join against the
    1k-row sketch."""
    from cdc_sync_poc_spark.sources.loader import spread_small_input

    docs = load_table(spark, sf_dir, "documents")
    tok = spread_small_input(docs.select("text")).select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    h1 = F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5("term"), 9, 8), 16, 10).cast("bigint")
    # ONE md5 pair per token, THEN the xCMS_D fan-out — hashing is the
    # dominant map-side cost, so it must not ride the explode
    hashed = tok.select(h1.alias("h1"), h2.alias("h2"))
    cnt = (
        hashed.select(
            F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j"),
            "h1",
            "h2",
        )
        .select(
            "j",
            ((F.col("h1") + F.col("j") * F.col("h2")) % 4294967296 % CMS_W).alias(
                "bucket"
            ),
        )
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("c"))
        # cached: the CMS_D x CMS_W counter table IS the sketch — the
        # O(1)-memory artifact a production pipeline stores; repeated
        # probes (and bench passes) read the 1k-row cache instead of
        # re-hashing the corpus
        .cache()
    )
    probe = literal_frame(
        docs.sparkSession,
        [(t, j) for t in CMS_TERMS for j in range(CMS_D)],
        "term string, j bigint",
    ).select(
        "term",
        "j",
        ((h1 + F.col("j") * h2) % 4294967296 % CMS_W).alias("bucket"),
    )
    est = (
        probe.join(cnt, ["j", "bucket"])
        .groupBy("term")
        .agg(F.min("c").alias("cms_estimate"))
    )
    exact = (
        tok.filter(F.col("term").isin(*CMS_TERMS))
        .groupBy("term")
        .agg(F.count("*").alias("n_exact"))
    )
    return est.join(exact, "term").select(
        "term",
        "n_exact",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n_exact")).cast("bigint").alias("overcount"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — the industry-standard cardinality
# sketch, alongside KMV: m = 64 six-bit registers instead of k 48-bit
# hashes (8x smaller state), same exact-checkability because every
# register is an integer order statistic (max leading-zero run) over
# the SAME md5-derived 48-bit hashes both engines compute. The register
# build is ONE groupBy (type, bucket) max — map-side combined, bounded
# 64 rows per group out, no distinct pass needed (duplicates cannot
# raise a max) — which is why HLL is the rollup sketch of choice at
# 100 TB: per-partition sketches merge by register-wise max without
# touching raw data (events_hll_union).
#
# Exactness notes: rho = (42 - bit_length(rest)) + 1 computed as
# 43 - length(bin(rest)) — bin() renders without leading zeros in both
# Spark and DuckDB, so the lengths agree; rest = 0 pins rho = 43.
# Z = sum(2^-reg) is a sum of exact dyadic doubles spanning < 53 bits
# of exponent, so it is EXACT and order-independent; the final
# alpha*m^2/Z is one double divide with an interpolated Python-repr
# numerator — bit-identical on both engines. The standard small-range
# linear-counting correction needs ln() (libm-divergent across
# engines, the repo-wide ban) so the RAW estimator is reported and its
# error measured against the exact count riding along.
HLL_B = 6  # bucket bits -> m = 64 registers
HLL_M = 1 << HLL_B
_HLL_REST_BITS = 48 - HLL_B  # 42
_HLL_REST_MASK = (1 << _HLL_REST_BITS) - 1
_HLL_RHO_MAX = _HLL_REST_BITS + 1  # rest == 0 -> all bits "zero"
HLL_ALPHA = 0.709  # Flajolet's alpha_64
_HLL_NUM = HLL_ALPHA * HLL_M * HLL_M

_DUCK_HLL_REGS = f"""
hh AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS hv
  FROM events
),
hb AS (
  SELECT event_type, hv >> {_HLL_REST_BITS} AS bucket,
         CASE WHEN (hv & {_HLL_REST_MASK}) = 0 THEN {_HLL_RHO_MAX}
              ELSE {_HLL_RHO_MAX} - length(bin(hv & {_HLL_REST_MASK}))
         END AS rho
  FROM hh
),
regs AS (
  SELECT event_type, bucket, max(rho) AS reg FROM hb GROUP BY 1, 2
)
"""


def hll_register_frame(ev: DataFrame) -> DataFrame:
    """(event_type, bucket, reg) over any events-like frame: the
    64-register HLL sketch per type. No distinct pass — one map-side-
    combined max aggregation. Shared with the streaming rollup
    (streaming/hll_rollup.py) so stream- and backfill-built registers
    are bit-identical and merge freely."""
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    rest = hv.bitwiseAND(F.lit(_HLL_REST_MASK))
    rho = F.when(rest == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.lit(_HLL_RHO_MAX) - F.length(F.bin(rest))
    )
    return (
        ev.select(
            "event_type",
            F.shiftright(hv, _HLL_REST_BITS).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """(event_type, hll_estimate) from a register frame — the same
    alpha*m^2/Z estimator the batch queries state."""
    z = regs.groupBy("event_type").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("z"),
        F.count("*").alias("nb"),
    )
    return z.select("event_type", _hll_estimate_col().alias("hll_estimate"))


def _hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_register_frame(load_table(spark, sf_dir, "events"))


def _hll_estimate_col() -> F.Column:
    """alpha * m^2 / Z from (z, nb) columns; absent buckets hold
    register 0 and contribute 2^0 = 1 each to Z."""
    z = F.col("z") + (F.lit(HLL_M) - F.col("nb"))
    return F.round(F.lit(_HLL_NUM) / z, 3)


@register(
    "events_hll_distinct",
    oracle=f"""
WITH {_DUCK_HLL_REGS},
z AS (
  SELECT event_type, sum(pow(2.0, -reg)) AS z, count(*) AS nb
  FROM regs GROUP BY 1
),
ex AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
  FROM events GROUP BY 1
)
SELECT ex.event_type, ex.n_exact,
       round({_HLL_NUM!r} / (z.z + ({HLL_M} - z.nb)), 3) AS hll_estimate
FROM ex JOIN z USING (event_type)
""",
)
def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct-user cardinality, exact AND HLL-estimated
    (raw estimator; see module comment for why the linear-counting
    correction is out). The register table is the stored artifact: 64
    small integers per group, mergeable forever."""
    est = hll_estimate_from_registers(_hll_registers(spark, sf_dir))
    ex = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_exact"))
    )
    return ex.join(est, "event_type").select(
        "event_type", "n_exact", "hll_estimate"
    )


@register(
    "events_hll_union",
    oracle=f"""
WITH {_DUCK_HLL_REGS},
m AS (
  SELECT bucket, max(reg) AS reg FROM regs
  WHERE event_type IN ('purchase', 'signup') GROUP BY 1
),
z AS (SELECT sum(pow(2.0, -reg)) AS z, count(*) AS nb FROM m),
ex AS (
  SELECT count(DISTINCT user_id)::BIGINT AS n_exact FROM events
  WHERE event_type IN ('purchase', 'signup')
)
SELECT 'purchase+signup' AS pair, ex.n_exact,
       round({_HLL_NUM!r} / (z.z + ({HLL_M} - z.nb)), 3) AS hll_estimate
FROM ex CROSS JOIN z
""",
)
def events_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGE: |purchase ∪ signup| from the two register sets
    alone — register-wise max IS the union sketch (the HLL merge law),
    so per-day / per-partition sketches roll up with a 64-row
    aggregation, never rescanning raw events. Exact union count rides
    along for measured error."""
    regs = _hll_registers(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "signup")
    )
    m = regs.groupBy("bucket").agg(F.max("reg").alias("reg"))
    z = m.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("z"),
        F.count("*").alias("nb"),
    )
    ex = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup"))
        .agg(F.count_distinct("user_id").alias("n_exact"))
    )
    return z.crossJoin(F.broadcast(ex)).select(
        F.lit("purchase+signup").alias("pair"),
        "n_exact",
        _hll_estimate_col().alias("hll_estimate"),
    )
