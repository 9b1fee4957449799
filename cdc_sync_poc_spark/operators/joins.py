"""§2.3 — joins.

The reference's "joins" are per-row point lookups (FN_CONVERT_CODE one
SELECT per call) and MERGE statements; here each becomes a single
set-based join whose physical strategy Catalyst picks: broadcast hash
join for the small dims (explicit ``broadcast()`` hints), shuffled hash /
sort-merge with AQE skew handling for large-large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.cdc.envelope import CDC_CTE, cdc_view
from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table


@register(
    "j01_broadcast_lookup",
    oracle="""
SELECT s_suppkey, s_name, n_name AS nation_name, r_name AS region_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
""",
)
def j01_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi lookup join vs small dims — the set-based form of
    FN_CONVERT_CODE's per-row point lookup (composite-key PK,
    poc/tobe-oracle/init/03_create_mapping_tables.sql:20,40-59).
    Both dims broadcast: zero shuffle of the fact side."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


@register(
    "j02_merge_upsert_join",
    oracle=f"""
WITH {CDC_CTE},
state AS (
  SELECT change_hash, max(ts_ms) AS processed_ms
  FROM cdc WHERE cdc_seq % 3 <> 0 GROUP BY change_hash
),
updates AS (
  SELECT change_hash, max(ts_ms) AS update_ms
  FROM cdc WHERE cdc_seq % 3 = 0 GROUP BY change_hash
)
SELECT coalesce(s.change_hash, u.change_hash) AS change_hash,
       CASE WHEN s.change_hash IS NOT NULL AND u.change_hash IS NOT NULL THEN 'UPDATED'
            WHEN u.change_hash IS NOT NULL THEN 'INSERTED'
            ELSE 'KEPT' END AS merge_action,
       greatest(coalesce(s.processed_ms, 0), coalesce(u.update_ms, 0)) AS processed_ms
FROM state s FULL OUTER JOIN updates u ON s.change_hash = u.change_hash
""",
)
def j02_merge_upsert_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE as outer-join semantics (SP_RECORD_HASH's MERGE INTO
    CDC_PROCESSED_HASH, poc/tobe-oracle/init/04_create_procedures.sql:54-63):
    WHEN MATCHED -> UPDATE timestamp, WHEN NOT MATCHED -> INSERT.
    Pure-DataFrame formulation: full-outer join + coalesce/greatest."""
    cdc = cdc_view(spark, sf_dir)
    state = (
        cdc.filter(F.col("cdc_seq") % 3 != 0)
        .groupBy("change_hash")
        .agg(F.max("ts_ms").alias("processed_ms"))
    )
    updates = (
        cdc.filter(F.col("cdc_seq") % 3 == 0)
        .groupBy("change_hash")
        .agg(F.max("ts_ms").alias("update_ms"))
    )
    s, u = state.alias("s"), updates.alias("u")
    return s.join(u, F.col("s.change_hash") == F.col("u.change_hash"), "full_outer").select(
        F.coalesce(F.col("s.change_hash"), F.col("u.change_hash")).alias("change_hash"),
        F.when(
            F.col("s.change_hash").isNotNull() & F.col("u.change_hash").isNotNull(),
            "UPDATED",
        )
        .when(F.col("u.change_hash").isNotNull(), "INSERTED")
        .otherwise("KEPT")
        .alias("merge_action"),
        F.greatest(
            F.coalesce(F.col("s.processed_ms"), F.lit(0)),
            F.coalesce(F.col("u.update_ms"), F.lit(0)),
        ).alias("processed_ms"),
    )


@register(
    "j03_antijoin_seen",
    oracle=f"""
WITH {CDC_CTE},
seen AS (SELECT change_hash, ts FROM cdc WHERE cdc_seq % 2 = 0),
candidates AS (SELECT * FROM cdc WHERE cdc_seq % 2 = 1)
SELECT c.cdc_seq, c.pk, c.change_hash
FROM candidates c
WHERE NOT EXISTS (
  SELECT 1 FROM seen s
  WHERE s.change_hash = c.change_hash
    AND epoch_us(c.ts) - epoch_us(s.ts) BETWEEN 0 AND 300000000
)
""",
)
def j03_antijoin_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed anti join — FN_IS_LOOP as a set operation: events
    whose hash was seen by the opposite direction within the last 5 min
    are excluded (poc/asis-oracle/init/04_create_procedures.sql:31-44).
    Spark: left_anti join with an equi key (hash) + range predicate; the
    equi key keeps it a hash join, the range is a post-filter — this is
    the scalable shape (never a pure theta join)."""
    cdc = cdc_view(spark, sf_dir)
    seen = cdc.filter(F.col("cdc_seq") % 2 == 0).select(
        F.col("change_hash").alias("s_hash"), F.col("ts").alias("s_ts")
    )
    cand = cdc.filter(F.col("cdc_seq") % 2 == 1)
    cond = (
        (cand.change_hash == seen.s_hash)
        & (F.unix_micros(cand.ts) - F.unix_micros(seen.s_ts) >= 0)
        & (F.unix_micros(cand.ts) - F.unix_micros(seen.s_ts) <= 300_000_000)
    )
    return cand.join(seen, cond, "left_anti").select("cdc_seq", "pk", "change_hash")


@register(
    "j04_target_exists",
    oracle=f"""
WITH {CDC_CTE},
last AS (
  SELECT * FROM (
    SELECT pk, operation, row_number() OVER (PARTITION BY pk ORDER BY cdc_seq DESC) AS rn
    FROM cdc) WHERE rn = 1
)
SELECT l.pk, l.operation,
       CASE WHEN b.c_custkey IS NULL THEN 'TARGET_NOT_FOUND' ELSE 'FOUND' END AS target_status
FROM last l LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) b ON l.pk = b.c_custkey
WHERE l.operation IN ('UPDATE', 'DELETE')
""",
)
def j04_target_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence-check join (SQL%ROWCOUNT=0 after UPDATE/DELETE ->
    TARGET_NOT_FOUND, poc/tobe-oracle/init/04_create_procedures.sql:193-218).
    One left join replaces per-row rowcount checks; semi/anti variants
    are the two WHERE slices of this result."""
    cdc = cdc_view(spark, sf_dir)
    w = Window.partitionBy("pk").orderBy(F.desc("cdc_seq"))
    last = (
        cdc.select("cdc_seq", "pk", "operation")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("operation").isin("UPDATE", "DELETE"))
    )
    # NEVER broadcast `base`: it stands in for the target table, the side
    # that grows to 100 TB. Un-hinted, this is a shuffle join on pk (and AQE
    # may still choose to broadcast `last`, the bounded changes side).
    base = load_table(spark, sf_dir, "customer").select("c_custkey").distinct()
    return last.join(base, last.pk == base.c_custkey, "left").select(
        "pk",
        "operation",
        F.when(F.col("c_custkey").isNull(), "TARGET_NOT_FOUND")
        .otherwise("FOUND")
        .alias("target_status"),
    )


@register(
    "j05_conflict_fullouter",
    oracle=f"""
WITH {CDC_CTE},
asis AS (
  SELECT * FROM (
    SELECT pk, val AS asis_val, ts_ms AS asis_ms,
           row_number() OVER (PARTITION BY pk ORDER BY cdc_seq DESC) AS rn
    FROM cdc WHERE cdc_seq % 2 = 0) WHERE rn = 1
),
tobe AS (
  SELECT * FROM (
    SELECT pk, val AS tobe_val, ts_ms AS tobe_ms,
           row_number() OVER (PARTITION BY pk ORDER BY cdc_seq DESC) AS rn
    FROM cdc WHERE cdc_seq % 2 = 1) WHERE rn = 1
)
SELECT coalesce(a.pk, t.pk) AS pk,
       CASE WHEN a.pk IS NOT NULL AND t.pk IS NOT NULL THEN 'CONFLICT'
            WHEN a.pk IS NOT NULL THEN 'ASIS_ONLY' ELSE 'TOBE_ONLY' END AS conflict_type,
       a.asis_val, t.tobe_val
FROM asis a FULL OUTER JOIN tobe t ON a.pk = t.pk
""",
)
def j05_conflict_fullouter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer conflict detection (design-only in the reference —
    docs/02-설계/03_케이스_분류.md:399-426, 04_충돌_정책.md:100-192 —
    implemented greenfield here): simultaneous ASIS/TOBE changes on the
    same pk; overlap -> conflict, disjoint -> merge candidates."""
    cdc = cdc_view(spark, sf_dir)

    def side(parity: int, tag: str) -> DataFrame:
        w = Window.partitionBy("pk").orderBy(F.desc("cdc_seq"))
        return (
            cdc.filter(F.col("cdc_seq") % 2 == parity)
            .select("cdc_seq", "pk", "val", "ts_ms")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("pk").alias(f"{tag}_pk"),
                F.col("val").alias(f"{tag}_val"),
                F.col("ts_ms").alias(f"{tag}_ms"),
            )
        )

    a, t = side(0, "asis"), side(1, "tobe")
    return a.join(t, a.asis_pk == t.tobe_pk, "full_outer").select(
        F.coalesce(F.col("asis_pk"), F.col("tobe_pk")).alias("pk"),
        F.when(F.col("asis_pk").isNotNull() & F.col("tobe_pk").isNotNull(), "CONFLICT")
        .when(F.col("asis_pk").isNotNull(), "ASIS_ONLY")
        .otherwise("TOBE_ONLY")
        .alias("conflict_type"),
        F.col("asis_val"),
        F.col("tobe_val"),
    )


@register(
    "j06_asof_join",
    oracle=f"""
WITH {CDC_CTE},
candidates AS (
  SELECT c.cdc_seq, c.pk, c.ts, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         row_number() OVER (PARTITION BY c.cdc_seq
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM cdc c JOIN orders o
    ON c.pk = o.o_custkey AND o.o_orderdate <= c.ts
)
SELECT cdc_seq, pk, o_orderkey AS asof_orderkey,
       o_orderdate AS asof_orderdate, o_totalprice AS asof_totalprice
FROM candidates WHERE rn = 1
""",
)
def j06_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (extension — the reference has none, SURVEY §2.3 note;
    as-of semantics appear there only as the LWW policy): for each change
    event, the latest order of the same key at-or-before the event time.

    Spark lacks a native as-of join; the scalable composition is an equi
    join on the key (hash join — the range predicate stays a post-filter,
    never a theta join) + row_number per event picking the latest match.
    Per-key match counts are bounded (orders per customer), so the
    intermediate stays linear. The alternative for unbounded histories is
    applyInPandas with pd.merge_asof per key bucket."""
    cdc = cdc_view(spark, sf_dir).select("cdc_seq", "pk", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    j = cdc.join(
        orders,
        (cdc.pk == orders.o_custkey) & (orders.o_orderdate <= cdc.ts),
    )
    w = Window.partitionBy("cdc_seq").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cdc_seq",
            "pk",
            F.col("o_orderkey").alias("asof_orderkey"),
            F.col("o_orderdate").alias("asof_orderdate"),
            F.col("o_totalprice").alias("asof_totalprice"),
        )
    )


@register(
    "j07_range_join_bucketed",
    oracle="""
WITH ob AS (
  SELECT o_orderkey, o_orderdate,
         unnest(list_distinct([
           year(o_orderdate) * 12 + month(o_orderdate),
           year(o_orderdate + INTERVAL 7 DAY) * 12 + month(o_orderdate + INTERVAL 7 DAY)
         ])) AS bucket
  FROM orders WHERE o_orderpriority = '1-URGENT'
),
lb AS (
  SELECT l_orderkey, l_shipdate,
         year(l_shipdate) * 12 + month(l_shipdate) AS bucket
  FROM lineitem
)
SELECT ob.o_orderkey, count(*)::BIGINT AS n_shipped_within_7d
FROM ob JOIN lb ON ob.bucket = lb.bucket
WHERE lb.l_shipdate >= ob.o_orderdate
  AND lb.l_shipdate < ob.o_orderdate + INTERVAL 7 DAY
GROUP BY ob.o_orderkey
""",
)
def j07_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join via bucketization (extension — the reference
    has no range joins, SURVEY §2.3 note): count shipments falling in
    each urgent order's 7-day window, with NO shared key between the
    sides — a pure temporal-proximity join.

    A naive range join is a cross product; the scalable shape bucketizes
    the range key (calendar month), explodes each probe interval into
    the <=2 buckets it can overlap, equi-joins on the bucket (hash
    join), and applies the range predicate as a post-filter. Each
    (order, item) pair meets in exactly one bucket (the item's), so no
    dedup pass is needed. Work is O(sum of bucket-pair products) —
    bucket granularity is the scale lever, same as blocking keys in
    dedup."""
    mi = lambda c: F.year(c) * 12 + F.month(c)
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.explode(
                F.array_distinct(
                    F.array(
                        mi(F.col("o_orderdate")),
                        mi(F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")),
                    )
                )
            ).alias("bucket"),
        )
    )
    items = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", mi(F.col("l_shipdate")).alias("l_bucket")
    )
    return (
        orders.join(items, orders.bucket == items.l_bucket)
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_shipped_within_7d"))
    )


@register(
    "j08_salted_skew_join",
    oracle="""
SELECT p_brand, count(*)::BIGINT AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def j08_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join on the driver-checked surface (extension — the
    reference has no hot-key handling at all; its per-row lookups simply
    serialize): the fact side gets a deterministic salt from a unique
    column, the dim side explodes into one copy per salt value, and the
    join key becomes (key, salt) so one hot key spreads over ``factor``
    reducers. The oracle is the PLAIN unsalted join — the hash gate
    proves result equivalence, which is the whole contract of salting
    (functions/salting.py; equivalence holds for inner/left only, and
    salted_join rejects anything else)."""
    from cdc_sync_poc_spark.functions.salting import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li,
        part,
        F.col("l_partkey") == F.col("p_partkey"),
        unique_col="l_orderkey",
        factor=8,
    )
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )


# j09 Bloom-prefiltered semi-join parameters: 2^14 bits (256 BIGINT
# words, ~2 KB broadcast) x 4 double-hashed probes. With |dim| keys the
# false-positive rate is (1 - e^(-4|dim|/16384))^4 — resize M with the
# dim, the plan shape is unchanged.
BLOOM_BITS = 1 << 14
BLOOM_K = 4


def _bloom_positions(key: F.Column) -> list[F.Column]:
    """BLOOM_K bit positions for a key via double hashing
    (pos_i = h1 + i*h2 mod M), pmod applied per term so the arithmetic
    never overflows under ANSI mode."""
    h1 = F.pmod(F.xxhash64(key), F.lit(BLOOM_BITS))
    h2 = F.pmod(F.xxhash64(key, F.lit(1)), F.lit(BLOOM_BITS))
    return [F.pmod(h1 + i * h2, F.lit(BLOOM_BITS)) for i in range(BLOOM_K)]


@register(
    "j09_bloom_prefilter_join",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
""",
)
def j09_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join (extension — the scale pattern behind
    Spark's own runtime row-group filtering, built from public column
    functions): the selective dim side (overdrawn customers) folds into
    a ~2 KB Bloom filter — per key BLOOM_K bit positions, bit_or into
    64-bit words, map_from_entries into ONE row — which broadcasts onto
    the fact scan as a cross join, so the membership test runs MAP-SIDE
    before any shuffle of the fact table. Rows passing the Bloom check
    (all true members + the filter's false positives) then go through
    the exact semi-join, so the RESULT is exactly the plain semi-join —
    which is the oracle, same equivalence contract as j08's salting.

    At 100 TB the payoff is shuffle-volume: the fact side shrinks by
    ~|selective dim|/|fact| at the scan, and only survivors pay the
    semi-join shuffle. Fully lazy — the filter is a 1-row DataFrame
    aggregate, never a driver collect (the corpus_mix_weights /
    corpus_vocab_growth broadcast-scalar pattern, not a literal)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    prefiltered = bloom_prefilter(orders, "o_custkey", dim, "c_custkey")
    # exactness via INNER join against the unique dim key (c_custkey is
    # customer's PK, so inner == semi), NOT a left-semi:
    # PushDownLeftSemiAntiJoin pushes a semi-join below the bloom test
    # all the way to the scan (observed — the membership test became
    # dead weight ABOVE the join, exactly the single-sided-conjunct
    # split PushPredicateThroughJoin also performs), while inner joins
    # keep the authored bloom-below-join order at any scale.
    return prefiltered.join(
        dim, prefiltered.o_custkey == dim.c_custkey, "inner"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


def bloom_prefilter(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Filter ``fact`` to rows whose key MIGHT be in ``dim`` (all true
    members survive; false positives bounded by the BLOOM_BITS/BLOOM_K
    sizing). Map-side once the 1-row filter aggregate is broadcast —
    the caller follows with an exact join for exact semantics. Internal
    columns are __bloom_-prefixed so any fact schema passes through
    untouched."""
    pos = F.explode(F.array(*_bloom_positions(F.col(dim_key)))).alias("pos")
    bf = (
        dim.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("widx"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("widx", "word")))
            ).alias("__bloom_bf")
        )
    )
    hits = [
        f"((shiftright(coalesce(element_at(__bloom_bf,"
        f" cast(__bloom_p{i} / 64 as int)), 0L),"
        f" cast(__bloom_p{i} % 64 as int)) & 1) = 1)"
        for i in range(BLOOM_K)
    ]
    out_cols = fact.columns
    return (
        fact.crossJoin(F.broadcast(bf))
        .withColumns(
            {
                f"__bloom_p{i}": p
                for i, p in enumerate(_bloom_positions(F.col(fact_key)))
            }
        )
        .filter(F.expr(" AND ".join(hits)))
        .select(*out_cols)
    )
