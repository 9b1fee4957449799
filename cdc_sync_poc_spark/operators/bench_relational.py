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

from pyspark.sql import DataFrame, SparkSession
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
    customer (filtered) broadcasts into orders; orders->lineitem is the
    one real shuffle. Top-K via TakeOrderedAndProject, never a global
    sort."""
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
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
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
    """TPC-H Q5-shaped 5-way join: supplier/nation/region broadcast
    (dims), lineitem->orders shuffled once on orderkey. Region filter
    prunes before the join fans out."""
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
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
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
    """TPC-H Q18-shaped: group-having derives a key set that semi-joins
    back into the fact join. The `big` set is small -> AQE converts its
    join to broadcast at runtime."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    qty = F.col("l_quantity").cast(_DEC)
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sq"))
        .filter(F.col("sq") > 150)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        o.join(big, o.o_orderkey == F.col("big_key"))
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(F.sum(qty).cast("double").alias("total_qty"))
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
    once on orderkey; customer and nation broadcast; top-20 via
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
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
