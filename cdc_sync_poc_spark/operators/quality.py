"""Data-quality constraint checking (M6 extension) — the Deequ/dbt-test
shape: declarative constraints over a table evaluated in as few passes
as the constraint mix allows, reported as one (constraint, violations,
passed) frame a pipeline gates a publish on.

Constraint classes and their plan cost:
* column constraints (nullness, value ranges, uniqueness) — ONE hash
  aggregate over the table computes every violation count together
  (conditional sums + count-distinct), however many constraints ride;
* referential constraints (FK orphans) — one anti-join per referenced
  dimension, each on the uniform key, dim side broadcast/shuffled at
  Catalyst's discretion.

At 100 TB that is one scan + one agg + one join per FK — the same cost
as the cheapest hand-written audit, while the constraint list stays
configuration. Counts are BIGINT; no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table


@register(
    "dq_constraint_report",
    oracle="""
WITH colstats AS (
  SELECT count(*)::BIGINT AS n_rows,
         (count(*) - count(DISTINCT o_orderkey))::BIGINT AS dup_pk,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS null_custkey,
         sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT
           AS bad_price,
         sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)::BIGINT
           AS bad_status
  FROM orders
),
orphans AS (
  SELECT count(*)::BIGINT AS fk_orphans
  FROM orders o WHERE o.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT * FROM (
  SELECT 'pk_unique' AS constraint, dup_pk AS violations FROM colstats
  UNION ALL SELECT 'custkey_not_null', null_custkey FROM colstats
  UNION ALL SELECT 'price_positive', bad_price FROM colstats
  UNION ALL SELECT 'status_in_domain', bad_status FROM colstats
  UNION ALL SELECT 'custkey_fk', fk_orphans FROM orphans
) v
""",
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report over the orders table: PK uniqueness, required
    columns, value-domain membership, range sanity, and FK integrity
    against customer — every column constraint folded into ONE
    aggregate pass, the FK check as one anti-join. The output is the
    gate a publish job asserts on (`violations == 0` per row)."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    colstats = o.agg(
        (F.count("*") - F.count_distinct("o_orderkey")).alias("dup_pk"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_custkey"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("bad_price"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
        ).alias("bad_status"),
    )
    orphans = (
        o.filter(F.col("o_custkey").isNotNull())
        .join(cust, o.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("fk_orphans"))
    )
    # stack unpivots the 1-row aggregate into the report — ONE plan
    # branch over the agg, so the single-pass cost is structural, not
    # dependent on the optimizer deduplicating four identical subtrees
    col_rows = colstats.select(
        F.expr(
            "stack(4,"
            " 'pk_unique', dup_pk,"
            " 'custkey_not_null', null_custkey,"
            " 'price_positive', bad_price,"
            " 'status_in_domain', bad_status) AS (constraint, violations)"
        )
    )
    return col_rows.unionAll(
        orphans.select(
            F.lit("custkey_fk").alias("constraint"),
            F.col("fk_orphans").alias("violations"),
        )
    )


@register(
    "dq_profile_table",
    oracle="""
SELECT * FROM (
  SELECT 'o_custkey' AS col,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
         count(DISTINCT o_custkey)::BIGINT AS n_distinct,
         CAST(min(o_custkey) AS VARCHAR) AS min_val,
         CAST(max(o_custkey) AS VARCHAR) AS max_val
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus',
         sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
         count(DISTINCT o_orderstatus)::BIGINT,
         CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority',
         sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
         count(DISTINCT o_orderpriority)::BIGINT,
         CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
  FROM orders
) p
""",
)
def dq_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (ANALYZE-style): null count, distinct count, and
    min/max per profiled column, one row per column — the statistics a
    catalog stores for CBO and a data steward reads for drift.

    Each column's stats fold into one aggregate; the per-column frames
    union into the report. Exact count_distinct here keeps the oracle
    exact; at 100 TB the production swap is approx_count_distinct
    (HLL++) per column in a SINGLE agg pass — same plan shape minus the
    distinct expands. Min/max stringified so heterogeneous column types
    share one report schema."""
    o = load_table(spark, sf_dir, "orders")

    def prof(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col"),
            F.sum(F.col(col).isNull().cast("long")).alias("n_nulls"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            F.min(F.col(col)).cast("string").alias("min_val"),
            F.max(F.col(col)).cast("string").alias("max_val"),
        )

    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    out = prof(cols[0])
    for c in cols[1:]:
        out = out.unionAll(prof(c))
    return out


@register(
    "maint_partition_stats",
    oracle="""
WITH per_day AS (
  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n_rows
  FROM events GROUP BY CAST(ts AS DATE)
),
tot AS (SELECT sum(n_rows)::BIGINT AS n, count(*)::BIGINT AS d FROM per_day)
SELECT p.day, p.n_rows,
       round(CAST(p.n_rows AS DOUBLE) * t.d / t.n, 6) AS skew_factor,
       p.n_rows * t.d > 2 * t.n AS is_hot
FROM per_day p, tot t
""",
)
def maint_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout audit for a date-partitioned lake: rows per
    day-partition, each partition's skew factor (share of rows vs the
    uniform expectation), and a hot-partition flag (>2x uniform) — the
    report that decides repartitioning, salting (j08), or AQE skew
    hints BEFORE a join degrades.

    ONE fact scan: the 1-row total derives from the partitions-sized
    per-day aggregate itself (sum of counts / row count), not a second
    pass over events — the two consumers share the per_day subtree
    through ReusedExchange. The skew comparison is integer
    cross-multiplication (n_rows * n_partitions vs factor * total),
    exact at any scale."""
    ev = load_table(spark, sf_dir, "events")
    per_day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n_rows")
    )
    tot = per_day.agg(
        F.sum("n_rows").alias("n"), F.count("*").alias("d")
    )
    return per_day.crossJoin(F.broadcast(tot)).select(
        "day",
        "n_rows",
        F.round(
            F.col("n_rows").cast("double") * F.col("d") / F.col("n"), 6
        ).alias("skew_factor"),
        (F.col("n_rows") * F.col("d") > 2 * F.col("n")).alias("is_hot"),
    )
