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
    rows = [
        colstats.select(
            F.lit("pk_unique").alias("constraint"),
            F.col("dup_pk").alias("violations"),
        ),
        colstats.select(
            F.lit("custkey_not_null").alias("constraint"),
            F.col("null_custkey").alias("violations"),
        ),
        colstats.select(
            F.lit("price_positive").alias("constraint"),
            F.col("bad_price").alias("violations"),
        ),
        colstats.select(
            F.lit("status_in_domain").alias("constraint"),
            F.col("bad_status").alias("violations"),
        ),
        orphans.select(
            F.lit("custkey_fk").alias("constraint"),
            F.col("fk_orphans").alias("violations"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out
