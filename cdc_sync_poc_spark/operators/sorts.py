"""§2.5 — sorts / limits / top-K / set ops / last-wins windows.

Spark plans every ORDER BY + LIMIT here as TakeOrderedAndProject:
per-partition top-K, then a K-row merge on the driver — no global sort,
which is the only shape that survives 100 TB. The last-wins window (s01)
shuffles once on the partition key and sorts within partitions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.cdc.envelope import CDC_CTE, _with_walk, cdc_view, classified_view
from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import literal_frame, load_table


@register(
    "s01_order_by_seq",
    oracle=f"""
WITH {CDC_CTE}
SELECT pk, cdc_seq AS last_seq, operation, val
FROM (
  SELECT pk, cdc_seq, operation, val,
         row_number() OVER (PARTITION BY pk ORDER BY cdc_seq DESC) AS rn
  FROM cdc)
WHERE rn = 1
""",
)
def s01_order_by_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY CDC_SEQ apply order (poc/tobe-oracle/init/
    04_create_procedures.sql:84,110,151,186) re-expressed as per-key
    last-wins: a row_number window over (pk, cdc_seq DESC). Arrival-order
    total sort is replaced by per-key order — intermediate states differ,
    final state is identical (SURVEY §7.3b), and the plan is
    embarrassingly parallel."""
    cdc = cdc_view(spark, sf_dir)
    w = Window.partitionBy("pk").orderBy(F.desc("cdc_seq"))
    return (
        cdc.select("pk", "cdc_seq", "operation", "val")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pk", F.col("cdc_seq").alias("last_seq"), "operation", "val")
    )


@register(
    "s02_topn_desc",
    oracle=f"""
WITH {CDC_CTE}
SELECT cdc_seq, operation, pk FROM cdc ORDER BY cdc_seq DESC LIMIT 20
""",
)
def s02_topn_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N newest browse (ORDER BY CDC_SEQ DESC FETCH FIRST 20,
    SimulatorController.java:133-135,174-176)."""
    cdc = cdc_view(spark, sf_dir)
    return cdc.select("cdc_seq", "operation", "pk").orderBy(F.desc("cdc_seq")).limit(20)


@register(
    "s03_ring_buffer",
    oracle=f"""
WITH {CDC_CTE}
SELECT cdc_seq, pk, ts FROM cdc WHERE operation = 'DELETE'
ORDER BY ts DESC, cdc_seq DESC LIMIT 100
""",
)
def s03_ring_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded recent-N error buffer (100-cap ring buffer,
    CdcMonitoringService.java:41-47,159-171) — a mutable newest-first
    buffer collapses to ORDER BY ... LIMIT over the audit stream."""
    cdc = cdc_view(spark, sf_dir)
    return (
        cdc.filter(F.col("operation") == "DELETE")
        .select("cdc_seq", "pk", "ts")
        .orderBy(F.desc("ts"), F.desc("cdc_seq"))
        .limit(100)
    )


@register(
    "s04_union_merge_sort",
    oracle=_with_walk(
        """
, tagged AS (
  SELECT cdc_seq, status, 'ASIS' AS source_db,
         CASE WHEN cdc_seq % 7 = 0 THEN NULL ELSE ts END AS log_time
  FROM classified WHERE cdc_seq % 2 = 0
  UNION ALL
  SELECT cdc_seq, status, 'TOBE' AS source_db,
         CASE WHEN cdc_seq % 7 = 0 THEN NULL ELSE ts END AS log_time
  FROM classified WHERE cdc_seq % 2 = 1
)
SELECT cdc_seq, status, source_db, log_time FROM tagged
ORDER BY log_time DESC NULLS LAST, cdc_seq DESC LIMIT 50
"""
    ),
)
def s04_union_merge_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION of both sides' sync logs + tag + desc-nulls-last sort + 50
    cap (SimulatorController.java:214-246)."""
    cls = classified_view(spark, sf_dir)
    log_time = F.when(F.col("cdc_seq") % 7 == 0, F.lit(None)).otherwise(F.col("ts"))
    asis = (
        cls.filter(F.col("cdc_seq") % 2 == 0)
        .select("cdc_seq", "status", F.lit("ASIS").alias("source_db"),
                log_time.alias("log_time"))
    )
    tobe = (
        cls.filter(F.col("cdc_seq") % 2 == 1)
        .select("cdc_seq", "status", F.lit("TOBE").alias("source_db"),
                log_time.alias("log_time"))
    )
    return (
        asis.unionByName(tobe)
        .orderBy(F.desc_nulls_last("log_time"), F.desc("cdc_seq"))
        .limit(50)
    )


@register(
    "s05_first_nonpk",
    oracle="SELECT 'customer' AS table_name, 'c_name' AS first_non_pk_col",
)
def s05_first_nonpk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First non-PK column pick per schema order
    (SimulatorController.java:436-439) — driver-side schema metadata, not
    a distributed op; exposed for surface parity."""
    cust = load_table(spark, sf_dir, "customer")
    first_nonpk = cust.columns[1]
    return literal_frame(
        spark, [("customer", first_nonpk)], ["table_name", "first_non_pk_col"]
    )
