"""Slowly-changing-dimension Type-2 history from the CDC stream — the
audit/history table a sync target keeps alongside the merged current
state (the reference only keeps current rows plus a log; SCD2 is the
standard warehouse answer to "what was this row worth on date X").

Semantics: every INSERT/UPDATE event opens a version; the version
closes at the NEXT event of ANY kind on the same pk (an UPDATE
supersedes it, a DELETE terminates it without opening a new version).
The still-open version of a pk whose last event is not a DELETE is
current. Ordering is per-pk by cdc_seq — the same per-key order every
apply operator uses; no global ordering is assumed (§2.7 ap01's
last-wins note).

Scale: one shuffle on pk, one window pass for the closing bound
(``lead`` over the per-pk sequence), map-only otherwise — identical
physical shape to the last-wins apply, so it co-locates with the MERGE
when the target is bucketed by pk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.cdc.envelope import CDC_CTE, cdc_view
from cdc_sync_poc_spark.registry import register


@register(
    "ap07_scd2_history",
    oracle=f"""
WITH {CDC_CTE},
b AS (
  SELECT cdc_seq, pk, operation, ts_ms, val,
         lead(ts_ms) OVER (PARTITION BY pk ORDER BY cdc_seq) AS next_ms,
         lead(cdc_seq) OVER (PARTITION BY pk ORDER BY cdc_seq) AS next_seq
  FROM cdc
)
SELECT cdc_seq AS version_seq, pk, val,
       ts_ms AS valid_from_ms,
       next_ms AS valid_to_ms,
       (next_seq IS NULL) AS is_current
FROM b
WHERE operation <> 'DELETE'
""",
)
def ap07_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 version table: (pk, version) rows with
    [valid_from_ms, valid_to_ms) validity — open-ended (NULL valid_to)
    iff no later event exists for the pk; DELETE events close the prior
    version and contribute no row of their own."""
    cdc = cdc_view(spark, sf_dir)
    w = Window.partitionBy("pk").orderBy("cdc_seq")
    b = cdc.select("cdc_seq", "pk", "operation", "ts_ms", "val").select(
        "*",
        F.lead("ts_ms").over(w).alias("next_ms"),
        F.lead("cdc_seq").over(w).alias("next_seq"),
    )
    return b.filter(F.col("operation") != "DELETE").select(
        F.col("cdc_seq").alias("version_seq"),
        "pk",
        "val",
        F.col("ts_ms").alias("valid_from_ms"),
        F.col("next_ms").alias("valid_to_ms"),
        F.col("next_seq").isNull().alias("is_current"),
    )


@register(
    "ap10_pit_lookup",
    oracle=f"""
WITH {CDC_CTE},
b AS (
  SELECT cdc_seq, pk, operation, ts_ms, val,
         lead(ts_ms) OVER (PARTITION BY pk ORDER BY cdc_seq) AS next_ms
  FROM cdc
),
hist AS (
  SELECT cdc_seq AS version_seq, pk, val, ts_ms AS f, next_ms AS t
  FROM b WHERE operation <> 'DELETE'
),
probe AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS a FROM cdc)
SELECT h.pk, h.version_seq, h.val, probe.a AS asof_ms
FROM hist h, probe
WHERE h.f <= probe.a AND (h.t IS NULL OR h.t > probe.a)
""",
)
def ap10_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD2 history (ap07): the state
    of every key AS OF a probe instant (here the midpoint of the
    stream's ts range, derived as exact integer arithmetic so both
    engines probe the identical millisecond). This is the time-travel
    read an audit or training-data-freeze needs — "what did the table
    look like at T" — answered from the version table alone, no replay.

    Scale: history is pk-partitioned (one window shuffle, shared shape
    with ap07); the AS-OF probe is a broadcast 1-row constant and the
    validity test [valid_from <= t < valid_to) is a map-side filter —
    at most one version survives per key by interval construction. On
    a valid_from-partitioned lake layout the filter prunes partitions
    newer than T before any read."""
    cdc = cdc_view(spark, sf_dir)
    w = Window.partitionBy("pk").orderBy("cdc_seq")
    hist = (
        cdc.select("cdc_seq", "pk", "operation", "ts_ms", "val")
        .select("*", F.lead("ts_ms").over(w).alias("next_ms"))
        .filter(F.col("operation") != "DELETE")
    )
    asof = cdc.agg(
        F.expr("(min(ts_ms) + max(ts_ms)) div 2").alias("a")
    )
    return (
        hist.crossJoin(F.broadcast(asof))
        .filter(
            (F.col("ts_ms") <= F.col("a"))
            & (F.col("next_ms").isNull() | (F.col("next_ms") > F.col("a")))
        )
        .select(
            "pk",
            F.col("cdc_seq").alias("version_seq"),
            "val",
            F.col("a").alias("asof_ms"),
        )
    )
