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
