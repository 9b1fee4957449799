"""foreachBatch MERGE writer (SURVEY §2.7 ap01-ap05, streaming side).

Per micro-batch (the 5 s trigger replaces the reference's Oracle
Scheduler job, st04):

1. last-wins per key within the batch (s01 — makes the apply
   order-insensitive inside a batch),
2. MERGE into the base table (ap01): without Delta Lake in this
   environment, MERGE is realized as overwrite-by-join — read current
   state, full-outer join the changes, write the new state. With Delta/
   Iceberg available the same step is a real ``MERGE INTO`` (row-level
   upsert, no full rewrite); the join logic is byte-identical
   (operators/apply.py::merge_final_state).
3. audit append (sink_audit_log) + TARGET_NOT_FOUND log (ap03).

Scale note: overwrite-by-join rewrites the table per batch — fine for a
PoC-parity harness, wrong at 100 TB; the production writer is Delta
MERGE on a table partitioned by key range so each batch touches only
the files holding changed keys (plus deletion vectors to avoid
rewrites). The reference's per-row commits
(04_create_procedures.sql:99) have no scale path at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ParquetMergeWriter:
    """MERGE-into-parquet state maintainer for foreachBatch."""

    def __init__(self, spark: SparkSession, state_dir: str, audit_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        self.audit_dir = audit_dir

    def init_state(self, base: DataFrame) -> None:
        base.select(
            F.col("c_custkey").alias("pk"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
        ).write.mode("overwrite").parquet(self.state_dir)

    def current_state(self) -> DataFrame:
        return self.spark.read.parquet(self.state_dir)

    def apply_batch(self, changes: DataFrame, batch_id: int) -> None:
        """The foreachBatch body: last-wins -> merge -> audit."""
        w = Window.partitionBy("pk").orderBy(F.desc("cdc_seq"))
        last = (
            changes.select("cdc_seq", "pk", "operation", "val")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        state = self.current_state()
        j = state.join(last, state.pk == last.pk, "full_outer")
        s_pk, l_pk = state.pk, last.pk
        keep = ~((F.col("operation") == "DELETE") & l_pk.isNotNull()).eqNullSafe(
            True
        ) & ~(s_pk.isNull() & (F.col("operation") == "UPDATE")).eqNullSafe(True)
        untouched = l_pk.isNull()
        merged = j.filter(keep).select(
            F.coalesce(s_pk, l_pk).alias("pk"),
            F.when(untouched, F.col("name"))
            .otherwise(F.concat(F.lit("U"), l_pk.cast("string")))
            .alias("name"),
            F.when(untouched, F.col("acctbal")).otherwise(F.col("val")).alias(
                "acctbal"
            ),
        )
        tmp = self.state_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)

        # audit BEFORE swapping state: the plan scans the current state
        # dir lazily. Every change row gets a status (sink_audit_log
        # parity): UPDATE/DELETE on a missing key -> TARGET_NOT_FOUND
        # (ap03), everything else -> SUCCESS (INSERT on an existing key
        # is the ap02 dup->update path, still SUCCESS).
        state_keys = state.select(F.col("pk").alias("state_pk"))
        audit = last.join(
            state_keys, last.pk == state_keys.state_pk, "left"
        ).select(
            "cdc_seq",
            "pk",
            "operation",
            F.when(
                F.col("operation").isin("UPDATE", "DELETE")
                & F.col("state_pk").isNull(),
                "TARGET_NOT_FOUND",
            )
            .otherwise("SUCCESS")
            .alias("status"),
            F.lit(batch_id).alias("batch_id"),
        )
        audit.write.mode("append").parquet(self.audit_dir)

        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.state_dir)


def run_stream_pipeline(
    spark: SparkSession,
    events_path: str,
    base: DataFrame,
    out_dir: str,
    trigger: dict | None = None,
    dedup: str = "watermark",
):
    """Wire source -> cdc view -> loop dedup -> foreachBatch merge.
    Returns the started StreamingQuery. Default trigger availableNow for
    tests; production uses processingTime='5 seconds' (st04).

    dedup: 'watermark' (built-in first-seen-wins, production default) or
    'stateful' (applyInPandasWithState, exact sequential semantics with
    blocked rows dropped before the merge)."""
    from cdc_sync_poc_spark.streaming.dedup import stateful_dedup, watermark_dedup
    from cdc_sync_poc_spark.streaming.source import file_event_stream, stream_cdc_view

    writer = ParquetMergeWriter(
        spark,
        state_dir=os.path.join(out_dir, "state"),
        audit_dir=os.path.join(out_dir, "audit"),
    )
    writer.init_state(base)
    cdc = stream_cdc_view(file_event_stream(spark, events_path))
    if dedup == "stateful":
        deduped = stateful_dedup(cdc).filter("NOT loop_blocked").drop("loop_blocked")
    else:
        deduped = watermark_dedup(cdc)
    q = (
        deduped.writeStream.foreachBatch(writer.apply_batch)
        .option("checkpointLocation", os.path.join(out_dir, "checkpoint"))
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    return q, writer
