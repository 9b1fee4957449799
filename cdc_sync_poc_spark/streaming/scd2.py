"""Streaming SCD Type-2 history writer (the foreachBatch twin of batch
``ap07_scd2_history``, operators/scd.py:47).

The reference's apply path keeps only current rows plus a log
(poc/tobe-oracle/init/04_create_procedures.sql:184-232 is
history-destroying); SCD2 is the standard lake-side upgrade. The batch
operator re-derives the whole version table from the full changelog;
this writer maintains the same table INCREMENTALLY, one micro-batch at
a time, with the invariant (tested in tests/test_streaming.py):

    history after processing batches 0..N  ==  ap07 over events 0..N

Design — closed rows are immutable, so split the state:

* ``closed/batch_id=B/`` — versions whose closing event has been seen.
  A version closes at most once, in the batch that delivers its
  successor event, so closed rows are APPEND-ONLY; each batch writes
  its own partition with mode=overwrite, making replays idempotent
  (same recipe as the merge writer's audit partitions).
* ``open`` (SwapStore, streaming/swapstore.py) — at most one open
  version per live pk, plus a sentinel row (pk IS NULL) carrying
  ``committed_batch``: the id of the last batch whose swap completed.
  The sentinel makes the commit marker survive an empty open set (a
  changelog ending in DELETEs for every key).

Per batch: events for a pk are windowed together with that pk's open
version (re-injected as a pseudo-event ordered by its version_seq), the
``lead`` pass closes what got superseded, the last non-DELETE event per
pk stays open. Exactly-once: the closed partition is written BEFORE the
open swap, and a replayed batch whose marker says committed >= batch_id
returns immediately — so "swap committed" implies "closed written", and
a crash in any earlier window replays against the pre-batch open state
(SwapStore heals half-swaps) and rewrites identical output.

Ordering assumption (same as the merge writer): micro-batches deliver
each key's events in cdc_seq order across batches — true for a Kafka
key-partitioned topic and for the file source's ordered parts.

Scale: per batch the shuffle is (batch rows + open rows), keyed by pk.
The open set is one row per live key — the same scale as the merge
writer's state table; at 100 TB the upgrade is the same too: hash-bucket
the open store by pk and rewrite only touched buckets
(ParquetMergeWriter's layout), keeping the whole-swap SwapStore for the
marker. Closed partitions compact with the maintenance compactor
(sources/maintenance.py) like any append log.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_sync_poc_spark.streaming.swapstore import SwapStore

_OPEN_SCHEMA = T.StructType(
    [
        T.StructField("version_seq", T.LongType()),
        T.StructField("pk", T.LongType()),
        T.StructField("val", T.DoubleType()),
        T.StructField("valid_from_ms", T.LongType()),
        T.StructField("committed_batch", T.LongType()),
    ]
)


class Scd2StreamWriter:
    """foreachBatch body maintaining an SCD2 version table incrementally."""

    def __init__(self, spark: SparkSession, out_dir: str) -> None:
        self.spark = spark
        self.closed_dir = os.path.join(out_dir, "scd2_closed")
        self.open_store = SwapStore(spark, out_dir, "scd2_open")

    # -- state reads ------------------------------------------------------

    def _open_state(self) -> tuple[DataFrame, int | None]:
        """(open version rows, committed batch id or None if no commit yet)."""
        cur = self.open_store.read()
        if cur is None:
            empty = self.spark.createDataFrame([], _OPEN_SCHEMA)
            return empty.drop("committed_batch"), None
        committed = cur.agg(F.max("committed_batch")).first()[0]
        return (
            cur.filter(F.col("pk").isNotNull()).drop("committed_batch"),
            committed,
        )

    def history(self) -> DataFrame:
        """The full SCD2 table, ap07-shaped: (version_seq, pk, val,
        valid_from_ms, valid_to_ms, is_current)."""
        open_rows, _ = self._open_state()
        out = open_rows.select(
            "version_seq",
            "pk",
            "val",
            "valid_from_ms",
            F.lit(None).cast("long").alias("valid_to_ms"),
            F.lit(True).alias("is_current"),
        )
        if os.path.isdir(self.closed_dir):
            closed = (
                self.spark.read.parquet(self.closed_dir)
                .drop("batch_id")
                .withColumn("is_current", F.lit(False))
            )
            out = closed.unionByName(out)
        return out

    # -- the foreachBatch body -------------------------------------------

    def apply_batch(self, changes: DataFrame, batch_id: int) -> None:
        open_prev, committed = self._open_state()
        if committed is not None and committed >= batch_id:
            return  # fully-committed batch replayed after a checkpoint loss

        rows = changes.select(
            "cdc_seq",
            "pk",
            "operation",
            F.expr("unix_micros(ts) div 1000").alias("ts_ms"),
            "val",
        )
        batch_pks = rows.select("pk").distinct()
        # the open version re-enters the window as a pseudo-event: its
        # version_seq slots it BEFORE every batch event of its key (the
        # cross-batch ordering assumption), so lead() closes it with the
        # first successor exactly as the batch window would have
        pseudo = open_prev.join(batch_pks, "pk").select(
            F.col("version_seq").alias("cdc_seq"),
            "pk",
            F.lit("OPEN").alias("operation"),
            F.col("valid_from_ms").alias("ts_ms"),
            "val",
        )
        w = Window.partitionBy("pk").orderBy("cdc_seq")
        vers = (
            pseudo.unionByName(rows)
            .select(
                "*",
                F.lead("ts_ms").over(w).alias("next_ms"),
                F.lead("cdc_seq").over(w).alias("next_seq"),
            )
            .filter(F.col("operation") != "DELETE")
            .persist()
        )
        newly_closed = vers.filter(F.col("next_seq").isNotNull()).select(
            F.col("cdc_seq").alias("version_seq"),
            "pk",
            "val",
            F.col("ts_ms").alias("valid_from_ms"),
            F.col("next_ms").alias("valid_to_ms"),
        )
        # closed BEFORE swap: the commit marker then proves this write
        newly_closed.write.mode("overwrite").parquet(
            os.path.join(self.closed_dir, f"batch_id={batch_id}")
        )

        new_open = vers.filter(F.col("next_seq").isNull()).select(
            F.col("cdc_seq").alias("version_seq"),
            "pk",
            "val",
            F.col("ts_ms").alias("valid_from_ms"),
        )
        kept = open_prev.join(batch_pks, "pk", "left_anti")
        sentinel = self.spark.createDataFrame(
            [(None, None, None, None)],
            T.StructType(_OPEN_SCHEMA.fields[:4]),
        )
        open_next = (
            kept.unionByName(new_open)
            .unionByName(sentinel)
            .withColumn("committed_batch", F.lit(batch_id).cast("long"))
        )
        self.open_store.swap(open_next)
        vers.unpersist()


def run_scd2_stream(
    spark: SparkSession, events_path: str, out_dir: str, trigger: dict | None = None
):
    """Wire file source -> cdc view -> SCD2 history writer. Returns
    (StreamingQuery, writer); default availableNow trigger for tests."""
    from cdc_sync_poc_spark.streaming.source import file_event_stream, stream_cdc_view

    writer = Scd2StreamWriter(spark, out_dir)
    cdc = stream_cdc_view(file_event_stream(spark, events_path))
    q = (
        cdc.writeStream.foreachBatch(writer.apply_batch)
        .option("checkpointLocation", os.path.join(out_dir, "scd2_checkpoint"))
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    return q, writer
