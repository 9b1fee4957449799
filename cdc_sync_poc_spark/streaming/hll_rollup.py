"""Streaming HLL rollup — the ingest-time twin of events_hll_distinct
(operators/sketches.py): maintain the per-type 64-register sketch
ACROSS event micro-batches with O(types x 64) state and O(batch) work
per trigger, so "distinct users per event type, corpus-lifetime" is
answerable at any instant without ever rescanning raw events.

foreachBatch body: build the batch's register frame with the SAME
hll_register_frame the batch query uses (stream- and backfill-built
sketches are bit-identical), merge with the STORED registers by
register-wise max (the HLL union law), and swap the single stored
register table. Replay-idempotent with no partition bookkeeping:
max-merge is idempotent under re-union of the same rows — the same
argument as the bottom-N sampler (streaming/sampling.py), with which
it shares the crash-safe SwapStore (streaming/swapstore.py).

Equivalence: after any prefix of batches, estimate() equals
events_hll_distinct's estimator over the union of those batches
(pinned in tests/test_streaming_docs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_sync_poc_spark.operators.sketches import (
    hll_estimate_from_registers,
    hll_register_frame,
)
from cdc_sync_poc_spark.streaming.swapstore import SwapStore


class StreamingHLLRollup:
    """foreachBatch body maintaining the merged register store under
    ``root``. State lives in a SwapStore (streaming/swapstore.py) —
    the same crash matrix as the bottom-N sampler."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.store = SwapStore(spark, root, "regs")
        self.cur_dir = self.store.cur_dir
        self.tmp_dir = self.store.tmp_dir

    def _stored(self) -> DataFrame | None:
        return self.store.read()

    def absorb_batch(self, events: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        batch_regs = hll_register_frame(events)
        stored = self._stored()
        merged = (
            batch_regs
            if stored is None
            else stored.unionByName(batch_regs)
            .groupBy("event_type", "bucket")
            .agg(F.max("reg").alias("reg"))
        )
        self.store.swap(merged)

    def registers(self) -> DataFrame:
        regs = self._stored()
        if regs is None:
            raise FileNotFoundError(f"no stored registers under {self.cur_dir}")
        return regs

    def estimate(self) -> DataFrame:
        """(event_type, hll_estimate) from the stored registers."""
        return hll_estimate_from_registers(self.registers())


def run_streaming_hll_rollup(
    spark: SparkSession, in_dir: str, root: str, checkpoint: str
):
    """Wire an event file-stream through the rollup; returns the
    started query (availableNow for tests)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    roll = StreamingHLLRollup(spark, root)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(roll.absorb_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
