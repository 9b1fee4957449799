"""Keyed additive counters for streaming state — the generalized form
of the edge-count store inside streaming/pagerank.py, reusable for any
sum-mergeable keyed statistic (term counts, document frequencies,
n-gram tables).

Contract (two mechanisms, each carrying half the safety):

* **Deltas are replay-safe by PARTITION OWNERSHIP**: batch N writes its
  per-key sums to ``deltas/batch_id=N`` with mode=overwrite; counts are
  additive, so idempotency comes from a replayed batch overwriting its
  OWN partition byte-identically, never from merge logic.
* **Compaction is crash-safe by the WATERMARK INSIDE THE FRAME**:
  ``compact(upto)`` folds delta partitions with batch_id <= upto (plus
  any existing base) into one summed base carrying an ``upto`` column,
  swapped atomically through SwapStore; cleanup after the swap only
  removes partitions the live watermark already excludes, so a crash
  between swap and cleanup — or an at-least-once replay RECREATING an
  already-folded partition — leaves ``totals()`` unchanged (folded
  partitions are filtered out by ``batch_id > upto``, never
  double-counted).

Scale: per batch one keyed hash agg (map-side combined) and one delta
write; ``totals()`` reads base + post-watermark deltas and re-sums —
read amplification stays O(base + recent deltas), bounded by the
compaction cadence, not O(batches).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.streaming.swapstore import SwapStore


class AdditiveDeltaStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols: list[str],
        sum_cols: list[str],
        ddl: str,
        deltas_name: str = "deltas",
    ) -> None:
        self.spark = spark
        self.deltas_dir = os.path.join(root, deltas_name)
        self.base = SwapStore(spark, root, "base")
        self.key_cols = list(key_cols)
        self.sum_cols = list(sum_cols)
        self.ddl = ddl  # "key1 type, ..., sum1 bigint, ..." (no batch_id)

    def write_delta(self, agg: DataFrame, batch_id: int) -> None:
        """Persist one batch's per-key sums under its own partition."""
        agg.select(*self.key_cols, *self.sum_cols).write.mode(
            "overwrite"
        ).parquet(os.path.join(self.deltas_dir, f"batch_id={batch_id}"))

    def _delta_frame(self) -> DataFrame | None:
        if not os.path.isdir(self.deltas_dir):
            return None
        if not any(
            d.startswith("batch_id=") for d in os.listdir(self.deltas_dir)
        ):
            return None
        return self.spark.read.parquet(self.deltas_dir)

    def totals(self) -> DataFrame:
        """Accumulated per-key sums: compacted base + deltas newer than
        the base watermark, re-summed."""
        base = self.base.read()
        deltas = self._delta_frame()
        cols = self.key_cols + self.sum_cols
        if base is not None:
            upto = base.agg(F.max("upto").alias("u")).collect()[0].u
            if upto is None:
                base = None
        if deltas is not None and base is not None:
            rows = (
                deltas.filter(F.col("batch_id") > upto)
                .select(*cols)
                .unionByName(base.select(*cols))
            )
        elif base is not None:
            rows = base.select(*cols)
        elif deltas is not None:
            rows = deltas.select(*cols)
        else:
            return self.spark.createDataFrame([], self.ddl)
        return rows.groupBy(*self.key_cols).agg(
            *[F.sum(c).alias(c) for c in self.sum_cols]
        )

    def compact(self, upto_batch_id: int) -> None:
        """Fold deltas with batch_id <= ``upto_batch_id`` into the
        base; see module docstring for the crash-window analysis."""
        if upto_batch_id < 0:
            return
        base = self.base.read()
        prev_upto = (
            base.agg(F.max("upto").alias("u")).collect()[0].u
            if base is not None
            else None
        )
        if prev_upto is not None and upto_batch_id <= prev_upto:
            return  # already folded this far
        deltas = self._delta_frame()
        if deltas is None:
            return
        cols = self.key_cols + self.sum_cols
        folded = deltas.filter(
            (F.col("batch_id") <= upto_batch_id)
            & (
                F.col("batch_id") > prev_upto
                if prev_upto is not None
                else F.lit(True)
            )
        ).select(*cols)
        if base is not None:
            folded = folded.unionByName(base.select(*cols))
        new_base = (
            folded.groupBy(*self.key_cols)
            .agg(*[F.sum(c).alias(c) for c in self.sum_cols])
            .withColumn("upto", F.lit(upto_batch_id).cast("long"))
        )
        self.base.swap(new_base)
        # cleanup AFTER the swap: these partitions are now <= the live
        # watermark, so totals() already ignores them
        if os.path.isdir(self.deltas_dir):
            for d in os.listdir(self.deltas_dir):
                if d.startswith("batch_id="):
                    try:
                        bid = int(d.split("=", 1)[1])
                    except ValueError:
                        continue
                    if bid <= upto_batch_id:
                        shutil.rmtree(os.path.join(self.deltas_dir, d))
