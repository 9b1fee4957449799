"""Streaming SemDeDup — the continuous form of
llm/similarity.sem_dedup, running the SAME delta algebra the batch
query sem_dedup_incremental proves against the one-shot oracle, but
per micro-batch with persisted stores:

* arriving vectors are assigned to the FROZEN coarse quantizer and
  appended to the cell-partitioned index (the shared
  StreamingIVFIndex — one state, consumed by both the ANN probes and
  this maintainer);
* each arrival's max within-cell cosine is computed against every
  LOWER-ID index member visible at arrival (prior batches + same-batch
  lower ids — deltas 1/2 of the batch query);
* arrivals RETRO-screen the existing index: a stored vector's nearest
  neighbor can be a NEW lower-id arrival, so its max_cos — and its
  ``kept`` verdict — can flip after the fact (delta 3; decontam's
  retro-screen, embedding-side).

The per-vector running max lives in a MaxDeltaStore; max is
associative, commutative AND idempotent, so a replayed batch's
overwritten delta (or even a double-counted pair) cannot corrupt the
state, and ``semdedup()`` converges to the batch sem_dedup output for
ANY arrival order — pinned in tests/test_streaming_semdedup.py with
batch splits deliberately different from sem_dedup_incremental's wave
mod, plus replay and mid-stream compaction.

Replay safety (the at-least-once foreachBatch contract shared with
streaming/decontam.py): every read of prior state excludes the current
batch's own rows (``batch_id`` rides every index row, through
compaction), and every write overwrites the batch's own partition, so
a replayed batch recomputes byte-identical deltas from identical prior
state.

Scale shape: every pair join is cell-keyed against the cell-PARTITIONED
index, so a batch's screening reads only the cells its arrivals touch
(directory-pruned) and costs O(batch x cell-occupancy) — the stored
corpus is never re-paired against itself. The max store folds with
map-side combine; its totals are one hash agg over (vecs-sized) keyed
rows. Cosines are computed from the stored (v, nrm) doubles — parquet
round-trips exactly, so the streamed verdicts are bit-identical to the
batch query's.

Cell-split interaction (documented limit, NOT implemented here):
sem_dedup verdicts are defined WITHIN a cell, so splitting a cell
(StreamingIVFIndex.split_cell — emb_ivf_resplit's action) refines the
pair domain and can only ever LOWER a vector's true max_cos — which a
monotone max store cannot express. Do not split cells under a live
SemDeDup maintainer without also re-deriving the affected cells'
max-cos state from the re-laid index (one cell-local pass, the same
cost as the split itself); the store's per-batch partitioning makes
"drop the affected keys' deltas and re-seed one" a partition-level
operation when that maintenance path is built. Absent splits, verdicts
here and in batch sem_dedup are identical (pinned by the convergence
test).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.llm.similarity import SEM_TAU
from cdc_sync_poc_spark.streaming.ann_index import StreamingIVFIndex
from cdc_sync_poc_spark.streaming.delta_store import MaxDeltaStore
from cdc_sync_poc_spark.streaming.util import persisted

_PAIR_COS = (
    "aggregate(zip_with(v, bv, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
    " (acc, z) -> acc + z)"
)


class StreamingSemDedup:
    """foreachBatch body maintaining the shared IVF index and the
    per-vector running max within-cell cosine."""

    def __init__(self, spark: SparkSession, root: str, cents_rows=None) -> None:
        self.spark = spark
        self.idx = StreamingIVFIndex(
            spark, os.path.join(root, "ivf"), cents_rows=cents_rows
        )
        self.maxcos = MaxDeltaStore(
            spark,
            root,
            key_cols=["vec_id"],
            max_cols=["max_cos"],
            ddl="vec_id bigint, max_cos double",
            deltas_name="maxcos",
            base_name="maxcos_base",
        )

    def absorb_batch(self, embs: DataFrame, batch_id: int) -> None:
        # 1. index the arrivals (idempotent partition overwrite); then
        #    read the batch BACK from the store — the stored form is
        #    the canonical state a replay would see
        self.idx.absorb_batch(embs, batch_id)
        rows = self.idx.index().select("vec_id", "cell_id", "v", "nrm", "batch_id")
        with persisted(
            rows.filter(F.col("batch_id") == batch_id).drop("batch_id")
        ) as arrivals:
            prior = rows.filter(F.col("batch_id") != batch_id).drop("batch_id")
            self._write_max_delta(arrivals, prior, batch_id)

    def _write_max_delta(
        self, arrivals: DataFrame, prior: DataFrame, batch_id: int
    ) -> None:
        def lower_pairs(hi: DataFrame, lo: DataFrame) -> DataFrame:
            b = lo.select(
                F.col("vec_id").alias("b_id"),
                F.col("cell_id").alias("b_cell"),
                F.col("v").alias("bv"),
                F.col("nrm").alias("b_nrm"),
            )
            cos = F.expr(_PAIR_COS) / (F.col("nrm") * F.col("b_nrm"))
            return hi.join(
                b,
                (F.col("cell_id") == F.col("b_cell"))
                & (F.col("b_id") < F.col("vec_id")),
            ).select("vec_id", cos.alias("cos"))

        visible = prior.unionByName(arrivals)
        delta = (
            # arrivals vs every lower-id member visible at arrival
            lower_pairs(arrivals, visible)
            # retro: stored vectors vs NEW lower-id arrivals
            .unionByName(lower_pairs(prior, arrivals))
            .groupBy("vec_id")
            .agg(F.max("cos").alias("max_cos"))
        )
        self.maxcos.write_delta(delta, batch_id)

    def compact(self, upto_batch_id: int) -> None:
        """Fold both stores' batch partitions (small-file bound +
        probe-pruned base re-layout — each store's own recipe). Only
        compact batches whose checkpoint has committed (the shared
        delta-store convention). The fold ORDER (maxcos first, index
        second) is a belt-and-braces choice, not load-bearing: a
        replay of a folded batch that lands in the crash window
        between the two folds still recovers its arrival set from the
        index store's FOLDED base, because AppendDeltaStore retains
        the batch_id column through the fold — rows.filter(batch_id ==
        bid) returns the batch's rows from the base and the recomputed
        maxcos delta is byte-identical either way (ADVICE r13 #2
        corrected the earlier claim that an index-first fold would
        surface an empty arrival set)."""
        self.maxcos.compact(upto_batch_id)
        self.idx.compact(upto_batch_id)

    def semdedup(self, tau: float = SEM_TAU) -> DataFrame:
        """Current per-vector verdicts — same columns and values as the
        batch sem_dedup over everything ingested."""
        idx = self.idx.index().select("vec_id", "cell_id")
        mc = self.maxcos.totals()
        return idx.join(mc, "vec_id", "left").select(
            "vec_id",
            "cell_id",
            F.round("max_cos", 6).alias("max_cos"),
            F.coalesce(F.col("max_cos") <= tau, F.lit(True)).alias("kept"),
        )


def run_streaming_semdedup(
    spark: SparkSession, in_dir: str, root: str, checkpoint: str, cents_rows
):
    """Wire the embedding file-stream through the SemDeDup maintainer."""
    from cdc_sync_poc_spark.streaming.ann_index import emb_stream

    body = StreamingSemDedup(spark, root, cents_rows=cents_rows)
    return (
        emb_stream(spark, in_dir)
        .writeStream.foreachBatch(
            lambda df, bid: body.absorb_batch(df, bid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
