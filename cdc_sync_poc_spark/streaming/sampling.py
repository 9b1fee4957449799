"""Streaming exactly-N uniform sampling — the ingest-time twin of
llm/curation.sample_fixed_n, exploiting the bottom-k property: "the N
smallest hash draws of a union" equals "the N smallest of (stored
bottom-N union batch bottom-N)", so a micro-batch pipeline maintains an
exact corpus-wide uniform sample with N rows of state and O(batch)
work per trigger — no replay, no corpus rescan, ever.

foreachBatch body: hash the batch (same md5 draw as the batch
operator, so stream and backfill agree row-for-row), take the batch's
bottom-N, merge with the STORED bottom-N, keep the overall bottom-N,
and overwrite the single stored-sample file. Overwrite-idempotent
under replay: merging a batch twice is a no-op (bottom-k is
idempotent under re-union of the same rows) — at-least-once delivery
needs no partition bookkeeping at all here, unlike the append-style
indexes (streaming/docs_index.py), because the state IS the whole
output and the merge is an idempotent fold.

Equivalence: after any prefix of batches, the stored sample equals
sample_fixed_n's bottom-N over the union of those batches (pinned in
tests/test_streaming_docs.py) — the same associativity argument as the
KMV sketch union (operators/sketches.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.llm.curation import SAMPLE_FIXED_N


class StreamingSampler:
    """foreachBatch body maintaining the exact bottom-N sample under
    ``root``."""

    def __init__(
        self, spark: SparkSession, root: str, n: int = SAMPLE_FIXED_N
    ) -> None:
        self.spark = spark
        self.n = n
        self.cur_dir = os.path.join(root, "sample")
        self.tmp_dir = os.path.join(root, "sample_next")

    def _stored(self) -> DataFrame | None:
        if not os.path.isdir(self.cur_dir):
            # crash recovery: a crash between the swap's rmtree and
            # rename leaves only the (complete, already-flushed) next
            # state in tmp_dir — finish the rename it was about to do,
            # so the sampler never restarts from an empty state.
            # Promote ONLY a complete write (Spark's _SUCCESS marker):
            # a crash mid-FIRST-write also leaves cur missing + tmp
            # present, but tmp is partial — promoting it would poison
            # the sampler permanently. Partial tmp is deleted and the
            # batch replays from the checkpoint.
            if os.path.isdir(self.tmp_dir):
                if os.path.exists(os.path.join(self.tmp_dir, "_SUCCESS")):
                    os.rename(self.tmp_dir, self.cur_dir)
                else:
                    import shutil

                    shutil.rmtree(self.tmp_dir)
                    return None
            else:
                return None
        return self.spark.read.parquet(self.cur_dir)

    def absorb_batch(self, docs: DataFrame, batch_id: int) -> None:
        hk = F.md5(F.col("doc_id").cast("string"))
        batch_bottom = (
            docs.select("doc_id", "lang", "source", hk.alias("hk"))
            .orderBy("hk", "doc_id")
            .limit(self.n)
        )
        stored = self._stored()
        merged = (
            batch_bottom
            if stored is None
            else stored.unionByName(batch_bottom)
            # a replayed batch re-unions rows already present; distinct
            # makes the fold idempotent before the bottom-N cut
            .distinct()
        )
        out = merged.orderBy("hk", "doc_id").limit(self.n)
        # write-then-swap (the compactor's two-phase recipe): a crash
        # mid-WRITE leaves cur untouched; a crash mid-SWAP (after the
        # rmtree, before the rename) is healed by _stored's tmp->cur
        # recovery — at every instant a complete copy of the state
        # exists on disk
        out.write.mode("overwrite").parquet(self.tmp_dir)
        if os.path.isdir(self.cur_dir):
            import shutil

            shutil.rmtree(self.cur_dir)
        os.rename(self.tmp_dir, self.cur_dir)

    def sample(self) -> DataFrame:
        out = self._stored()  # routes through the tmp->cur recovery
        if out is None:
            raise FileNotFoundError(f"no stored sample under {self.cur_dir}")
        return out


def run_streaming_sampler(
    spark: SparkSession, in_dir: str, root: str, checkpoint: str, n: int = SAMPLE_FIXED_N
):
    """Wire the document file-stream through the sampler; returns the
    started query (availableNow for tests)."""
    from cdc_sync_poc_spark.streaming.docs_dedup import doc_stream

    smp = StreamingSampler(spark, root, n)
    return (
        doc_stream(spark, in_dir)
        .writeStream.foreachBatch(smp.absorb_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
