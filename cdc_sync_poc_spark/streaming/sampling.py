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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.llm.curation import SAMPLE_FIXED_N
from cdc_sync_poc_spark.streaming.swapstore import SwapStore


class StreamingSampler:
    """foreachBatch body maintaining the exact bottom-N sample under
    ``root``. State lives in a SwapStore (streaming/swapstore.py):
    rename-aside swap, _SUCCESS-guarded roll-forward, partial first
    writes never promoted — see that module for the crash matrix."""

    def __init__(
        self, spark: SparkSession, root: str, n: int = SAMPLE_FIXED_N
    ) -> None:
        self.spark = spark
        self.n = n
        self.store = SwapStore(spark, root, "sample")
        self.cur_dir = self.store.cur_dir
        self.tmp_dir = self.store.tmp_dir

    def _stored(self) -> DataFrame | None:
        return self.store.read()

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
        self.store.swap(merged.orderBy("hk", "doc_id").limit(self.n))

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
