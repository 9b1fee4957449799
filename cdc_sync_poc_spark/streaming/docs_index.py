"""Streaming incremental dedup index — the ingest-time twin of
llm/dedup.dedup_incremental (the batch query screens one incoming slice
against a corpus index; this maintains that index ACROSS micro-batches
and screens every batch on arrival).

Production shape: the crawler's document stream hits foreachBatch; each
batch (a) probes the STORED index — a distinct-content-hash table and a
MinHash band table written by all prior batches — with two left-semi
equi-joins, (b) writes a three-way verdict (exact / near / new) per
document, and (c) appends its own hashes and band keys to the index.
Per-batch cost is O(batch) scan + two joins against the index,
partition-prunable on band_id — the corpus is NEVER re-deduplicated.

Idempotence (the at-least-once foreachBatch contract): verdicts and
index rows land in ``batch_id=N`` partition directories with
mode=overwrite, so a replayed batch rewrites its own partition
byte-identically instead of double-inserting — the same recipe as the
CDC writer's audit sink (streaming/writer.py).

Within-batch duplicates deliberately screen against the PRIOR index
only (both copies verdict 'new' and both enter the index) — exactly
dedup_incremental's contract, where intra-batch dedup is the separate
batch-dedup pass (dedup_exact / dedup_minhash_lsh) run on the batch
itself.

Fingerprints reuse the batch family's exact machinery
(llm/dedup._shingles -> _minhash_sig -> _band_frame, Kirsch–
Mitzenmacher signatures, BAND_SIZE bands), so a document's band keys
are bit-identical whether it arrived by stream or by backfill — the
index is interchangeable between the two paths (pinned in
tests/test_streaming_docs.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.streaming.util import persisted
from pyspark.sql import types as T

from cdc_sync_poc_spark.llm.dedup import (
    BAND_SIZE,
    _band_frame,
    _minhash_sig,
    _shingles,
)

_HASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("h", T.StringType()),
    ]
)
_BAND_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band_id", T.IntegerType()),
        T.StructField("band_key", T.StringType()),
    ]
)


class StreamingDedupIndex:
    """foreachBatch body maintaining the (hash, band) dedup index and
    per-batch screening verdicts under ``root``."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.hash_dir = os.path.join(root, "hash_idx")
        self.band_dir = os.path.join(root, "band_idx")
        self.verdict_dir = os.path.join(root, "verdicts")

    def _read_index(
        self, path: str, schema: T.StructType, exclude_batch: int
    ) -> DataFrame:
        """The stored index minus ``exclude_batch``'s own partition — a
        replayed batch must not probe rows it wrote itself (every doc
        would re-verdict as an exact dup on retry). The filter is on
        the hive partition column, so it prunes at LISTING time."""
        if not os.path.isdir(path):  # first batch: empty index
            return self.spark.createDataFrame([], schema)
        cols = [f.name for f in schema.fields]
        return (
            self.spark.read.parquet(path)
            .filter(F.col("batch_id") != exclude_batch)
            .select(*cols)
        )

    def screen_batch(self, docs: DataFrame, batch_id: int) -> None:
        with persisted(docs) as docs:
            hashes = docs.select("doc_id", F.md5("text").alias("h"))
            # cache=False: a micro-batch plan never repeats, so the
            # library's batch-sharing cache would leak an entry per batch
            # for the stream's lifetime (VERDICT r11 #1).
            bands = _band_frame(
                _minhash_sig(_shingles(docs), cache=False), BAND_SIZE
            ).select(
                "doc_id", "band_id", "band_key"
            )

            idx_h = self._read_index(self.hash_dir, _HASH_SCHEMA, batch_id)
            idx_b = self._read_index(self.band_dir, _BAND_SCHEMA, batch_id)

            ex = hashes.join(
                idx_h.select("h").distinct(), "h", "left_semi"
            ).select("doc_id", F.lit(True).alias("exact_dup"))
            nr = (
                bands.join(
                    idx_b.select("band_id", "band_key"),
                    ["band_id", "band_key"],
                    "left_semi",
                )
                .select("doc_id")
                .distinct()
                .select("doc_id", F.lit(True).alias("near_dup"))
            )
            verdicts = (
                docs.select("doc_id")
                .join(ex, "doc_id", "left")
                .join(nr, "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
                    F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
                    F.when(F.coalesce("exact_dup", F.lit(False)), "exact")
                    .when(F.coalesce("near_dup", F.lit(False)), "near")
                    .otherwise("new")
                    .alias("verdict"),
                )
            )
            verdicts.write.mode("overwrite").parquet(
                os.path.join(self.verdict_dir, f"batch_id={batch_id}")
            )
            hashes.write.mode("overwrite").parquet(
                os.path.join(self.hash_dir, f"batch_id={batch_id}")
            )
            bands.write.mode("overwrite").parquet(
                os.path.join(self.band_dir, f"batch_id={batch_id}")
            )

    def verdicts(self) -> DataFrame:
        return self.spark.read.parquet(self.verdict_dir)


def run_streaming_dedup_index(
    spark: SparkSession, in_dir: str, root: str, checkpoint: str
):
    """Wire the document file-stream through the index maintainer;
    returns the started query (availableNow for tests; production runs
    a processingTime trigger)."""
    from cdc_sync_poc_spark.streaming.docs_dedup import doc_stream

    idx = StreamingDedupIndex(spark, root)
    return (
        doc_stream(spark, in_dir)
        .writeStream.foreachBatch(idx.screen_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
