"""Streaming corpus-wide line dedup — the ingest-time twin of
llm/cleaning.dedup_line_global (the batch query dedups a closed corpus;
this maintains the seen-segment index ACROSS micro-batches and cleans
every batch on arrival).

Production shape: the document stream hits foreachBatch; each batch
(a) explodes into the SAME LINE_WORDS segments as the batch operator
(llm/cleaning.line_segments — keys bit-identical on both paths),
(b) drops every segment already in the STORED index (one left-anti
equi-join — "first occurrence corpus-wide" where corpus = everything
that arrived before this batch), (c) resolves within-batch repeats by
the batch operator's min(doc_id, pos) winner rule, (d) writes the
reassembled cleaned documents, and (e) appends its fresh distinct
segments to the index. Per-batch cost is O(batch) + one join against
the index on the uniform segment key — the corpus is never recleaned.

Idempotence (the at-least-once foreachBatch contract): cleaned docs
and index rows land in ``batch_id=N`` partitions with mode=overwrite,
and the index probe excludes the batch's own partition, so a replayed
batch rewrites itself byte-identically — the same recipe as the
streaming dedup index (streaming/docs_index.py).

Equivalence: a corpus fed in ONE batch produces exactly
dedup_line_global's output (pinned in tests/test_streaming_docs.py);
across batches, arrival order becomes the outer keep-first order —
the online generalization of the batch operator's (doc_id, pos) order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.streaming.util import persisted
from pyspark.sql import types as T

from cdc_sync_poc_spark.llm.cleaning import (
    POS_ENC,
    line_segments,
    reassemble_kept,
)

_SEG_SCHEMA = T.StructType([T.StructField("segment", T.StringType())])


class StreamingLineDedup:
    """foreachBatch body maintaining the seen-segment index and the
    cleaned-document output under ``root``."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.seg_dir = os.path.join(root, "seg_idx")
        self.out_dir = os.path.join(root, "cleaned")

    def _seen_segments(self, exclude_batch: int) -> DataFrame:
        """Stored index minus ``exclude_batch``'s own partition (replay
        must not probe rows it wrote itself); hive-partition filter
        prunes at listing time."""
        if not os.path.isdir(self.seg_dir):  # first batch: empty index
            return self.spark.createDataFrame([], _SEG_SCHEMA)
        return (
            self.spark.read.parquet(self.seg_dir)
            .filter(F.col("batch_id") != exclude_batch)
            .select("segment")
        )

    def clean_batch(self, docs: DataFrame, batch_id: int) -> None:
        with persisted(line_segments(docs)) as seg:
            seen = self._seen_segments(batch_id)
            # fresh = first corpus-wide occurrence candidates;
            # within-batch repeats resolve by the batch operator's
            # winner rule
            fresh = seg.join(seen, "segment", "left_anti")
            enc = F.col("doc_id") * POS_ENC + F.col("pos")
            win = fresh.groupBy("segment").agg(
                F.min(F.col("doc_id") * POS_ENC + F.col("pos")).alias("w")
            )
            # persisted: winners feeds BOTH write actions (cleaned docs
            # + index append); without it each action re-reads and
            # re-probes the stored index — which grows with the corpus
            # — per batch
            with persisted(
                fresh.join(win, "segment").filter(enc == F.col("w"))
            ) as winners:
                kept = winners.select("doc_id", "pos").withColumn(
                    "kept", F.lit(True)
                )
                cleaned = reassemble_kept(
                    seg.join(kept, ["doc_id", "pos"], "left").withColumn(
                        "kept", F.coalesce("kept", F.lit(False))
                    )
                )
                cleaned.write.mode("overwrite").parquet(
                    os.path.join(self.out_dir, f"batch_id={batch_id}")
                )
                winners.select("segment").distinct().write.mode(
                    "overwrite"
                ).parquet(
                    os.path.join(self.seg_dir, f"batch_id={batch_id}")
                )

    def cleaned(self) -> DataFrame:
        return self.spark.read.parquet(self.out_dir)


def run_streaming_line_dedup(
    spark: SparkSession, in_dir: str, root: str, checkpoint: str
):
    """Wire the document file-stream through the line-dedup maintainer;
    returns the started query (availableNow for tests; production runs
    a processingTime trigger)."""
    from cdc_sync_poc_spark.streaming.docs_dedup import doc_stream

    sld = StreamingLineDedup(spark, root)
    return (
        doc_stream(spark, in_dir)
        .writeStream.foreachBatch(sld.clean_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
