"""Continuous curation pipeline — the streaming twin of
llm_curation_e2e's spine (llm/curation.py): every document micro-batch
flows through

    funnel gate -> cross-batch dedup screen -> continuous packing
                                            -> continuous epoch order

in ONE foreachBatch body, composing the four streaming components this
package already proves individually:

* the funnel verdict is a stateless map (funnel_verdict_frame) — the
  same expression tree the batch pipeline fuses into its scan;
* dedup screens the funnel SURVIVORS against the stored hash/band
  index (streaming/docs_index.py) — first-seen-wins across batches,
  and only survivors enter the index (a rejected document must not
  block a later clean re-crawl of the same content... it never reached
  the corpus);
* documents that are neither funnel-dropped nor dup-flagged continue
  each language's token stream through the carry-state packer
  (streaming/packing.py) AND receive their training-order slot from
  the carry-state epoch-shuffle assigner (streaming/train_order.py) —
  the same fresh set feeds both, so the curated corpus leaves the
  pipeline packed and ordered.

Everything inherits the per-batch overwrite idempotence of its
component (a replayed batch rewrites funnel/verdict/packed partitions
byte-identically). The batch cross-check in tests/test_streaming_docs
replays the same gates straight-line per batch and compares every
stage's output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.streaming.util import persisted

from cdc_sync_poc_spark.llm.curation import funnel_verdict_frame
from cdc_sync_poc_spark.streaming.docs_index import StreamingDedupIndex
from cdc_sync_poc_spark.streaming.packing import StreamingPacker
from cdc_sync_poc_spark.streaming.train_order import StreamingOrderAssigner


class StreamingCurator:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.funnel_dir = os.path.join(root, "funnel")
        self.idx = StreamingDedupIndex(spark, os.path.join(root, "dedup"))
        self.packer = StreamingPacker(spark, os.path.join(root, "pack"))
        self.assigner = StreamingOrderAssigner(spark, os.path.join(root, "order"))

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        with persisted(docs) as docs:
            verdicts = funnel_verdict_frame(docs).select("doc_id", "reason")
            verdicts.write.mode("overwrite").parquet(
                os.path.join(self.funnel_dir, f"batch_id={batch_id}")
            )
            kept_ids = verdicts.filter(F.col("reason") == "kept").select(
                "doc_id"
            )
            with persisted(
                docs.join(kept_ids, "doc_id", "left_semi")
            ) as survivors:
                self.idx.screen_batch(survivors, batch_id)
                fresh_ids = (
                    self.spark.read.parquet(self.idx.verdict_dir)
                    .filter(
                        (F.col("batch_id") == batch_id)
                        & (F.col("verdict") == "new")
                    )
                    .select("doc_id")
                )
                with persisted(
                    survivors.join(fresh_ids, "doc_id", "left_semi")
                ) as fresh:
                    self.packer.pack_batch(fresh, batch_id)
                    self.assigner.assign_batch(fresh, batch_id)

    def packed(self) -> DataFrame:
        return self.packer.packed()

    def order(self) -> DataFrame:
        return self.assigner.order()


def run_streaming_curation(
    spark: SparkSession, in_dir: str, root: str, checkpoint: str
):
    from cdc_sync_poc_spark.streaming.docs_dedup import doc_stream

    cur = StreamingCurator(spark, root)
    return (
        doc_stream(spark, in_dir)
        .writeStream.foreachBatch(cur.process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
