"""Streaming document dedup — the LLM-ops twin of the CDC loop-guard
stream (M6 x §2.6): documents arrive as an unbounded append log (file
source standing in for Kafka, exactly as streaming/source.py does for
events) and near/exact duplicates are dropped across micro-batches with
Spark's stateful dedup operator.

The fingerprint must be computable WITHOUT a shuffle for streaming (the
batch dedup_simhash aggregates exploded tokens; an aggregation before
dropDuplicates would force complete/update-mode gymnastics), so
``simhash16_col`` folds the 16 bit-votes per document inside one map
expression — same md5-nibble votes, same sign rule, bit-identical
fingerprints (integer vote sums are order-independent), verified
against the batch operator in tests/test_streaming_docs.py.

State: ``dropDuplicates`` keeps one row per fingerprint forever — right
for a bounded backfill. For an endless crawl stream the bounded-state
form is :func:`streaming_exact_dedup_watermarked` /
:func:`streaming_simhash_dedup_watermarked`:
``withWatermark("ingest_ts", delay) + dropDuplicatesWithinWatermark``
evicts a fingerprint's state once the watermark passes its arrival
time + delay, so state size is O(arrival rate x delay) instead of
O(corpus). Semantics: a re-crawl inside the delay window is dropped; a
re-crawl after eviction is emitted again (exactly the contract a
rolling-window crawler wants — old content re-surfacing after months
IS a new observation). The document fixture carries no event-time
column, so the harness stamps ``ingest_ts`` at file-batch granularity;
the CDC side's watermark_dedup (streaming/dedup.py) is the same
construction keyed on the envelope hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def doc_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of documents: each new parquet file in
    ``path`` is a micro-batch of crawled/ingested docs."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def simhash16_col(text_col: str = "text") -> F.Column:
    """16-bit SimHash as ONE map-side expression (no explode, no
    aggregation): hash every token once, then fold a +1/-1 vote per bit
    position (vote +1 iff the i-th md5 hex nibble's high bit is set —
    nibble in '89abcdef') and emit the sign bit. Semantically identical
    to the batch dedup_simhash (llm/dedup.py) — integer vote sums are
    order-independent — but usable under Structured Streaming where a
    pre-dedup shuffle is not.

    All 16 votes accumulate in ONE fold whose state is the 16-element
    vote array, so each token is md5-hashed exactly once. (The
    16-separate-aggregates form re-evaluates the token-hash transform
    per bit — project-collapse inlines a repeated alias into every
    consumer, the emb_covariance_topk trap — for 16x the hash work.)"""
    votes = (
        f"aggregate(transform(split({text_col}, ' '), w -> md5(w)),"
        f" array_repeat(0, 16),"
        f" (acc, h) -> zip_with(acc, sequence(1, 16),"
        f" (a, i) -> a + IF(contains('89abcdef', substr(h, i, 1)), 1, -1)))"
    )
    return F.expr(
        f"concat_ws('', transform({votes}, v -> IF(v >= 0, '1', '0')))"
    )


def streaming_simhash_dedup(docs: DataFrame) -> DataFrame:
    """Near-dup dedup across micro-batches: map-side fingerprint +
    stateful dropDuplicates keyed by it. The first document seen per
    fingerprint survives; later arrivals (in any later micro-batch) are
    dropped by the state store."""
    return docs.withColumn("simhash16", simhash16_col()).dropDuplicates(
        ["simhash16"]
    )


def streaming_exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact-content dedup across micro-batches: sha256 of the text as
    the state key — the streaming twin of dedup_exact."""
    return docs.withColumn("content_hash", F.sha2(F.col("text"), 256)).dropDuplicates(
        ["content_hash"]
    )


DOC_INGEST_SCHEMA = T.StructType(
    DOC_SCHEMA.fields + [T.StructField("ingest_ts", T.TimestampType())]
)


def doc_stream_with_ingest(spark: SparkSession, path: str) -> DataFrame:
    """File-source document stream whose rows carry an ``ingest_ts``
    event-time column (a crawler stamps fetch time; the fixture-derived
    test batches stamp it per file)."""
    return (
        spark.readStream.schema(DOC_INGEST_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def streaming_exact_dedup_watermarked(
    docs: DataFrame, delay: str = "10 minutes"
) -> DataFrame:
    """Bounded-state exact dedup for an ENDLESS stream: state per
    content hash lives only ``delay`` past its arrival's event time —
    the production twin of :func:`streaming_exact_dedup` (whose
    unbounded ``dropDuplicates`` state is right only for a bounded
    backfill). Requires ``ingest_ts`` on the input."""
    return (
        docs.withColumn("content_hash", F.sha2(F.col("text"), 256))
        .withWatermark("ingest_ts", delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def streaming_simhash_dedup_watermarked(
    docs: DataFrame, delay: str = "10 minutes"
) -> DataFrame:
    """Bounded-state near-dup dedup: the map-side 16-bit SimHash as the
    state key under the same watermark eviction contract."""
    return (
        docs.withColumn("simhash16", simhash16_col())
        .withWatermark("ingest_ts", delay)
        .dropDuplicatesWithinWatermark(["simhash16"])
    )
