"""Streaming sources (SURVEY §2.1 src_kafka_cdc, streaming twin).

Production shape — one streaming DataFrame per sync direction:

    spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribePattern", "asis\\..*|tobe\\..*")   # 6 topics
        .option("startingOffsets", "earliest")               # application.yml:24-25
        .option("maxOffsetsPerTrigger", 100_000)             # st07 backpressure
        .load()

(Checkpointing replaces the reference's consumer-group auto-commit;
at-least-once becomes exactly-once through idempotent MERGE applies.)

No Kafka broker exists in this environment, so the tested harness is the
file source below: identical downstream semantics (an unbounded append
log with offsets), which is the point — every operator downstream of the
source is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def file_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of event rows (the test stand-in for Kafka):
    each new parquet file in ``path`` is a micro-batch of change events."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def kafka_event_stream(
    spark: SparkSession, bootstrap: str, pattern: str = "asis\\..*|tobe\\..*"
) -> DataFrame:
    """Kafka CDC source (CdcKafkaConsumer.java:60-107 as one readStream).
    Requires a broker + the spark-sql-kafka package; import-gated."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribePattern", pattern)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", 100_000)
        .load()
    )


def stream_cdc_view(events: DataFrame) -> DataFrame:
    """The streaming twin of cdc.envelope.cdc_view — same expressions,
    applied to an unbounded DataFrame (they are ordinary Column exprs, so
    they work identically on batch and stream)."""
    from cdc_sync_poc_spark.functions.hashing import change_hash

    et = F.col("event_type")
    op = (
        F.when(et == "signup", "c")
        .when(et == "view", "r")
        .when(et.isin("click", "purchase"), "u")
        .otherwise("d")
    )
    operation = (
        F.when(et.isin("signup", "view"), "INSERT")
        .when(et.isin("click", "purchase"), "UPDATE")
        .otherwise("DELETE")
    )
    pk = F.col("user_id") * 11
    return events.select(
        F.col("event_id").alias("cdc_seq"),
        pk.alias("pk"),
        op.alias("op"),
        operation.alias("operation"),
        F.col("ts"),
        F.col("value").alias("val"),
        change_hash(
            "customer", pk, operation, F.format_string("%.2f", F.col("value"))
        ).alias("change_hash"),
    )
