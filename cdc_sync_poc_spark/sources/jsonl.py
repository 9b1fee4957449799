"""JSONL document source — the crawl-dump ingest format every training
pipeline reads (one JSON object per line, schema-on-read, corrupt lines
quarantined instead of failing the job).

The fixture set carries parquet only, so the JSONL file is DERIVED from
``documents.parquet`` once per scale factor (driver-side, deterministic
key order, written atomically to a temp dir) — the registered query
then exercises the real Spark JSON source path: explicit schema (never
schema inference on a 100 TB lake — one pass saved), PERMISSIVE mode
with ``_corrupt_record`` routing (the st06 quarantine pattern at the
source boundary; tested with an injected bad line in
tests/test_jsonl_source.py), and unescaped round-trip of the text
payload. The oracle states the round-trip law: reading back the
derived JSONL must reproduce the documents table bit-for-bit, so it
simply selects from the pre-registered ``documents`` view.
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_sync_poc_spark.registry import register

JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def ensure_jsonl(sf_dir: str) -> str:
    """Derive <tmp>/spark_graft_jsonl/<sf>.jsonl from documents.parquet
    (idempotent; atomic rename so a concurrent caller never reads a
    half-written file)."""
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out_dir = os.path.join(tempfile.gettempdir(), "spark_graft_jsonl")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{tag}.jsonl")
    if os.path.exists(path):
        return path
    rows = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pylist()
    rows.sort(key=lambda r: r["doc_id"])
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    os.close(fd)
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True, separators=(",", ":")) + "\n")
    os.replace(tmp, path)
    return path


def read_jsonl_docs(spark: SparkSession, path: str) -> DataFrame:
    """The real source reader: explicit schema, PERMISSIVE corrupt-line
    routing. Valid rows parse; malformed lines land whole in
    ``_corrupt_record`` with every data column null."""
    return (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


@register(
    "source_jsonl_docs",
    oracle="""
SELECT doc_id, lang, source, n_chars::BIGINT AS n_chars,
       md5(text) AS text_md5
FROM documents
""",
)
def source_jsonl_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL round-trip law: parquet -> JSONL (driver-derived) -> Spark
    JSON source must reproduce the documents table exactly, including
    the escaped/unescaped text payload (checked via md5). This is the
    source-parity gate for the ingest format, the analog of
    src_jdbc_snapshot for the JDBC path."""
    path = ensure_jsonl(sf_dir)
    df = read_jsonl_docs(spark, path)
    # doc_id IS NOT NULL is part of the VALID-ROW CONTRACT, not just a
    # plan fix: a key-less record cannot be applied downstream, so it
    # belongs with the quarantined lines (the reference rejects key-less
    # rows the same way). It also keeps every consumer shape legal — a
    # plan whose only surviving
    # column is _corrupt_record (e.g. a bare count() after column
    # pruning) is rejected by Spark (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    # anchoring a data column keeps every consumer shape legal
    return df.filter(
        F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull()
    ).select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.md5("text").alias("text_md5"),
    )
