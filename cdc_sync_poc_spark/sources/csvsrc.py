"""CSV document source — the delimited-export ingest path (the other
format crawl dumps and warehouse extracts arrive in), mirroring
sources/jsonl.py: explicit schema (no inference pass over a 100 TB
lake), PERMISSIVE mode with ``_corrupt_record`` quarantine, and a
round-trip law as the registered oracle query.

CSV needs what JSONL gets for free: quoting. The derived file is
written with full QUOTE_ALL + backslash escaping, and the reader is
configured with the exact same dialect — the pairing that production
pipelines get wrong most often (a text column with an embedded
delimiter/newline silently shifting columns). The round-trip oracle
(text compared by md5) is precisely the gate that catches a dialect
mismatch.
"""

from __future__ import annotations

import csv
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_sync_poc_spark.registry import register

CSV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

_READ_OPTS = {
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": "_corrupt_record",
    "header": "false",
    "quote": '"',
    "escape": "\\",
    # QUOTE_ALL legally quotes embedded newlines, so the reader MUST
    # parse records across physical lines — multiLine=false would split
    # such a document into two malformed lines and silently drop it
    # (ADVICE r4). Cost at scale: a multiLine CSV file is not
    # line-splittable, so parallelism is per FILE, not per block —
    # acceptable because delimited exports arrive as many files; the
    # block-splittable path for newline-free corpora is the JSONL
    # source (its encoder escapes newlines by construction).
    "multiLine": "true",
}


def ensure_csv(sf_dir: str) -> str:
    """Derive <tmp>/spark_graft_csv/<sf>.csv from documents.parquet
    (idempotent, atomic rename — the ensure_jsonl contract)."""
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out_dir = os.path.join(tempfile.gettempdir(), "spark_graft_csv")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{tag}.csv")
    if os.path.exists(path):
        return path
    rows = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pylist()
    rows.sort(key=lambda r: r["doc_id"])
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    os.close(fd)
    with open(tmp, "w", newline="") as f:
        w = csv.writer(
            f, quoting=csv.QUOTE_ALL, escapechar="\\", doublequote=False
        )
        for r in rows:
            w.writerow(
                [r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"]]
            )
    os.replace(tmp, path)
    return path


def read_csv_docs(spark: SparkSession, path: str) -> DataFrame:
    """The real source reader: explicit schema + the exact write
    dialect. Malformed lines land whole in ``_corrupt_record``."""
    reader = spark.read.schema(CSV_SCHEMA)
    for k, v in _READ_OPTS.items():
        reader = reader.option(k, v)
    return reader.csv(path)


@register(
    "source_csv_docs",
    oracle="""
SELECT doc_id, lang, source, n_chars::BIGINT AS n_chars,
       md5(text) AS text_md5
FROM documents
""",
)
def source_csv_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip law: parquet -> quoted CSV (driver-derived) ->
    Spark CSV source must reproduce the documents table exactly (text
    via md5) — the dialect-parity gate for the delimited ingest path,
    sibling of source_jsonl_docs."""
    df = read_csv_docs(spark, ensure_csv(sf_dir))
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
