"""ORC document source — the other columnar lake format (Hive/Trino
shops export ORC where parquet is not the house standard), mirroring
sources/csvsrc.py: a derived file under /tmp, an explicit-schema
reader, and a round-trip law as the registered oracle query.

Unlike the delimited sources there is no dialect to get wrong — the
risk ORC ingest actually carries is TYPE drift (ORC's type system is
not parquet's: no unsigned ints, different timestamp semantics), so
the reader pins an explicit schema exactly like the CSV/JSONL paths
(no inference pass over a 100 TB lake) and the round-trip oracle
compares values, not just counts.

Scale notes: Spark's native ORC reader is vectorized, stripe-splittable
(parallelism per stripe, like parquet row groups), prunes columns and
pushes predicates into stripe/row-group indexes — the same
`PushedFilters` contract tests/test_plan_contract.py checks on the
parquet scans. The derived single-file fixture stands in for a
many-file lake directory; `spark.read.orc(dir)` is the production
call, unchanged.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.orc as po
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_sync_poc_spark.registry import register

ORC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def ensure_orc(sf_dir: str) -> str:
    """Derive <tmp>/spark_graft_orc/<sf>.orc from documents.parquet
    (idempotent, atomic rename — the ensure_csv/ensure_jsonl
    contract)."""
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out_dir = os.path.join(tempfile.gettempdir(), "spark_graft_orc")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{tag}.orc")
    if os.path.exists(path):
        return path
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet")).select(
        ["doc_id", "text", "lang", "source", "n_chars"]
    )
    tbl = tbl.sort_by("doc_id").cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        )
    )
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    os.close(fd)
    po.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def read_orc_docs(spark: SparkSession, path: str) -> DataFrame:
    """The real source reader: explicit schema, vectorized native ORC."""
    return spark.read.schema(ORC_SCHEMA).orc(path)


@register(
    "source_orc_docs",
    oracle="""
SELECT doc_id, lang, source, n_chars::BIGINT AS n_chars,
       md5(text) AS text_md5
FROM documents
""",
)
def source_orc_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip law: parquet -> ORC (driver-derived) -> Spark
    native ORC source must reproduce the documents table exactly (text
    via md5) — the type-parity gate for the columnar ingest path,
    sibling of source_csv_docs / source_jsonl_docs."""
    df = read_orc_docs(spark, ensure_orc(sf_dir))
    return df.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.md5("text").alias("text_md5"),
    )
