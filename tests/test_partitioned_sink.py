"""Scale-path evidence for the lake layout: partitionBy writes create
hive-style directories whose filters become PartitionFilters (no data
read outside the hit partitions), and dynamic partition overwrite
replaces only the partitions present in the incoming batch — the
incremental-maintenance write pattern a 100 TB lake relies on
(reference contrast: the reference's sink is per-row JDBC MERGE,
CdcSyncService.java; a lake sink must get this layout right instead).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_sync_poc_spark.sources.loader import load_table
from tests.conftest import SF_DIR


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    docs = load_table(spark, SF_DIR, "documents")
    docs.write.partitionBy("lang").parquet(out)

    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = _executed_plan(back)
    # the lang predicate must be a partition filter on the scan, not a
    # post-scan data filter: pruned directory listing, zero IO on the
    # other languages
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
    want = docs.filter(F.col("lang") == "en").count()
    assert back.count() == want


def test_dynamic_partition_overwrite_touches_only_incoming(spark, tmp_path):
    out = str(tmp_path / "docs_dyn")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars", "lang")
    docs.write.partitionBy("lang").parquet(out)
    before_en = spark.read.parquet(out).filter("lang = 'en'").count()
    before_all = spark.read.parquet(out).count()

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # rewrite ONE partition with a filtered slice; overwrite mode
        # 'dynamic' must leave every other lang directory intact
        patch = docs.filter("lang = 'en' AND doc_id % 2 = 0")
        n_patch = patch.count()
        patch.write.mode("overwrite").partitionBy("lang").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    after = spark.read.parquet(out)
    assert after.filter("lang = 'en'").count() == n_patch
    # non-targeted partitions untouched
    assert after.filter("lang <> 'en'").count() == before_all - before_en
