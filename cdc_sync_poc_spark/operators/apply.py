"""§2.7 — apply / upsert semantics (the write side of the engine).

The reference applies changes row-at-a-time in PL/SQL with per-row
commits (poc/tobe-oracle/init/04_create_procedures.sql:184-232). Here the
same semantics are one set-based plan: last-change-per-key window, then a
single full-outer join against the base table. In production the write
is a Delta ``MERGE INTO`` inside ``foreachBatch``:

    MERGE INTO base USING changes ON base.pk = changes.pk
      WHEN MATCHED AND op = 'DELETE' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *              -- covers ap02 (dup INSERT)
      WHEN NOT MATCHED AND op = 'INSERT' THEN INSERT *
    -- UPDATE/DELETE on missing key: no-op + audit (ap03/ap04)

The batch final-state form below is the oracle-checkable ground truth for
that MERGE (SURVEY.md §7.3e). Scale: the join shuffles on pk (the MERGE
key); with the base table bucketed/partitioned by pk this is a co-located
join, and AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.cdc.envelope import CDC_CTE, cdc_view
from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table

_LAST_CTE = """
last AS (
  SELECT * FROM (
    SELECT cdc_seq, pk, operation, val,
           row_number() OVER (PARTITION BY pk ORDER BY cdc_seq DESC) AS rn
    FROM cdc) WHERE rn = 1
)
"""


def last_change_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key last change (s01 last-wins; ORDER BY CDC_SEQ apply order
    collapsed to final state — SURVEY.md §7.3b documents the deviation:
    intermediate states differ, final state is preserved)."""
    cdc = cdc_view(spark, sf_dir)
    w = Window.partitionBy("pk").orderBy(F.desc("cdc_seq"))
    return (
        cdc.select("cdc_seq", "pk", "operation", "val")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )


def merge_final_state(base: DataFrame, last: DataFrame) -> DataFrame:
    """MERGE-semantics final state (shared by ap01, sink_target_apply and
    pipeline_e2e).

    ``base``: (c_custkey, c_name, c_acctbal, ...); ``last``: one change
    per pk with (pk, operation, val).
    """
    j = base.join(last, base.c_custkey == last.pk, "full_outer")
    keep = ~(
        (F.col("operation") == "DELETE") & F.col("pk").isNotNull()
    ).eqNullSafe(True) & ~(
        F.col("c_custkey").isNull() & (F.col("operation") == "UPDATE")
    ).eqNullSafe(True)
    untouched = F.col("pk").isNull()
    return j.filter(keep).select(
        F.coalesce(F.col("c_custkey"), F.col("pk")).alias("pk"),
        F.when(untouched, F.col("c_name"))
        .otherwise(F.concat(F.lit("U"), F.col("pk").cast("string")))
        .alias("name"),
        F.when(untouched, F.col("c_acctbal")).otherwise(F.col("val")).alias("acctbal"),
        F.when(untouched, "BASE").otherwise("APPLIED").alias("src"),
    )


def apply_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final base-table state after applying all changes (I/U/D dispatch,
    poc/tobe-oracle/init/04_create_procedures.sql:189-232)."""
    base = load_table(spark, sf_dir, "customer")
    last = last_change_per_key(spark, sf_dir)
    return merge_final_state(base, last)


@register(
    "ap01_merge_cdc",
    oracle=f"""
WITH {CDC_CTE}, {_LAST_CTE}
SELECT coalesce(b.c_custkey, l.pk) AS pk,
       CASE WHEN l.pk IS NULL THEN b.c_name ELSE concat('U', CAST(l.pk AS VARCHAR)) END AS name,
       CASE WHEN l.pk IS NULL THEN b.c_acctbal ELSE l.val END AS acctbal,
       CASE WHEN l.pk IS NULL THEN 'BASE' ELSE 'APPLIED' END AS src
FROM customer b FULL OUTER JOIN last l ON b.c_custkey = l.pk
WHERE NOT coalesce(l.operation = 'DELETE' AND l.pk IS NOT NULL, FALSE)
  AND NOT coalesce(b.c_custkey IS NULL AND l.operation = 'UPDATE', FALSE)
""",
)
def ap01_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply I/U/D dispatch -> final state (see module docstring)."""
    return apply_final_state(spark, sf_dir)


@register(
    "ap02_ins_to_upd",
    oracle=f"""
WITH {CDC_CTE}, {_LAST_CTE}
SELECT l.pk, l.operation, 'SYNC_E_002_HANDLED' AS resolution
FROM last l JOIN (SELECT DISTINCT c_custkey FROM customer) b ON l.pk = b.c_custkey
WHERE l.operation = 'INSERT'
""",
)
def ap02_ins_to_upd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT on duplicate key -> UPDATE (DUP_VAL_ON_INDEX handler,
    poc/tobe-oracle/init/04_create_procedures.sql:221-224; error code
    SYNC_E_002, docs/02-설계/05_에러코드_체계.md:50). In MERGE terms this
    is simply WHEN MATCHED -> UPDATE; this query lists the rows that take
    that path (left-semi join against base keys)."""
    last = last_change_per_key(spark, sf_dir)
    base_keys = load_table(spark, sf_dir, "customer").select("c_custkey").distinct()
    return (
        last.filter(F.col("operation") == "INSERT")
        .join(base_keys, last.pk == base_keys.c_custkey, "left_semi")
        .select("pk", "operation", F.lit("SYNC_E_002_HANDLED").alias("resolution"))
    )


@register(
    "ap03_notfound_log",
    oracle=f"""
WITH {CDC_CTE}, {_LAST_CTE}
SELECT l.pk, l.operation, 'TARGET_NOT_FOUND' AS status,
       CASE l.operation WHEN 'UPDATE' THEN 'SYNC_E_001' ELSE 'SYNC_W_001' END AS error_code
FROM last l
WHERE l.operation IN ('UPDATE', 'DELETE')
  AND NOT EXISTS (SELECT 1 FROM customer b WHERE b.c_custkey = l.pk)
""",
)
def ap03_notfound_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE/DELETE against a missing key -> TARGET_NOT_FOUND audit row,
    pipeline continues (SQL%ROWCOUNT=0 check,
    poc/tobe-oracle/init/04_create_procedures.sql:193-202,210-218; codes
    docs/02-설계/05_에러코드_체계.md:49,54). Left-anti join against base."""
    last = last_change_per_key(spark, sf_dir)
    base = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        last.filter(F.col("operation").isin("UPDATE", "DELETE"))
        .join(base, last.pk == base.c_custkey, "left_anti")
        .select(
            "pk",
            "operation",
            F.lit("TARGET_NOT_FOUND").alias("status"),
            F.when(F.col("operation") == "UPDATE", "SYNC_E_001")
            .otherwise("SYNC_W_001")
            .alias("error_code"),
        )
    )


@register(
    "ap04_delete_idempotent",
    oracle=f"""
WITH {CDC_CTE}, {_LAST_CTE}
SELECT l.pk, 'ALREADY_DELETED_OK' AS status
FROM last l
WHERE l.operation = 'DELETE'
  AND NOT EXISTS (SELECT 1 FROM customer b WHERE b.c_custkey = l.pk)
""",
)
def ap04_delete_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE of an absent row is a warning-grade no-op (SYNC_W_001
    auto-OK, docs/02-설계/03_케이스_분류.md:155-160) — in MERGE terms a
    natural no-match no-op."""
    last = last_change_per_key(spark, sf_dir)
    base = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        last.filter(F.col("operation") == "DELETE")
        .join(base, last.pk == base.c_custkey, "left_anti")
        .select("pk", F.lit("ALREADY_DELETED_OK").alias("status"))
    )


@register(
    "ap05_exactly_once_mark",
    oracle=None,  # set below via envelope composition
)
def ap05_exactly_once_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Processed-state transitions N->Y / N->S (loop-skip) / N->E (error)
    (poc/tobe-oracle/init/04_create_procedures.sql:97,173,204). Spark's
    checkpoint replaces the flag as the progress marker (SURVEY §2.7
    ap05); the column is kept for audit parity."""
    from cdc_sync_poc_spark.cdc.envelope import classified_view

    cls = classified_view(spark, sf_dir)
    mark = (
        F.when(F.col("status") == "LOOP_BLOCKED", "S")
        .when(F.col("status") == "FAILED", "E")
        .otherwise("Y")
    )
    return cls.select("cdc_seq", "pk", mark.alias("processed_yn"))


# oracle for ap05 needs the recursive walk CTE from envelope
def _ap05_oracle() -> str:
    from cdc_sync_poc_spark.cdc.envelope import _with_walk

    return _with_walk(
        """
SELECT cdc_seq, pk,
       CASE WHEN status = 'LOOP_BLOCKED' THEN 'S'
            WHEN status = 'FAILED' THEN 'E'
            ELSE 'Y' END AS processed_yn
FROM classified
"""
    )


from cdc_sync_poc_spark.registry import ORACLES  # noqa: E402

ORACLES["ap05_exactly_once_mark"] = _ap05_oracle()
