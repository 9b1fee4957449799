"""§2.8 — conflict resolution policies.

Designed in the reference's docs but never implemented
(docs/02-설계/04_충돌_정책.md; case matrix 03_케이스_분류.md) — built
greenfield here as declarative DataFrame ops. The two "sides" are
derived deterministically from the cdc view: ASIS = even cdc_seq,
TOBE = odd cdc_seq, each collapsed to last-change-per-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.cdc.envelope import CDC_CTE, cdc_view
from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import literal_frame, load_table

_SIDES_CTE = f"""
asis AS (
  SELECT * FROM (
    SELECT pk, operation AS asis_op, val AS asis_val, ts_ms AS asis_ms,
           row_number() OVER (PARTITION BY pk ORDER BY cdc_seq DESC) AS rn
    FROM cdc WHERE cdc_seq % 2 = 0) WHERE rn = 1
),
tobe AS (
  SELECT * FROM (
    SELECT pk, operation AS tobe_op, val AS tobe_val, ts_ms AS tobe_ms,
           row_number() OVER (PARTITION BY pk ORDER BY cdc_seq DESC) AS rn
    FROM cdc WHERE cdc_seq % 2 = 1) WHERE rn = 1
)
"""


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    cdc = cdc_view(spark, sf_dir)

    def side(parity: int, tag: str) -> DataFrame:
        w = Window.partitionBy("pk").orderBy(F.desc("cdc_seq"))
        return (
            cdc.filter(F.col("cdc_seq") % 2 == parity)
            .select("cdc_seq", "pk", "operation", "val", "ts_ms")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("pk").alias(f"{tag}_pk"),
                F.col("operation").alias(f"{tag}_op"),
                F.col("val").alias(f"{tag}_val"),
                F.col("ts_ms").alias(f"{tag}_ms"),
            )
        )

    return side(0, "asis"), side(1, "tobe")


@register(
    "cf01_lww",
    oracle=f"""
WITH {CDC_CTE}, {_SIDES_CTE}
SELECT coalesce(a.pk, t.pk) AS pk,
       CASE WHEN t.pk IS NULL THEN 'ASIS'
            WHEN a.pk IS NULL THEN 'TOBE'
            WHEN a.asis_ms >= t.tobe_ms THEN 'ASIS' ELSE 'TOBE' END AS winner,
       CASE WHEN t.pk IS NULL THEN a.asis_val
            WHEN a.pk IS NULL THEN t.tobe_val
            WHEN a.asis_ms >= t.tobe_ms THEN a.asis_val ELSE t.tobe_val END AS winner_val,
       CASE WHEN t.pk IS NULL THEN a.asis_ms
            WHEN a.pk IS NULL THEN t.tobe_ms
            WHEN a.asis_ms >= t.tobe_ms THEN a.asis_ms ELSE t.tobe_ms END AS winner_ms
FROM asis a FULL OUTER JOIN tobe t ON a.pk = t.pk
""",
)
def cf01_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-Writer-Wins (docs/02-설계/04_충돌_정책.md:18,164-172):
    the later source timestamp wins; ties resolve to ASIS
    (deterministic tiebreak, documented engine policy)."""
    a, t = _sides(spark, sf_dir)
    j = a.join(t, a.asis_pk == t.tobe_pk, "full_outer")
    asis_wins = F.col("asis_ms") >= F.col("tobe_ms")
    return j.select(
        F.coalesce(F.col("asis_pk"), F.col("tobe_pk")).alias("pk"),
        F.when(F.col("tobe_pk").isNull(), "ASIS")
        .when(F.col("asis_pk").isNull(), "TOBE")
        .when(asis_wins, "ASIS")
        .otherwise("TOBE")
        .alias("winner"),
        F.when(F.col("tobe_pk").isNull(), F.col("asis_val"))
        .when(F.col("asis_pk").isNull(), F.col("tobe_val"))
        .when(asis_wins, F.col("asis_val"))
        .otherwise(F.col("tobe_val"))
        .alias("winner_val"),
        F.when(F.col("tobe_pk").isNull(), F.col("asis_ms"))
        .when(F.col("asis_pk").isNull(), F.col("tobe_ms"))
        .when(asis_wins, F.col("asis_ms"))
        .otherwise(F.col("tobe_ms"))
        .alias("winner_ms"),
    )


@register(
    "cf02_sys_priority",
    oracle=f"""
WITH {CDC_CTE}, {_SIDES_CTE}
SELECT coalesce(a.pk, t.pk) AS pk,
       coalesce(a.asis_val, t.tobe_val) AS resolved_val,
       CASE WHEN a.pk IS NOT NULL THEN 'ASIS' ELSE 'TOBE' END AS winning_system
FROM asis a FULL OUTER JOIN tobe t ON a.pk = t.pk
""",
)
def cf02_sys_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed system priority (ASIS wins when both changed,
    docs/02-설계/04_충돌_정책.md:19-20,173-178) — a coalesce in
    priority order."""
    a, t = _sides(spark, sf_dir)
    j = a.join(t, a.asis_pk == t.tobe_pk, "full_outer")
    return j.select(
        F.coalesce(F.col("asis_pk"), F.col("tobe_pk")).alias("pk"),
        F.coalesce(F.col("asis_val"), F.col("tobe_val")).alias("resolved_val"),
        F.when(F.col("asis_pk").isNotNull(), "ASIS")
        .otherwise("TOBE")
        .alias("winning_system"),
    )


@register(
    "cf03_field_merge",
    oracle=f"""
WITH {CDC_CTE}, {_SIDES_CTE}
SELECT b.c_custkey AS pk,
       CASE WHEN a.pk IS NOT NULL THEN concat('A', CAST(a.pk AS VARCHAR))
            ELSE b.c_name END AS name_merged,
       CASE WHEN t.pk IS NOT NULL THEN t.tobe_val ELSE b.c_acctbal END AS bal_merged
FROM customer b
JOIN (SELECT pk FROM asis UNION SELECT pk FROM tobe) chg ON b.c_custkey = chg.pk
LEFT JOIN asis a ON b.c_custkey = a.pk
LEFT JOIN tobe t ON b.c_custkey = t.pk
""",
)
def cf03_field_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level merge of disjoint column updates (ASIS changed `name`,
    TOBE changed `balance` -> both apply;
    docs/02-설계/04_충돌_정책.md:21,196-214, 03_케이스_분류.md:379-426):
    full-outer join + per-column coalesce of the changed side."""
    a, t = _sides(spark, sf_dir)
    base = load_table(spark, sf_dir, "customer")
    changed = (
        a.select(F.col("asis_pk").alias("pk"))
        .union(t.select(F.col("tobe_pk").alias("pk")))
        .distinct()
    )
    j = (
        base.join(changed, base.c_custkey == changed.pk, "inner")
        .drop("pk")
        .join(a, base.c_custkey == a.asis_pk, "left")
        .join(t, base.c_custkey == t.tobe_pk, "left")
    )
    return j.select(
        F.col("c_custkey").alias("pk"),
        F.when(
            F.col("asis_pk").isNotNull(),
            F.concat(F.lit("A"), F.col("asis_pk").cast("string")),
        )
        .otherwise(F.col("c_name"))
        .alias("name_merged"),
        F.when(F.col("tobe_pk").isNotNull(), F.col("tobe_val"))
        .otherwise(F.col("c_acctbal"))
        .alias("bal_merged"),
    )


@register(
    "cf04_upd_vs_del",
    oracle=f"""
WITH {CDC_CTE}, {_SIDES_CTE}
SELECT a.pk, a.asis_op, t.tobe_op,
       CASE WHEN a.asis_op = 'DELETE' OR t.tobe_op = 'DELETE' THEN 'DELETE'
            WHEN a.asis_ms >= t.tobe_ms THEN 'APPLY_ASIS' ELSE 'APPLY_TOBE' END AS action
FROM asis a JOIN tobe t ON a.pk = t.pk
""",
)
def cf04_upd_vs_del(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE-vs-DELETE races under DELETE_PRIORITY
    (docs/02-설계/04_충돌_정책.md:217-270): any delete wins; U-vs-U falls
    back to LWW."""
    a, t = _sides(spark, sf_dir)
    j = a.join(t, a.asis_pk == t.tobe_pk, "inner")
    return j.select(
        F.col("asis_pk").alias("pk"),
        "asis_op",
        "tobe_op",
        F.when(
            (F.col("asis_op") == "DELETE") | (F.col("tobe_op") == "DELETE"), "DELETE"
        )
        .when(F.col("asis_ms") >= F.col("tobe_ms"), "APPLY_ASIS")
        .otherwise("APPLY_TOBE")
        .alias("action"),
    )


_POLICY_ROWS = [
    ("customer", "val", "UPDATE_UPDATE", "LWW", 1),
    ("customer", "ALL", "ALL", "SOURCE_PRIORITY", 2),
    ("ALL", "ALL", "ALL", "MANUAL", 3),
]

_POLICY_VALUES = (
    "(VALUES ('customer', 'val', 'UPDATE_UPDATE', 'LWW', 1), "
    "('customer', 'ALL', 'ALL', 'SOURCE_PRIORITY', 2), "
    "('ALL', 'ALL', 'ALL', 'MANUAL', 3)) "
    "AS p(table_name, column_name, conflict_type, policy, specificity)"
)


@register(
    "cf05_policy_lookup",
    oracle=f"""
WITH {CDC_CTE}, {_SIDES_CTE},
conflicts AS (
  SELECT a.pk,
         CASE WHEN a.asis_op = 'DELETE' OR t.tobe_op = 'DELETE'
              THEN 'UPDATE_DELETE' ELSE 'UPDATE_UPDATE' END AS conflict_type
  FROM asis a JOIN tobe t ON a.pk = t.pk
),
ranked AS (
  SELECT c.pk, c.conflict_type, p.policy,
         row_number() OVER (PARTITION BY c.pk ORDER BY p.specificity) AS rn
  FROM conflicts c
  JOIN {_POLICY_VALUES}
    ON (p.table_name = 'customer' OR p.table_name = 'ALL')
   AND (p.column_name = 'val' OR p.column_name = 'ALL')
   AND (p.conflict_type = c.conflict_type OR p.conflict_type = 'ALL')
)
SELECT pk, conflict_type, policy FROM ranked WHERE rn = 1
""",
)
def cf05_policy_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical policy resolution (SYNC_CONFLICT_POLICY: column-level
    beats table-level, typed match beats 'ALL',
    docs/02-설계/04_충돌_정책.md:45-61,100-143): broadcast join to the
    policy dim + row_number over specificity rank."""
    a, t = _sides(spark, sf_dir)
    conflicts = a.join(t, a.asis_pk == t.tobe_pk, "inner").select(
        F.col("asis_pk").alias("pk"),
        F.when(
            (F.col("asis_op") == "DELETE") | (F.col("tobe_op") == "DELETE"),
            "UPDATE_DELETE",
        )
        .otherwise("UPDATE_UPDATE")
        .alias("conflict_type"),
    )
    policy = literal_frame(
        spark,
        _POLICY_ROWS,
        ["table_name", "column_name", "p_conflict_type", "policy", "specificity"],
    )
    cond = (
        F.col("table_name").isin("customer", "ALL")
        & F.col("column_name").isin("val", "ALL")
        & (
            (F.col("p_conflict_type") == F.col("conflict_type"))
            | (F.col("p_conflict_type") == "ALL")
        )
    )
    w = Window.partitionBy("pk").orderBy("specificity")
    return (
        conflicts.join(F.broadcast(policy), cond)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pk", "conflict_type", "policy")
    )


@register(
    "cf06_pk_split",
    oracle=f"""
WITH {CDC_CTE},
keyed AS (
  SELECT 'ASIS' AS side, pk AS seq_val FROM cdc WHERE cdc_seq % 2 = 0
  UNION ALL
  SELECT 'TOBE' AS side, pk + 1000000000 AS seq_val FROM cdc WHERE cdc_seq % 2 = 1
)
SELECT side, count(*)::BIGINT AS n_keys,
       count(*) FILTER (WHERE (side = 'ASIS' AND seq_val >= 1000000000)
                           OR (side = 'TOBE' AND seq_val < 1000000000))::BIGINT AS n_violations
FROM keyed GROUP BY side
""",
)
def cf06_pk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-range collision avoidance (ASIS sequences 1..1e9, TOBE 1e9..,
    docs/02-설계/03_케이스_분류.md:330-336) — range-filter validation of
    both key populations."""
    cdc = cdc_view(spark, sf_dir)
    asis = cdc.filter(F.col("cdc_seq") % 2 == 0).select(
        F.lit("ASIS").alias("side"), F.col("pk").alias("seq_val")
    )
    tobe = cdc.filter(F.col("cdc_seq") % 2 == 1).select(
        F.lit("TOBE").alias("side"), (F.col("pk") + 1_000_000_000).alias("seq_val")
    )
    violation = (
        (F.col("side") == "ASIS") & (F.col("seq_val") >= 1_000_000_000)
    ) | ((F.col("side") == "TOBE") & (F.col("seq_val") < 1_000_000_000))
    return (
        asis.unionByName(tobe)
        .groupBy("side")
        .agg(
            F.count("*").alias("n_keys"),
            F.count_if(violation).alias("n_violations"),
        )
    )
