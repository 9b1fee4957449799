"""§2.4 — aggregations (monitoring counters & browse stats).

The reference keeps these as in-memory AtomicLongs and per-key maps
(CdcMonitoringService.java:34-47) or ad-hoc GROUP BY SQL
(SimulatorController.java:261-297). Here each is a hash aggregate with
map-side partial aggregation — the shuffle moves one row per (key,
partition), not per event, which is what makes the counters viable at
100 TB. Sums over monetary doubles are computed over DECIMAL inputs
(exact, order-independent) then cast to double, so results are bit-stable
regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.cdc.envelope import _with_walk, classified_view
from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table


@register(
    "a01_global_counters",
    oracle=_with_walk(
        """
SELECT count(*)::BIGINT AS total_received,
       count(*) FILTER (WHERE status = 'SUCCESS')::BIGINT AS total_success,
       count(*) FILTER (WHERE status IN ('FAILED', 'TARGET_NOT_FOUND'))::BIGINT AS total_failed,
       CASE WHEN count(*) > 0
            THEN round(count(*) FILTER (WHERE status = 'SUCCESS') * 100.0::DOUBLE / count(*), 4)
            ELSE 0.0 END AS success_rate
FROM classified
"""
    ),
)
def a01_global_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global received/success/failed + guarded success-rate
    (CdcMonitoringService.java:34-36,54-57,115-125)."""
    cls = classified_view(spark, sf_dir)
    received = F.count("*")
    success = F.count_if(F.col("status") == "SUCCESS")
    failed = F.count_if(F.col("status").isin("FAILED", "TARGET_NOT_FOUND"))
    return cls.agg(
        received.alias("total_received"),
        success.alias("total_success"),
        failed.alias("total_failed"),
        F.when(received > 0, F.round(success * 100.0 / received, 4))
        .otherwise(0.0)
        .alias("success_rate"),
    )


@register(
    "a02_group_by_topic",
    oracle=_with_walk(
        """
SELECT concat('asis.ASIS_USER.', upper(op)) AS topic,
       count(*)::BIGINT AS received,
       count(*) FILTER (WHERE status = 'SUCCESS')::BIGINT AS success,
       count(*) FILTER (WHERE status <> 'SUCCESS')::BIGINT AS failed
FROM classified GROUP BY 1
"""
    ),
)
def a02_group_by_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-topic lazily-created counters (TableStats,
    CdcMonitoringService.java:39,155-157,189-195) as one hash aggregate."""
    cls = classified_view(spark, sf_dir)
    return (
        cls.withColumn("topic", F.concat(F.lit("asis.ASIS_USER."), F.upper("op")))
        .groupBy("topic")
        .agg(
            F.count("*").alias("received"),
            F.count_if(F.col("status") == "SUCCESS").alias("success"),
            F.count_if(F.col("status") != "SUCCESS").alias("failed"),
        )
    )


@register(
    "a03_group_by_status",
    oracle=_with_walk(
        """
SELECT status, count(*)::BIGINT AS cnt
FROM classified
WHERE upper('customer') LIKE '%CUST%'
GROUP BY status
"""
    ),
)
def a03_group_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY STATUS with an UPPER(...) LIKE table filter
    (SimulatorController.java:270-284)."""
    cls = classified_view(spark, sf_dir)
    return (
        cls.withColumn("table_name", F.lit("customer"))
        .filter(F.upper(F.col("table_name")).like("%CUST%"))
        .groupBy("status")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "a04_max_last_ts",
    oracle=_with_walk(
        """
SELECT operation,
       max(CASE WHEN status = 'SUCCESS' THEN ts END) AS last_success,
       max(CASE WHEN status <> 'SUCCESS' THEN ts END) AS last_error
FROM classified GROUP BY operation
"""
    ),
)
def a04_max_last_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lastSuccess/lastError per key — conditional MAX aggregates
    (CdcMonitoringService.java:66,88,193-194)."""
    cls = classified_view(spark, sf_dir)
    return cls.groupBy("operation").agg(
        F.max(F.when(F.col("status") == "SUCCESS", F.col("ts"))).alias("last_success"),
        F.max(F.when(F.col("status") != "SUCCESS", F.col("ts"))).alias("last_error"),
    )


@register(
    "a05_next_id",
    oracle="SELECT coalesce(max(o_orderkey), 0) + 1 AS next_id FROM orders",
)
def a05_next_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NVL(MAX(pk),0)+1 PK allocation (SimulatorController.java:337-340).
    Scale note: fine as a query; as a generator it serializes — a real
    pipeline uses monotonically_increasing_id or a key service."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        (F.coalesce(F.max("o_orderkey"), F.lit(0)) + 1).alias("next_id")
    )


@register(
    "a06_min_max_filtered",
    oracle="""
SELECT min(o_orderkey) AS min_id,
       max(CASE WHEN o_orderkey > 3 THEN o_orderkey END) AS max_id_protected
FROM orders
""",
)
def a06_min_max_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN / filtered MAX protecting seed rows
    (SimulatorController.java:422-424,500-508)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.min("o_orderkey").alias("min_id"),
        F.max(F.when(F.col("o_orderkey") > 3, F.col("o_orderkey"))).alias(
            "max_id_protected"
        ),
    )


@register(
    "a07_count_union",
    oracle="""
SELECT 'customer' AS table_name, count(*)::BIGINT AS n FROM customer
UNION ALL SELECT 'orders', count(*)::BIGINT FROM orders
UNION ALL SELECT 'lineitem', count(*)::BIGINT FROM lineitem
UNION ALL SELECT 'supplier', count(*)::BIGINT FROM supplier
UNION ALL SELECT 'nation', count(*)::BIGINT FROM nation
""",
)
def a07_count_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-count report via UNION ALL of per-table counts
    (poc/asis-oracle/init/05_insert_sample_data.sql:38-44)."""
    parts = []
    for name in ("customer", "orders", "lineitem", "supplier", "nation"):
        t = load_table(spark, sf_dir, name)
        parts.append(
            t.agg(F.count("*").alias("n")).select(
                F.lit(name).alias("table_name"), F.col("n")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "a08_exists_count",
    oracle="""
SELECT ((SELECT count(*) FROM events WHERE event_type = 'error') > 0) AS loop_detected,
       ((SELECT count(*) FROM customer WHERE c_custkey = 1) > 0) AS user_exists
""",
)
def a08_exists_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) used as EXISTS (loop check
    poc/asis-oracle/init/04_create_procedures.sql:37-42; user-exists
    00_setup_user.sql:13). Spark planner stops early via limit-1
    semantics when expressed as a semi-join; here the scalar form."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    loops = ev.filter(F.col("event_type") == "error").agg(
        (F.count("*") > 0).alias("loop_detected")
    )
    users = cust.filter(F.col("c_custkey") == 1).agg(
        (F.count("*") > 0).alias("user_exists")
    )
    return loops.crossJoin(users)


@register(
    "a09_percentiles",
    oracle="""
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type
""",
)
def a09_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per key (extension beyond the
    reference's counters — latency/value distribution monitoring a real
    sync service needs). Spark's `percentile` and DuckDB's quantile_cont
    share the (n-1)*p linear-interpolation definition and match
    bit-exactly. At 100 TB the exact form sorts per group; the scale
    path is `approx_percentile` (t-digest) once cross-engine hash
    parity is no longer the gate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.count("*").alias("n"),
    )


@register(
    "a10_pivot_report",
    oracle="""
SELECT l_returnflag,
       cast(sum(CASE WHEN l_linestatus = 'O' THEN cast(l_quantity as decimal(18,2)) END) as double) AS qty_o,
       cast(sum(CASE WHEN l_linestatus = 'F' THEN cast(l_quantity as decimal(18,2)) END) as double) AS qty_f
FROM lineitem GROUP BY l_returnflag
""",
)
def a10_pivot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivoted matrix report (extension; the reference renders these
    dashboards in Java). Spark's .pivot with explicit values compiles to
    conditional aggregates — one pass, no extra shuffle versus the flat
    group-by; explicit value lists avoid the extra distinct-values job."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(qty).cast("double"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_o"),
            F.col("F").alias("qty_f"),
        )
    )


@register(
    "a11_rollup_report",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def a11_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals (extension): per (flag, status), per flag, and
    grand total in one pass — Catalyst expands the grouping sets into a
    single aggregate over replicated rows; at scale this beats three
    separate aggregation jobs reading the fact table thrice."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum(qty).cast("double").alias("sum_qty")
    )


@register(
    "a12_incremental_rollup",
    oracle="""
WITH cdc AS (
  SELECT event_id AS cdc_seq,
         concat('asis.ASIS_USER.', upper(
           CASE event_type WHEN 'signup' THEN 'c' WHEN 'view' THEN 'r'
                WHEN 'click' THEN 'u' WHEN 'purchase' THEN 'u'
                ELSE 'd' END)) AS topic,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT topic, count(*)::BIGINT AS n_events,
       sum(cents)::BIGINT AS sum_cents,
       min(cents)::BIGINT AS min_cents,
       max(cents)::BIGINT AS max_cents
FROM cdc GROUP BY topic
""",
)
def a12_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-topic rollup
    is computed as yesterday's state (even cdc_seq) MERGED with
    today's delta batch (odd cdc_seq) — count/sum merge by addition,
    min/max by min/max — and the oracle states the IVM law: the merged
    rollup must equal a full recompute over all events. This is how a
    100 TB monitoring table stays current per micro-batch instead of
    rescanning history (the reference recomputes its counters from
    scratch on every poll, CdcMonitoringService.java).

    The merge itself is a full-outer join on the topic key with
    coalesced partial columns — the same shape foreachBatch uses
    against a stored rollup. Non-decomposable aggregates (distinct
    counts, quantiles) are exactly where the sketch operators
    (events_kmv_*, text_cms_error, doc_length_quantiles' histogram)
    take over: their states merge, the exact forms' do not."""
    ev = load_table(spark, sf_dir, "events")
    et = F.col("event_type")
    op = (
        F.when(et == "signup", "c")
        .when(et == "view", "r")
        .when(et.isin("click", "purchase"), "u")
        .otherwise("d")
    )
    cdc = ev.select(
        F.col("event_id").alias("cdc_seq"),
        F.concat(F.lit("asis.ASIS_USER."), F.upper(op)).alias("topic"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def rollup(part: DataFrame, tag: str) -> DataFrame:
        return part.groupBy("topic").agg(
            F.count("*").alias(f"n_{tag}"),
            F.sum("cents").alias(f"s_{tag}"),
            F.min("cents").alias(f"mn_{tag}"),
            F.max("cents").alias(f"mx_{tag}"),
        )

    state = rollup(cdc.filter(F.col("cdc_seq") % 2 == 0), "a")
    delta = rollup(cdc.filter(F.col("cdc_seq") % 2 == 1), "b")
    merged = state.join(delta, "topic", "full_outer")
    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    return merged.select(
        "topic",
        (z("n_a") + z("n_b")).alias("n_events"),
        # NULL-preserving sum merge: all-NULL partials must merge to
        # NULL (the recompute's sum semantics), not 0 — coalescing each
        # side alone would violate the IVM-law oracle on a topic whose
        # cents are entirely NULL
        F.when(
            F.col("s_a").isNull() & F.col("s_b").isNull(), F.lit(None)
        )
        .otherwise(z("s_a") + z("s_b"))
        .alias("sum_cents"),
        F.least(
            F.coalesce("mn_a", "mn_b"), F.coalesce("mn_b", "mn_a")
        ).alias("min_cents"),
        F.greatest(
            F.coalesce("mx_a", "mx_b"), F.coalesce("mx_b", "mx_a")
        ).alias("max_cents"),
    )


@register(
    "a13_cube_report",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
         AS gid,
       count(*)::BIGINT AS n,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def a13_cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with an explicit grouping_id
    (extension, completing the reporting trio with a10's pivot and
    a11's rollup): all four grouping sets — per pair, per status, per
    priority, grand total — in ONE aggregate pass. The grouping_id
    column disambiguates a real NULL key from a subtotal row, which is
    what makes the cube safely consumable downstream. Same scale
    argument as rollup: Catalyst replicates rows per grouping set
    inside one Expand + hash agg, one fact scan instead of four."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count("*").alias("n"),
        F.sum(price).cast("double").alias("sum_price"),
    )
