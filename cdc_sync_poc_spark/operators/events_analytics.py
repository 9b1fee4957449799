"""Event-stream analytics over the ``events`` table: tumbling-window
aggregation, ordered funnel conversion, and cohort retention — the
batch twins of the Structured Streaming operators (the tumbling window
is literally ``F.window``, the same operator a ``readStream`` plan
would use with a watermark; reference parity: the reference's poller
only counts events per poll cycle, poc/src CdcPoller loop — these are
the richer forms a warehouse needs).

Scale design: every query here is partitioned by a high-cardinality
key before any window/agg — (window, type) buckets, user_id, or
(cohort, offset) — so there is no global sort and no single-task
stage. Funnel stage tables shrink monotonically (stage N+1 is a join
against stage N's survivors), and retention's distinct-day activity
set is at most users x days, far smaller than raw events. All value
sums run in integer cents/micros (order-independent, bit-exact vs the
oracle); only final ratios are doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.functions.histcut import (
    hist_bucket_edges,
    hist_bucket_oracle_cte,
)
from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table


@register(
    "events_window_agg",
    oracle="""
SELECT date_trunc('hour', ts) AS w_start, event_type,
       count(*)::BIGINT AS n_events,
       cast(sum(CAST(round(value * 100) AS BIGINT))::BIGINT as double) / 100
         AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
)
def events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts and value totals per event type —
    the canonical streaming aggregation, run in batch mode. Uses
    ``F.window`` (the exact operator a readStream plan reuses with a
    watermark); tumbling windows are epoch-aligned so the window start
    equals date_trunc('hour') in the oracle. One hash agg on the
    (window, type) key — high-cardinality, map-side combined; value
    sums in integer cents."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents).cast("double") / 100).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_funnel",
    oracle="""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s1)::BIGINT AS n_signup,
       (SELECT count(*) FROM s2)::BIGINT AS n_click,
       (SELECT count(*) FROM s3)::BIGINT AS n_purchase,
       (SELECT coalesce(sum(epoch_us(s2.t2) - epoch_us(s1.t1)), 0)::BIGINT
        FROM s2 JOIN s1 ON s2.user_id = s1.user_id) AS signup_to_click_us,
       (SELECT coalesce(sum(epoch_us(s3.t3) - epoch_us(s2.t2)), 0)::BIGINT
        FROM s3 JOIN s2 ON s3.user_id = s2.user_id) AS click_to_purchase_us
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (signup -> first click AFTER signup
    -> first purchase AFTER that click), with stage counts and total
    stage-transition latency in exact integer microseconds. Each stage
    is a filtered min-ts hash agg on user_id joined to the previous
    stage's survivors — the stage tables shrink monotonically, every
    join key is user_id (co-partitioned across stages, one shuffle
    domain). All five scalars come from ONE aggregate over the s1
    frame LEFT-JOINED with s2 and s3 (r14 — the five separate 1-row
    aggregates cross-joined re-planned the shared stage subtrees five
    times: 18 jobs for 0.65 s of data work): s2 ⊆ s1 and s3 ⊆ s2 by
    construction, so count(t2)/count(t3) are the stage counts and the
    latency sums range over exactly the inner-join rows they replaced
    (t2 NULL ⇒ the summand is NULL ⇒ skipped, matching the old inner
    join's row set)."""
    ev = load_table(spark, sf_dir, "events")

    def stage(ev_type: str, prev: DataFrame, tcol: str, prev_t: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == ev_type)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = stage("click", s1, "t2", "t1")
    s3 = stage("purchase", s2, "t3", "t2")

    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    f = (
        s1.join(s2.select("user_id", "t2"), "user_id", "left")
        .join(s3.select("user_id", "t3"), "user_id", "left")
    )
    return f.agg(
        F.count("*").alias("n_signup"),
        F.count("t2").alias("n_click"),
        F.count("t3").alias("n_purchase"),
        F.coalesce(F.sum(us("t2") - us("t1")), F.lit(0)).alias(
            "signup_to_click_us"
        ),
        F.coalesce(F.sum(us("t3") - us("t2")), F.lit(0)).alias(
            "click_to_purchase_us"
        ),
    )


@register(
    "events_retention",
    oracle="""
WITH first_day AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_date
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT f.cohort_date,
       date_diff('day', f.cohort_date, a.d)::BIGINT AS day_offset,
       count(*)::BIGINT AS n_users
FROM activity a JOIN first_day f ON a.user_id = f.user_id
GROUP BY f.cohort_date, day_offset
""",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, and
    for each (cohort, day-offset) the count of users active that day.
    The distinct (user, day) activity set is the first shuffle (at most
    users x days rows — far smaller than raw events); cohort
    assignment joins it on user_id; the triangle is one hash agg on
    the compact (cohort, offset) key."""
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_date")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        activity.join(first_day, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date")).cast("long").alias(
                "day_offset"
            ),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "events_rolling_stats",
    oracle="""
WITH c AS (
  SELECT event_id, user_id,
         CAST(round(value * 100) AS BIGINT) AS cents, ts
  FROM events
)
SELECT event_id, user_id,
       count(*) OVER w::BIGINT AS roll_n,
       CAST(sum(cents) OVER w AS DOUBLE) / 100 AS roll_sum,
       round(CAST(sum(cents) OVER w AS DOUBLE) / 100
             / (count(*) OVER w), 6) AS roll_avg
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
)
def events_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling statistics over the last 5 events (count, value
    sum, mean) — the moving-window feature a fraud/activity model
    reads. One hash-partition exchange on user_id, sort within
    partitions only (the plan never globally sorts); value math in
    integer cents so the window sums are order-exact; (ts, event_id)
    ordering makes ties deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    base = ev.select("event_id", "user_id", cents.alias("cents"), "ts")
    roll_sum = F.sum("cents").over(w).cast("double") / 100
    roll_n = F.count("*").over(w)
    return base.select(
        "event_id",
        "user_id",
        roll_n.cast("bigint").alias("roll_n"),
        roll_sum.alias("roll_sum"),
        F.round(roll_sum / roll_n, 6).alias("roll_avg"),
    )


SESSION_MIN = 30  # events_concurrency session length (minutes)
CONC_CHUNK_SEC = 3600  # events_concurrency local prefix-sum bucket


@register(
    "events_concurrency",
    oracle=f"""
WITH pts AS (
  SELECT event_type, ts AS t, 1 AS delta, event_id FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL {SESSION_MIN} MINUTE, -1, event_id
  FROM events
),
run AS (
  SELECT event_type,
         sum(delta) OVER (PARTITION BY event_type
                          ORDER BY t, delta, event_id
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM pts
)
SELECT event_type, (count(*) // 2)::BIGINT AS n_sessions,
       max(conc)::BIGINT AS max_concurrent
FROM run GROUP BY event_type
""",
)
def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type: each event opens a
    SESSION_MIN-minute session; the classic interval sweep (+1 at
    open, -1 at close, running sum, max) counts the maximum number of
    simultaneously open sessions. A naive per-type running sum is ONE
    task per type; implemented as the two-level chunked prefix sum
    (seq_packing / st05 pattern): local cumsum inside
    (type, CONC_CHUNK_SEC time bucket) + broadcast carry-in offsets
    from the tiny per-bucket delta totals. Close points sort before
    open points at the same instant (delta ASC), so back-to-back
    sessions never double-count — and the oracle's flat window states
    the identical order."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    opens = ev.select(
        "event_type",
        F.col("ts").alias("t"),
        F.lit(1).alias("delta"),
        "event_id",
    )
    closes = ev.select(
        "event_type",
        (F.col("ts") + F.expr(f"INTERVAL {SESSION_MIN} MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    pts = opens.unionByName(closes).withColumn(
        "ck", F.expr(f"unix_micros(t) div {CONC_CHUNK_SEC * 1_000_000}")
    )
    w_local = (
        Window.partitionBy("event_type", "ck")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = pts.withColumn("local_run", F.sum("delta").over(w_local))
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("ck")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        pts.groupBy("event_type", "ck")
        .agg(F.sum("delta").alias("ck_tot"))
        .select(
            "event_type",
            "ck",
            F.coalesce(F.sum("ck_tot").over(w_carry), F.lit(0)).alias("ck_off"),
        )
    )
    return (
        local.join(F.broadcast(carry), ["event_type", "ck"])
        .groupBy("event_type")
        .agg(
            (F.count("*") / 2).cast("bigint").alias("n_sessions"),
            F.max(F.col("ck_off") + F.col("local_run")).cast("bigint").alias(
                "max_concurrent"
            ),
        )
    )


PATH_LEN_TOP = 10  # events_path_topk result size


@register(
    "events_path_topk",
    oracle=f"""
WITH p AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, count(*)::BIGINT AS n
FROM p WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3 LIMIT {PATH_LEN_TOP}
""",
)
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event paths: the most frequent 3-step event-type sequences
    across per-user streams — the navigation-path analysis behind
    funnel design. One user-partitioned lead window (embarrassingly
    parallel), a hash agg bounded by |event_type|³ groups, and a
    PATH_LEN_TOP-row TakeOrdered — no global sort at any event
    volume."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        p.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(PATH_LEN_TOP)
    )


@register(
    "events_attribution",
    oracle="""
WITH touched AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type
  FROM events
)
SELECT touch_type, count(*)::BIGINT AS n_purchases,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS revenue
FROM touched
WHERE event_type = 'purchase' AND touch_type IS NOT NULL
GROUP BY touch_type
""",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase's value is credited
    to the nearest PRECEDING non-purchase event in the same user's
    stream (the classic marketing-attribution pass). One
    user-partitioned last_value(IGNORE NULLS) window — embarrassingly
    parallel — then a hash agg over the |event_type|-bounded touch
    domain. Revenue folds integer CENTS (round(value*100) per row, an
    identical double op on both engines), so the unordered distributed
    sum is exact; one division back to currency at the end."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    touched = ev.select("event_type", "value", touch.alias("touch_type"))
    return (
        touched.filter(
            (F.col("event_type") == "purchase") & F.col("touch_type").isNotNull()
        )
        .groupBy("touch_type")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("bigint")) / F.lit(100.0),
                2,
            ).alias("revenue"),
        )
    )


@register(
    "events_markov_transitions",
    oracle="""
WITH nxt AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
c AS (
  SELECT src, dst, count(*)::BIGINT AS n FROM nxt
  WHERE dst IS NOT NULL GROUP BY src, dst
)
SELECT src, dst, n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY src), 6) AS p
FROM c
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next event type | current event type). The lead window
    is partitioned by user (embarrassingly parallel); the count table
    is |event_type|² rows, so the normalizing window is O(domain²) on
    a tiny frame — never O(events)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    c = (
        nxt.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    wsrc = Window.partitionBy("src")
    return c.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wsrc), 6).alias("p"),
    )


@register(
    "events_session_window",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sno
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*)::BIGINT AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
         AS sum_value
FROM s GROUP BY user_id, sno
""",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE ``F.session_window`` —
    the operator a ``readStream`` sessionization uses verbatim with a
    watermark (events_sessionize is the lag/cumsum island twin; this
    one exercises Spark's built-in merging-session state operator, so
    the batch oracle doubles as ground truth for the streaming path).

    Semantics pinned by the oracle: two events share a session iff
    their gap is STRICTLY under 30 min (session_window merges
    half-open [ts, ts+gap) intervals, so a gap of exactly 30 min
    starts a new session — hence ``>=`` in the island oracle, not the
    ``>`` of events_sessionize); session_end is last_ts + gap, the
    watermark-eviction bound a streaming run would emit. Partitioned
    by user_id before the merge — embarrassingly parallel, no global
    sort; value sums fold integer cents (order-independent, bit-exact).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100"
            ).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_ab_ttest",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('purchase', 'click')
),
agg AS (
  SELECT count(*) FILTER (event_type = 'purchase')::BIGINT AS n_a,
         count(*) FILTER (event_type = 'click')::BIGINT AS n_b,
         sum(c) FILTER (event_type = 'purchase')::BIGINT AS s1_a,
         sum(c) FILTER (event_type = 'click')::BIGINT AS s1_b,
         sum(c * c) FILTER (event_type = 'purchase')::BIGINT AS s2_a,
         sum(c * c) FILTER (event_type = 'click')::BIGINT AS s2_b
  FROM c
)
SELECT n_a, n_b,
       round(CAST(s1_a AS DOUBLE) / 100 / n_a, 6) AS mean_a,
       round(CAST(s1_b AS DOUBLE) / 100 / n_b, 6) AS mean_b,
       round((CAST(s2_a AS DOUBLE) / 10000
              - (CAST(s1_a AS DOUBLE) / 100) * (CAST(s1_a AS DOUBLE) / 100) / n_a)
             / (n_a - 1), 6) AS var_a,
       round((CAST(s2_b AS DOUBLE) / 10000
              - (CAST(s1_b AS DOUBLE) / 100) * (CAST(s1_b AS DOUBLE) / 100) / n_b)
             / (n_b - 1), 6) AS var_b,
       round((CAST(s1_a AS DOUBLE) / 100 / n_a - CAST(s1_b AS DOUBLE) / 100 / n_b)
             / sqrt(((CAST(s2_a AS DOUBLE) / 10000
                      - (CAST(s1_a AS DOUBLE) / 100) * (CAST(s1_a AS DOUBLE) / 100) / n_a)
                     / (n_a - 1)) / n_a
                    + ((CAST(s2_b AS DOUBLE) / 10000
                        - (CAST(s1_b AS DOUBLE) / 100) * (CAST(s1_b AS DOUBLE) / 100) / n_b)
                       / (n_b - 1)) / n_b), 6) AS t_stat
FROM agg
""",
)
def events_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-statistic between the purchase and click
    value distributions — the A/B readout an experimentation pipeline
    computes per metric. ONE scan, one map-side-combined reduce to six
    BIGINT moments (counts, sums, sums-of-squares in exact integer
    cents — order-independent, so the distributed fold is bit-exact);
    means/variances/t are then a fixed dag of correctly-rounded double
    ops on that single row, identical on both engines. No window, no
    shuffle beyond the 6-column global agg — at 100 TB this is the
    cheapest query in the module."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    is_a = F.col("event_type") == "purchase"
    agg = c.agg(
        F.count(F.when(is_a, 1)).alias("n_a"),
        F.count(F.when(~is_a, 1)).alias("n_b"),
        F.sum(F.when(is_a, F.col("c"))).alias("s1_a"),
        F.sum(F.when(~is_a, F.col("c"))).alias("s1_b"),
        F.sum(F.when(is_a, F.col("c") * F.col("c"))).alias("s2_a"),
        F.sum(F.when(~is_a, F.col("c") * F.col("c"))).alias("s2_b"),
    )
    m = lambda s1, n: F.col(s1).cast("double") / 100 / F.col(n)  # noqa: E731
    v = (
        lambda s2, s1, n: (
            F.col(s2).cast("double") / 10000
            - (F.col(s1).cast("double") / 100)
            * (F.col(s1).cast("double") / 100)
            / F.col(n)
        )
        / (F.col(n) - 1)
    )  # noqa: E731
    se2 = v("s2_a", "s1_a", "n_a") / F.col("n_a") + v(
        "s2_b", "s1_b", "n_b"
    ) / F.col("n_b")
    # NULL (the oracle's division result), never an ANSI
    # DIVIDE_BY_ZERO crash: a side with <2 samples leaves its variance
    # undefined, and identical-valued sides zero the standard error
    t = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0),
        (m("s1_a", "n_a") - m("s1_b", "n_b")) / F.sqrt(se2),
    )
    guarded_v = lambda s2, s1, n: F.when(  # noqa: E731
        F.col(n) > 1, v(s2, s1, n)
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(m("s1_a", "n_a"), 6).alias("mean_a"),
        F.round(m("s1_b", "n_b"), 6).alias("mean_b"),
        F.round(guarded_v("s2_a", "s1_a", "n_a"), 6).alias("var_a"),
        F.round(guarded_v("s2_b", "s1_b", "n_b"), 6).alias("var_b"),
        F.round(t, 6).alias("t_stat"),
    )


@register(
    "events_value_histogram",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE round(value * 100) >= 1
),
b AS (
  SELECT event_type,
         (length(printf('%b', cents)) - 1)::BIGINT AS log2_bucket
  FROM c
)
SELECT event_type, log2_bucket, count(*)::BIGINT AS n,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY event_type), 6) AS frac
FROM b GROUP BY event_type, log2_bucket
""",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two value histogram per event type: bucket =
    floor(log2(cents)), computed as binary-digit count (length of the
    base-2 rendering minus one) so both engines bucket by exact integer
    arithmetic — no libm log whose last bit could differ. The
    domain-bucketed histogram is the 100 TB distribution profile: one
    hash agg to |types| x ~32 buckets, the share window then runs on
    that tiny table (the doc_length_quantiles pattern). Sub-cent values
    (cents < 1) are excluded — log2 undefined; the fixture's floor is
    one cent."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    b = ev.select(
        "event_type", cents.alias("cents")
    ).filter(F.col("cents") >= 1).select(
        "event_type",
        (F.length(F.bin("cents")) - 1).cast("bigint").alias("log2_bucket"),
    )
    counts = b.groupBy("event_type", "log2_bucket").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "log2_bucket",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias("frac"),
    )


@register(
    "events_lateness_profile",
    oracle="""
WITH lat AS (
  SELECT user_id,
         greatest(coalesce(max(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - epoch_us(ts), 0), 0) AS late_us
  FROM events
),
b AS (
  SELECT CASE WHEN late_us = 0 THEN -1
              ELSE (length(printf('%b', late_us)) - 1) END::BIGINT
           AS log2_late_us
  FROM lat
)
SELECT log2_late_us, count(*)::BIGINT AS n,
       round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (), 6) AS frac
FROM b GROUP BY log2_late_us
""",
)
def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile: how late does each event arrive
    relative to the max event-time already seen on its key (arrival
    order = event_id, the fixture's offset)? Bucketed as
    floor(log2(lateness_us)) with -1 = in-order — exactly the
    measurement that picks a streaming watermark delay: the chosen
    delay's bucket boundary tells you what fraction of events a
    `withWatermark` of that size would drop.

    One running-max window per user_id (embarrassingly parallel), then
    a ~41-bucket hash agg; the share window runs on the bucket table.
    Buckets use binary-digit counts, not libm log2 (the
    events_value_histogram convention)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros(F.col("ts"))
    late = F.greatest(
        F.coalesce(F.max(us).over(w) - us, F.lit(0)), F.lit(0)
    )
    b = ev.select(late.alias("late_us")).select(
        F.when(F.col("late_us") == 0, -1)
        .otherwise(F.length(F.bin("late_us")) - 1)
        .cast("bigint")
        .alias("log2_late_us")
    )
    counts = b.groupBy("log2_late_us").agg(F.count("*").alias("n"))
    w_all = Window.partitionBy()
    return counts.select(
        "log2_late_us",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w_all), 6).alias("frac"),
    )


@register(
    "events_user_overlap",
    oracle="""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
n AS (SELECT event_type, count(*)::BIGINT AS n_users FROM du GROUP BY event_type),
pair AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*)::BIGINT AS n_common
  FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, p.n_common,
       round(CAST(p.n_common AS DOUBLE)
             / (na.n_users + nb.n_users - p.n_common), 6) AS jaccard
FROM pair p
JOIN n na ON na.event_type = p.type_a
JOIN n nb ON nb.event_type = p.type_b
""",
)
def events_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: exact Jaccard of the user
    sets for every type pair — the segment-overlap matrix an
    activation/targeting pipeline reads. The quadratic term is keyed
    on user_id (high-cardinality, uniform): distinct (type, user) is a
    map-side agg, the self-join fans each user to its own type pairs
    (<= |types|² rows per user), and the pair table is |types|² rows.
    The per-type sizes broadcast onto it. No cross join at any scale —
    this is the KMV-union question (events_kmv_union) answered exactly
    when the key space still fits a shuffle."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    n = du.groupBy("event_type").agg(F.count("*").alias("n_users"))
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    pair = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_common"))
    )
    na = n.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("na"))
    nb = n.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("nb"))
    return (
        pair.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "events_cohort_ltv",
    oracle="""
WITH first_day AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_date
  FROM events GROUP BY user_id
),
csize AS (
  SELECT cohort_date, count(*)::BIGINT AS cohort_size
  FROM first_day GROUP BY cohort_date
),
rev AS (
  SELECT f.cohort_date,
         date_diff('day', f.cohort_date, CAST(e.ts AS DATE))::BIGINT AS day_offset,
         sum(CAST(round(e.value * 100) AS BIGINT))::BIGINT AS rev_cents
  FROM events e JOIN first_day f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY f.cohort_date, day_offset
),
cum AS (
  SELECT cohort_date, day_offset,
         sum(rev_cents) OVER (PARTITION BY cohort_date ORDER BY day_offset
                              ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_cents
  FROM rev
)
SELECT c.cohort_date, c.day_offset, s.cohort_size,
       round(CAST(c.cum_cents AS DOUBLE) / 100 / s.cohort_size, 6)
         AS ltv_per_user
FROM cum c JOIN csize s ON c.cohort_date = s.cohort_date
""",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: cumulative purchase revenue per
    cohort member by day offset since first touch — the payback curve
    read next to the retention triangle (events_retention shares the
    cohort spine). Offsets appear only when the cohort purchased that
    day; the curve is a step function over observed offsets (identical
    convention both engines).

    Revenue folds exact integer cents keyed on the compact (cohort,
    offset) grid; the cumulative window is per-cohort over that
    domain-bounded grid (days-sized, never events-sized); cohort sizes
    broadcast onto the curve."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_date")
    )
    csize = first_day.groupBy("cohort_date").agg(
        F.count("*").alias("cohort_size")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_day, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff(F.to_date("ts"), F.col("cohort_date"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "rev_cents"
            )
        )
    )
    w = (
        Window.partitionBy("cohort_date")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.select(
        "cohort_date",
        "day_offset",
        F.sum("rev_cents").over(w).alias("cum_cents"),
    )
    return cum.join(F.broadcast(csize), "cohort_date").select(
        "cohort_date",
        "day_offset",
        "cohort_size",
        F.round(
            F.col("cum_cents").cast("double") / 100 / F.col("cohort_size"), 6
        ).alias("ltv_per_user"),
    )


@register(
    "events_active_users",
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
days AS (SELECT DISTINCT d FROM activity)
SELECT days.d,
       count(DISTINCT CASE WHEN a.d = days.d THEN a.user_id END)::BIGINT AS dau,
       count(DISTINCT CASE WHEN a.d > days.d - 7 THEN a.user_id END)::BIGINT AS wau,
       count(DISTINCT a.user_id)::BIGINT AS mau
FROM days JOIN activity a
  ON a.d <= days.d AND a.d > days.d - 30
GROUP BY days.d
""",
)
def events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU: distinct active users per day with trailing 7- and
    30-day windows — the engagement panel every event warehouse serves.
    Sliding count-distinct does NOT merge (the IVM boundary a12
    documents), so the exact form joins the deduped (user, day)
    activity set against the day domain: |days| x |activity| bounded
    by the 30-day band, activity itself at most users x days — both
    orders smaller than raw events. At larger day-domains the same
    panel runs on per-day KMV sketches (events_kmv_*), whose union
    DOES merge across the window."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = activity.select(F.col("d").alias("day")).distinct()
    j = days.join(
        activity,
        (F.col("d") <= F.col("day")) & (F.col("d") > F.date_sub(F.col("day"), 30)),
    )
    return j.groupBy("day").agg(
        F.count_distinct(
            F.when(F.col("d") == F.col("day"), F.col("user_id"))
        ).alias("dau"),
        F.count_distinct(
            F.when(F.col("d") > F.date_sub(F.col("day"), 7), F.col("user_id"))
        ).alias("wau"),
        F.count_distinct("user_id").alias("mau"),
    ).withColumnRenamed("day", "d")


@register(
    "events_rfm_segments",
    oracle="""
WITH ref AS (SELECT max(ts) AS ref_ts FROM events),
p AS (
  SELECT user_id, max(ts) AS last_ts, count(*)::BIGINT AS freq,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
base AS (
  SELECT p.user_id,
         date_diff('day', CAST(p.last_ts AS DATE), CAST(r.ref_ts AS DATE))
           ::BIGINT AS recency_days,
         p.freq, p.cents, (p.cents // 100)::BIGINT AS mcell
  FROM p CROSS JOIN ref r
),
r_edges AS ({R_EDGES}),
f_edges AS ({F_EDGES}),
m_edges AS ({M_EDGES}),
scored AS (
  SELECT b.user_id, b.recency_days, b.freq, b.cents,
         re.r_score, fe.f_score, me.m_score
  FROM base b
  JOIN r_edges re USING (recency_days)
  JOIN f_edges fe USING (freq)
  JOIN m_edges me ON me.mcell = b.mcell
)
SELECT user_id, recency_days, freq, cents, r_score, f_score, m_score,
       CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
            WHEN r_score >= 4 AND f_score <= 2 THEN 'at_risk'
            WHEN r_score <= 2 THEN 'recent'
            ELSE 'regular' END AS segment
FROM scored
""".replace(
        "{R_EDGES}",
        hist_bucket_oracle_cte(
            "base", "recency_days", 5, descending=False, out="r_score"
        ),
    )
    .replace(
        "{F_EDGES}",
        hist_bucket_oracle_cte("base", "freq", 5, descending=True, out="f_score"),
    )
    .replace(
        "{M_EDGES}",
        hist_bucket_oracle_cte("base", "mcell", 5, descending=True, out="m_score"),
    ),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency / frequency / monetary quintiles per
    purchasing user, with the classic segment labels (champions =
    recent AND frequent, at-risk = frequent but lapsed) — the
    user-value rollup an activation pipeline serves. Quintile rank 1 =
    best (most recent / most frequent / highest spend); every ntile
    rows sharing a metric value share a quintile (no intra-cell
    tie-break — the histogram-cut contract, mirrored in the oracle).

    Scale: one purchase agg collapses events to a users-sized frame;
    the quintile EDGES then come from the value-domain histogram cut
    (functions/histcut.py — r4's three unpartitioned ntile windows,
    VERDICT "What's wrong" #2, removed): recency buckets on the
    day-granular recency_days domain, frequency on the purchase-count
    domain, monetary on whole-currency cells (cents div 100) — all
    three bounded by their VALUE domains, never by user count — and
    each user's scores are three map-side broadcast lookups. Monetary
    folds exact integer cents."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.agg(F.max("ts").alias("ref_ts"))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("freq"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
    )
    # persisted: the users-sized frame feeds FOUR consumers (three hist
    # builds + the final lookup join); without the persist each branch
    # prunes to a different column set, the canonicalized exchanges
    # diverge, and ReuseExchange re-scans the EVENTS table per branch —
    # caching the small frame beats 4 scans of the big one at any scale
    base = (
        p.crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.datediff(F.to_date("ref_ts"), F.to_date("last_ts"))
            .cast("bigint")
            .alias("recency_days"),
            "freq",
            "cents",
            F.expr("cents div 100").cast("bigint").alias("mcell"),
        )
        .persist()
    )
    # the three histogram cuts FUSE into one melted pass (same math as
    # functions/histcut.hist_bucket_edges, proven there): explode each
    # user to (metric, cell), ONE hash agg builds all three
    # domain-sized histograms, ONE window pass (partitioned by metric —
    # never unpartitioned, never row-scale) derives cum + total, and
    # the tiny persisted edge table feeds three broadcast lookups.
    # Separate hist_bucket_edges calls would each re-aggregate the
    # base; melting cuts the small-job count by 3x with identical
    # per-metric semantics (recency ascends, freq/monetary descend via
    # the negated order key).
    from pyspark.sql import Window

    melted = base.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("m"), F.col("recency_days").alias("cell")
                ),
                F.struct(F.lit("f").alias("m"), F.col("freq").alias("cell")),
                F.struct(F.lit("m").alias("m"), F.col("mcell").alias("cell")),
            )
        ).alias("mc")
    ).select("mc.m", "mc.cell")
    hist = melted.groupBy("m", "cell").agg(F.count("*").alias("c"))
    ordc = F.when(F.col("m") == "r", F.col("cell")).otherwise(-F.col("cell"))
    wrun = Window.partitionBy("m").orderBy(ordc).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("m")
    edges = (
        hist.select(
            "m",
            "cell",
            F.sum("c").over(wrun).alias("cum"),
            F.sum("c").over(wall).alias("n"),
        )
        .select(
            "m",
            "cell",
            F.expr("(5 * cum + n - 1) div n").cast("bigint").alias("score"),
        )
        .persist()
    )

    def edge(metric: str, cell_col: str, out: str) -> DataFrame:
        return edges.filter(F.col("m") == metric).select(
            F.col("cell").alias(cell_col), F.col("score").alias(out)
        )

    scored = (
        base.join(F.broadcast(edge("r", "recency_days", "r_score")), "recency_days")
        .join(F.broadcast(edge("f", "freq", "f_score")), "freq")
        .join(F.broadcast(edge("m", "mcell", "m_score")), "mcell")
    )
    seg = (
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "at_risk")
        .when(F.col("r_score") <= 2, "recent")
        .otherwise("regular")
    )
    return scored.select(
        "user_id", "recency_days", "freq", "cents",
        "r_score", "f_score", "m_score", seg.alias("segment"),
    )


@register(
    "events_interarrival_stats",
    oracle="""
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id)) // 1000000
           AS gap_s
  FROM events
),
agg AS (
  SELECT event_type, count(gap_s)::BIGINT AS n_gaps,
         sum(gap_s)::BIGINT AS s1, sum(gap_s * gap_s)::BIGINT AS s2
  FROM g WHERE gap_s IS NOT NULL GROUP BY event_type
)
SELECT event_type, n_gaps,
       round(CAST(s1 AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
       round(sqrt((CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_gaps)
                  / (n_gaps - 1))
             / (CAST(s1 AS DOUBLE) / n_gaps), 6) AS burstiness_cv
FROM agg
""",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival profile per event type: mean gap and the
    coefficient of variation (stddev/mean) — CV ~ 1 is Poisson
    arrivals, CV >> 1 is bursty traffic; the number that sizes
    micro-batch triggers and backpressure limits (st04/st07) from
    measured behavior instead of guesses.

    One lag window per type (partitioned — embarrassingly parallel),
    then exact BIGINT microsecond moments (the events_ab_ttest
    construction: order-independent integer sums, a fixed dag of
    correctly-rounded double ops at the end)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    # whole-second gaps: squaring microsecond gaps overflows BIGINT on
    # month-scale spans (1e11us -> 1e22); second-scale moments stay exact
    g = ev.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).select(
        "event_type",
        F.expr("gap_us div 1000000").alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    agg = g.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap_s").alias("s1"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("s2"),
    )
    mean_s = F.col("s1").cast("double") / F.col("n_gaps")
    var_s = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n_gaps")
    ) / (F.col("n_gaps") - 1)
    # NULL (not an ANSI DIVIDE_BY_ZERO crash) when the CV is undefined:
    # a type with one gap (var needs n-1) or all-sub-second gaps
    # (mean 0) — the oracle's division yields NULL in those cases
    cv = F.when(
        (F.col("n_gaps") > 1) & (F.col("s1") > 0),
        F.round(F.sqrt(var_s) / mean_s, 6),
    )
    return agg.select(
        "event_type",
        "n_gaps",
        F.round(mean_s, 6).alias("mean_gap_s"),
        cv.alias("burstiness_cv"),
    )


@register(
    "events_seasonality",
    oracle="""
SELECT event_type,
       dayofweek(ts)::BIGINT AS dow,
       hour(ts)::BIGINT AS hod,
       count(*)::BIGINT AS n,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY event_type), 6) AS frac
FROM events
GROUP BY event_type, dayofweek(ts), hour(ts)
""",
)
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonality: the (day-of-week, hour) activity
    profile per event type — the load shape that schedules compaction
    windows and capacity, and the baseline the z-score anomaly
    detector should really be normalized against. One hash agg to the
    |types| x 7 x 24 grid; the share window runs on that bounded
    profile table, never on events. DuckDB's dayofweek (0=Sunday)
    differs from Spark's dayofweek (1=Sunday) by one — aligned here
    via Spark's dayofweek - 1."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "dow",
        "hod",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias("frac"),
    )


DECAY_MAX_DAYS = 40  # events_decayed_engagement half-life horizon


@register(
    "events_decayed_engagement",
    oracle=f"""
WITH ref AS (SELECT max(ts) AS ref_ts FROM events),
w AS (
  SELECT e.event_type,
         date_diff('day', CAST(e.ts AS DATE), CAST(r.ref_ts AS DATE))
           ::BIGINT AS days_ago
  FROM events e CROSS JOIN ref r
),
fp AS (
  SELECT event_type,
         CASE WHEN days_ago <= {DECAY_MAX_DAYS}
              THEN (1::BIGINT << ({DECAY_MAX_DAYS} - days_ago))
              ELSE 0 END AS wfp
  FROM w
)
SELECT event_type, count(*)::BIGINT AS n_events,
       round(CAST(sum(wfp) AS DOUBLE) / {1 << DECAY_MAX_DAYS}, 9)
         AS decayed_score
FROM fp GROUP BY event_type
""",
)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed activity score per event type: each event
    contributes 2^(-days_ago) (one-day half-life), so yesterday's
    event counts half of today's — the standard recency-weighted
    engagement metric, with the decay horizon truncated at
    DECAY_MAX_DAYS (an event older than the horizon contributes
    exactly 0; that truncation is also what BOUNDS the incremental
    state a rolling version needs).

    Exact on both engines because every weight is the INTEGER
    2^(horizon - days_ago) — a bit shift, summed as BIGINT (sums of
    doubles would be partition-order-dependent; sums of BIGINTs are
    not) — with ONE double division at the end. Map-only weighting +
    one low-cardinality hash agg; headroom: 2^40 x 1e9 same-day
    events = 1e21 would overflow, so at that density the horizon
    constant drops (2^30 holds 8e9 same-day events per type)."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.agg(F.max("ts").alias("ref_ts"))
    days = F.datediff(F.to_date("ref_ts"), F.to_date("ts")).cast("bigint")
    wfp = F.when(
        days <= DECAY_MAX_DAYS,
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT),"
            f" CAST({DECAY_MAX_DAYS} - datediff(to_date(ref_ts), to_date(ts))"
            f" AS INT))"
        ),
    ).otherwise(F.lit(0))
    return (
        ev.crossJoin(F.broadcast(ref))
        .select("event_type", wfp.alias("wfp"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum("wfp").cast("double") / F.lit(float(1 << DECAY_MAX_DAYS)), 9
            ).alias("decayed_score"),
        )
    )


@register(
    "events_view_click_pairs",
    oracle="""
SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
       v.ts AS view_ts, c.ts AS click_ts
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '10 minutes'
WHERE v.event_type = 'view' AND c.event_type = 'click'
""",
)
def events_view_click_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View->click attribution pairs within a 10-minute window — the
    BATCH side of the stream-stream interval join, sharing one
    implementation with the streaming twin
    (streaming/stream_join.interval_join_batch — the exact condition
    the watermarked unbounded join runs with bounded state; equivalence
    incl. cross-micro-batch pairs pinned in tests/test_streaming.py).

    Plan: both sides hash-shuffle on user_id (the streaming join's
    exact shuffle), per-user candidate pairs bounded by the interval —
    the j07 range-join family's shape with the event-time bound doing
    the pruning."""
    from cdc_sync_poc_spark.streaming.stream_join import interval_join_batch

    return interval_join_batch(load_table(spark, sf_dir, "events"))
