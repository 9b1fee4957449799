"""Rolling-window anomaly scoring over the event stream — the
monitoring pass a sync/ingest pipeline runs to flag metric spikes
(reference analog: the manual dashboard eyeballing of CDC_MONITOR
counters; here it is a first-class, exactly-verifiable operator).

Exactness strategy: the rolling mean/std come from FIXED-POINT BIGINT
window sums (floor(value * 2^16) — value < 2^10 in this fixture, so
sum-of-squares over the 20-row window stays < 2^61, inside int64), and
only the final mean/std/z-score divisions are floating point, in a
fixed operation order both engines replay — the same argument as the
IVF centroid update (_FP_SCALE in llm/similarity.py). A plain
sum(DOUBLE) over a window would be order-stable per partition but the
z-score would still be un-replayable across engines at the bit level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table

_Z_SCALE = float(1 << 16)  # value < 2^10 -> fx < 2^26, 20*fx^2 < 2^57
WIN_ROWS = 20  # trailing window size (rows, not time — st05 has the time twin)
MIN_WIN = 10  # minimum trailing history before scoring
Z_THRESHOLD = "3.0"  # |z| above this flags the event


@register(
    "events_anomaly_zscore",
    oracle=f"""
WITH f AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * {_Z_SCALE!r}) AS BIGINT) AS fx
  FROM events
),
w AS (
  SELECT event_id, user_id, fx,
         count(fx) OVER win AS n,
         sum(fx) OVER win AS s,
         sum(fx * fx) OVER win AS ss
  FROM f
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {WIN_ROWS} PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT event_id, user_id, n,
         CASE WHEN n >= {MIN_WIN} AND (n * ss - s * s) > 0 THEN
           (CAST(fx AS DOUBLE) - CAST(s AS DOUBLE) / n)
             / (sqrt(CAST(n * ss - s * s AS DOUBLE)) / n)
         END AS zs
  FROM w
)
SELECT event_id, user_id, n::BIGINT AS n_win, round(zs, 6) AS zscore,
       CASE WHEN zs IS NULL THEN NULL
            ELSE abs(zs) > {Z_THRESHOLD} END AS is_anomaly
FROM z
""",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score: each event scored against the mean/std
    of its user's previous WIN_ROWS event values; |z| > 3 flags it.
    Events without MIN_WIN rows of history (or a zero-variance window)
    score NULL rather than a fake 0.

    Scale shape: one shuffle on user_id, then three window sums in ONE
    window pass (same frame spec → one physical Window operator), all
    BIGINT; the frame is row-bounded so state per key is O(WIN_ROWS)
    regardless of history length. No skew risk: user_id is
    high-cardinality and the frame caps per-row work."""
    ev = load_table(spark, sf_dir, "events")
    fx = F.expr(f"CAST(floor(value * {_Z_SCALE!r}D) AS BIGINT)")
    f = ev.select("event_id", "user_id", "ts", fx.alias("fx"))
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-WIN_ROWS, -1)
    )
    w = f.select(
        "event_id",
        "user_id",
        "fx",
        F.count("fx").over(win).alias("n"),
        F.sum("fx").over(win).alias("s"),
        F.sum(F.col("fx") * F.col("fx")).over(win).alias("ss"),
    )
    num = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    zs = F.when(
        (F.col("n") >= MIN_WIN) & (num > 0),
        (F.col("fx").cast("double") - F.col("s").cast("double") / F.col("n"))
        / (F.sqrt(num.cast("double")) / F.col("n")),
    )
    z = w.select("event_id", "user_id", "n", zs.alias("zs"))
    return z.select(
        "event_id",
        "user_id",
        F.col("n").cast("long").alias("n_win"),
        F.round("zs", 6).alias("zscore"),
        F.when(F.col("zs").isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.abs(F.col("zs")) > F.expr(Z_THRESHOLD))
        .alias("is_anomaly"),
    )
