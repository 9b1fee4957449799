"""Loop-prevention dedup — the reference's FN_IS_LOOP semantics.

Reference (poc/asis-oracle/init/04_create_procedures.sql:31-44): an event
is LOOP_BLOCKED iff an *applied* event with the same CHANGE_HASH exists
STRICTLY within the last 5 minutes (FN_IS_LOOP tests PROCESSED_AT >
SYSTIMESTAMP - 5 MIN, so a gap of exactly 5 minutes is NOT blocked);
blocked events are NOT recorded into CDC_PROCESSED_HASH, so they do not
extend the blocking window. Validation-failed events (stage 1 FAILED)
never reach SP_RECORD_HASH either, so they too leave the window
untouched. That makes the semantics sequential per hash: walk events in
time order; each event is blocked iff its gap from the LAST
APPLIED-AND-VALID event is under the window, and only unblocked valid
events refresh the state.

This is genuinely beyond SQL window functions (state depends on prior
*decisions*, not prior rows), so the batch form uses ``applyInPandas``
keyed by change_hash — the exact sharding a Structured Streaming
``transformWithState`` operator would use (streaming twin:
cdc_sync_poc_spark/streaming/dedup.py). Scale: state per key is one
timestamp; groups are tiny (hash collisions are rare); the shuffle is on
the high-cardinality hash key so it distributes evenly at 100 TB — no
skew, no driver involvement.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import types as T

WINDOW_US = 5 * 60 * 1_000_000  # 5 minutes (FN_IS_LOOP interval, :40)


def with_loop_blocked(cdc: DataFrame) -> DataFrame:
    """Add boolean ``loop_blocked`` per the sequential greedy semantics.

    Input needs columns: change_hash, ts (timestamp), cdc_seq. Output =
    input columns + loop_blocked, same rows. If ``prop_k`` and ``val``
    are present, validation-failed rows (prop_k > 95 OR val < 0.05,
    null-safe — the st06 predicate) can be blocked but never refresh
    the window (SP_RECORD_HASH is skipped for stage-1 failures);
    without those columns every row counts as valid.

    Fast paths: a hash that occurs once can never be blocked, and with a
    high-cardinality content hash that is almost every row — those rows
    bypass Python entirely (broadcast anti join + literal false). A hash
    that occurs exactly TWICE is also closed-form (the second event is
    blocked iff the first was valid and the gap is under the window — no
    decision feedback yet), so pairs run as a lag() window, JVM-side.
    Only chains of length >= 3 — where blocking depends on prior
    DECISIONS — go through the Arrow/pandas walk, so the Python cost is
    O(hashes repeating 3+ times), not O(events); on a content-hash
    stream that set is typically EMPTY (the sf0.1 fixture has 138
    pairs, zero 3+ chains) and the walk stage runs over zero rows.
    At sf0.1 this is timing-neutral (measured: warm-up and steady
    state flat vs the pairs-through-pandas version) — the win is at
    scale, where pairs are the dominant duplicate class and keeping
    them JVM-side removes almost all Arrow transfer and Python-worker
    occupancy from the operator. This mirrors how a transformWithState
    operator would behave: state only materializes for keys that
    repeat.
    """
    from pyspark.sql import functions as F

    in_cols = [f.name for f in cdc.schema.fields]
    has_validity = {"prop_k", "val"}.issubset(cdc.columns)
    invalid_col = (
        F.coalesce(
            (F.col("prop_k") > 95) | (F.col("val") < 0.05), F.lit(False)
        )
        if has_validity
        else F.lit(False)
    )
    cdc = cdc.withColumn("__invalid", invalid_col)
    schema = T.StructType(
        list(cdc.schema.fields) + [T.StructField("loop_blocked", T.BooleanType())]
    )

    def walk(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["ts", "cdc_seq"]).copy()
        blocked = []
        last_applied_us = None
        for ts, invalid in zip(group["ts"], group["__invalid"]):
            us = ts.value // 1000  # pandas ns -> us
            if last_applied_us is not None and us - last_applied_us < WINDOW_US:
                blocked.append(True)
            else:
                blocked.append(False)
                if not invalid:  # stage-1 failures never record the hash
                    last_applied_us = us
        group["loop_blocked"] = blocked
        return group

    # The three branches below (dup-set agg, anti join, semi join) each
    # recompute the sha256 change-hash from the raw events during the ONE
    # materialization of the persisted result. That recompute is
    # deliberate: scan+hash is cheap next to the walk, persisting the
    # input as well doubles the memory footprint for no reuse, and
    # persist-then-unpersist is a trap — Spark's non-cascading cache
    # invalidation (SPARK-24596) lazily RECOMPILES the dependent result
    # cache and drops its blocks, so every downstream consumer would
    # silently rebuild the walk. At 100 TB the hashed view would be a
    # persisted bronze table on storage, not an executor-memory cache.

    # duplicate-hash key set: aggregates hash->count with map-side combine
    # (only the 64-byte hash column moves, one row per distinct hash per
    # partition), then keeps the hashes seen more than once — a tiny set
    # for any content-hash stream, so it broadcasts. Rows with unique
    # hashes never shuffle at all (broadcast anti join is map-only);
    # pair hashes (exactly two occurrences) are exchanged for a lag()
    # window; only 3+ chains reach the pandas walk.
    counts = cdc.groupBy("change_hash").agg(F.count("*").alias("__n"))
    # The REPEATED-hash set persists (138 rows at sf0.1 — O(duplicate
    # keys), exactly the state a transformWithState operator holds):
    # the three class filters below would otherwise each re-evaluate
    # the counts agg — three extra scan+hash+shuffle passes over the
    # raw events during the one materialization (measured ~2 s each at
    # sf0.1, the bulk of the st01 warmup cost). Never unpersisted — see
    # the SPARK-24596 note above; the broadcast joins already assume
    # this set is small, so pinning it adds no new scale assumption.
    dups = counts.filter(F.col("__n") > 1).persist()
    dup_hashes = dups.select("change_hash")
    pair_hashes = dups.filter(F.col("__n") == 2).select("change_hash")
    chain_hashes = dups.filter(F.col("__n") > 2).select("change_hash")
    singles = cdc.join(
        F.broadcast(dup_hashes), "change_hash", "left_anti"
    ).withColumn("loop_blocked", F.lit(False))
    w = Window.partitionBy("change_hash").orderBy("ts", "cdc_seq")
    pairs = (
        cdc.join(F.broadcast(pair_hashes), "change_hash", "left_semi")
        .withColumn(
            "loop_blocked",
            F.coalesce(
                ~F.lag("__invalid").over(w)
                & (
                    F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                    < F.lit(WINDOW_US)
                ),
                F.lit(False),
            ),
        )
        .select(*in_cols, "loop_blocked")
    )
    multis = (
        cdc.join(F.broadcast(chain_hashes), "change_hash", "left_semi")
        .groupBy("change_hash")
        .applyInPandas(walk, schema=schema)
        .select(*in_cols, "loop_blocked")
    )
    # persist the walked result: five downstream operators (st01, the
    # audit/classified family, ap05, pipeline_e2e) consume this exact
    # plan, and Spark's cache matches on plan equality so they all share
    # one materialization. (The streaming twin needs no cache — its
    # state store IS the materialization.)
    return (
        singles.select(*in_cols, "loop_blocked")
        .unionByName(pairs)
        .unionByName(multis)
        .persist()
    )


# DuckDB oracle twin of the same greedy walk (recursive CTE; rn-indexed
# sequential scan per hash group). Compose inside a WITH RECURSIVE that
# already defines `cdc`.
WALK_CTES = """
g AS (
  SELECT cdc_seq, pk, op, operation, ts, ts_ms, val, prop_k, change_hash,
         coalesce(prop_k > 95 OR val < 0.05, FALSE) AS invalid,
         row_number() OVER (PARTITION BY change_hash ORDER BY ts, cdc_seq) AS rn
  FROM cdc
),
walk AS (
  SELECT g.*, CASE WHEN g.invalid THEN NULL ELSE g.ts END AS last_applied,
         FALSE AS loop_blocked
  FROM g WHERE rn = 1
  UNION ALL
  SELECT g.*,
         CASE
           WHEN w.last_applied IS NOT NULL
                AND epoch_us(g.ts) - epoch_us(w.last_applied) < 300000000
             THEN w.last_applied
           WHEN g.invalid THEN w.last_applied
           ELSE g.ts
         END AS last_applied,
         coalesce(epoch_us(g.ts) - epoch_us(w.last_applied) < 300000000,
                  FALSE) AS loop_blocked
  FROM g JOIN walk w ON g.change_hash = w.change_hash AND g.rn = w.rn + 1
)
"""
