"""The reference's acceptance matrix as executable scenarios.

The reference has NO automated tests; its de-facto acceptance surface
is the case catalog C-01..C-13 / T-01..T-07 with expected handling per
case (docs/02-설계/03_케이스_분류.md:33-57,463-487) plus the error-code
table (docs/02-설계/05_에러코드_체계.md). SURVEY §5 makes reproducing
that matrix this repo's job. Each case below either runs a minimal
synthetic scenario against the engine primitive that owns it, or —
for the bidirectional conflict cases whose full semantics are already
exact-oracle-checked as registered queries — asserts the registry
traceability and points at the owning query id.

Handling parity notes (deviations are deliberate and documented):
* C-04 (FK order violation): the reference retries; this engine
  classifies TARGET_NOT_FOUND (SYNC_E_001) into the retry/not-found
  log (ap03) — same row, different loop.
* T-04 (code mapping miss): the reference quarantines MAP_E_003; the
  compiler falls back to the source code value (r04's coalesce), which
  keeps the row flowing and the miss visible.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_sync_poc_spark.plans.mapping import (
    ColumnMapping,
    TableMapping,
    compile_select,
)
from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

load_all_queries()

# case id -> registered query ids that carry its exact-oracle check
CASE_OWNERS = {
    "C-01": ["ap01_merge_cdc", "ap06_sequential_replay"],
    "C-02": ["ap01_merge_cdc", "ap02_ins_to_upd"],
    "C-03": ["ap04_delete_idempotent"],
    "C-04": ["ap03_notfound_log"],
    "T-03": ["st06_quarantine", "r05_cast_date_ts"],
    "T-04": ["r04_codemap_join"],
    "T-05": ["r08_default_coalesce"],
    "C-08": ["cf06_pk_split"],
    "C-09": ["cf01_lww", "cf02_sys_priority"],
    "C-10": ["cf03_field_merge"],
    "C-11": ["cf04_upd_vs_del"],
    "C-12": ["ap04_delete_idempotent", "cf05_policy_lookup"],
    "C-13": ["st01_loop_dedup"],
}


def test_every_case_has_an_exact_checked_owner():
    for case, owners in CASE_OWNERS.items():
        for q in owners:
            assert q in QUERIES, (case, q)


def _merge(spark, base_rows, change_rows):
    from pyspark.sql import Window

    from cdc_sync_poc_spark.operators.apply import merge_final_state

    base = spark.createDataFrame(
        base_rows, "c_custkey long, c_name string, c_acctbal double"
    )
    cdf = spark.createDataFrame(
        change_rows, "cdc_seq long, pk long, operation string, val double"
    )
    w = Window.partitionBy("pk").orderBy(F.desc("cdc_seq"))
    last = cdf.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return {r.pk: round(r.acctbal, 6) for r in merge_final_state(base, last).collect()}


def test_c01_insert_propagates(spark):
    got = _merge(spark, [(1, "a", 1.0)], [(1, 2, "INSERT", 9.5)])
    assert got == {1: 1.0, 2: 9.5}


def test_c02_update_propagates_and_sync_e_002_insert_on_dup(spark):
    # plain UPDATE
    assert _merge(spark, [(1, "a", 1.0)], [(1, 1, "UPDATE", 5.0)]) == {1: 5.0}
    # SYNC_E_002: INSERT on an existing key is auto-handled as UPDATE
    assert _merge(spark, [(1, "a", 1.0)], [(1, 1, "INSERT", 7.0)]) == {1: 7.0}


def test_c03_delete_propagates_and_is_idempotent(spark):
    assert _merge(spark, [(1, "a", 1.0)], [(1, 1, "DELETE", None)]) == {}
    # SYNC_E_004 analog: DELETE of a missing key is a no-op, not an error
    assert _merge(spark, [(1, "a", 1.0)], [(1, 9, "DELETE", None)]) == {1: 1.0}


def test_c04_child_before_parent_lands_in_notfound_not_in_state(spark):
    # UPDATE arrives for a key the target never saw (the FK-order /
    # SYNC_E_001 shape): the row must NOT materialize and must be
    # classifiable for the retry loop
    got = _merge(spark, [(1, "a", 1.0)], [(1, 9, "UPDATE", 5.0)])
    assert got == {1: 1.0}  # nothing fabricated


def test_t01_t02_bad_mapping_fails_loudly(spark):
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    # T-01/T-06 analog: unexpressible transform kind -> loud MAP_E-class
    bad_kind = TableMapping(
        "s", "t", "id", (ColumnMapping("id", "id", "SPLIT_MERGE"),)
    )
    with pytest.raises(ValueError):
        compile_select(df, bad_kind)
    # T-02: column mapping referencing a missing source column
    bad_col = TableMapping(
        "s", "t", "id", (ColumnMapping("nope", "id2"),)
    )
    with pytest.raises(Exception):
        compile_select(df, bad_col).collect()
    # CODE_MAP without its dim -> loud, not silent nulls
    bad_dim = TableMapping(
        "s", "t", "id", (ColumnMapping("v", "v2", "CODE_MAP", "G1"),)
    )
    with pytest.raises(ValueError):
        compile_select(df, bad_dim)


def test_t03_cast_failure_is_detectable_for_quarantine(spark):
    # DATA_E_001: under ANSI mode (Spark 4 default) a bad cast THROWS —
    # the whole-job failure the reference's per-row exception handler
    # never risked. The quarantine idiom is try_cast: failures become
    # NULL, and the st06 validate-then-split pattern routes them to the
    # dead-letter side BEFORE apply instead of killing the batch
    df = spark.createDataFrame([("abc",), ("42",)], "raw string")
    out = df.select(
        "raw", F.expr("try_cast(raw AS int)").alias("as_int")
    ).withColumn(
        "quarantined", F.col("as_int").isNull() & F.col("raw").isNotNull()
    )
    got = {r.raw: (r.as_int, r.quarantined) for r in out.collect()}
    assert got == {"abc": (None, True), "42": (42, False)}


def test_t04_code_map_miss_falls_back_visibly(spark):
    df = spark.createDataFrame([(1, "K1"), (2, "K9")], "id long, code string")
    dim = spark.createDataFrame(
        [("K1", "mapped-1")], "source_value string, target_value string"
    )
    spec = TableMapping(
        "s", "t", "id",
        (ColumnMapping("id", "id"), ColumnMapping("code", "code_cd", "CODE_MAP", "G")),
    )
    got = {r.id: r.code_cd for r in compile_select(df, spec, {"G": dim}).collect()}
    # mapped code translates; unmapped code keeps its source value (the
    # r04 fallback — visible, greppable, never a silent null)
    assert got == {1: "mapped-1", 2: "K9"}


def test_t05_default_injection_fills_required_columns(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], "id long, v string")
    spec = TableMapping(
        "s", "t", "id",
        (
            ColumnMapping("id", "id"),
            ColumnMapping("v", "v", "DEFAULT", "DEF"),
            ColumnMapping(None, "created_by", "DEFAULT", "SYNC"),
        ),
    )
    got = {r.id: (r.v, r.created_by) for r in compile_select(df, spec).collect()}
    assert got == {1: ("DEF", "SYNC"), 2: ("x", "SYNC")}


def test_c13_loop_guard_blocks_echo(spark):
    import datetime as dt

    from cdc_sync_poc_spark.functions.loopguard import with_loop_blocked

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, "h1"),                                  # applied
        (1, t0 + dt.timedelta(seconds=60), "h1"),       # echo within window -> blocked
        (2, t0 + dt.timedelta(seconds=400), "h1"),      # outside window -> applied
    ]
    df = spark.createDataFrame(rows, ["cdc_seq", "ts", "change_hash"])
    got = {r.cdc_seq: r.loop_blocked for r in with_loop_blocked(df).collect()}
    assert got == {0: False, 1: True, 2: False}
