"""Mapping compiler at production width (VERDICT r4 #7): the reference
syncs 171 tables driven by SYNC_TABLE_MAPPING / SYNC_COLUMN_MAPPING
configuration (reference CLAUDE.md:34-42, docs/02-설계/01_동기화_설계.md
:168-206). plans/mapping.py claims that width is "configuration, not
code" — this test generates a 171-table spec, compiles every table, and
pins the plan shape, turning the claim into evidence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_sync_poc_spark.plans.mapping import (
    ColumnMapping,
    TableMapping,
    compile_select,
)

N_TABLES = 171


def _spec(i: int) -> TableMapping:
    """One synthetic table spec exercising every transform kind; shape
    varies with i so the 171 specs are not one spec repeated."""
    cols = [
        ColumnMapping("k", f"t{i}_id"),
        ColumnMapping("code", f"t{i}_code_cd", "CODE_MAP", "STATUS"),
        ColumnMapping("yn", f"t{i}_active", "CASE_YN"),
        ColumnMapping("amt", f"t{i}_amount", "CAST", "double"),
        ColumnMapping("note", f"t{i}_note", "DEFAULT", "N/A"),
        ColumnMapping(None, f"t{i}_created_by", "DEFAULT", "SYNC"),
    ]
    if i % 3 == 0:  # a second code group on every third table
        cols.append(ColumnMapping("code2", f"t{i}_tier_cd", "CODE_MAP", "TIER"))
    return TableMapping(f"src_{i}", f"tgt_{i}", "k", tuple(cols))


@pytest.fixture(scope="module")
def mapping_world(spark):
    src = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("code"),
        F.when(F.col("id") % 2 == 0, "Y").otherwise("N").alias("yn"),
        (F.col("id") * 10).cast("long").alias("amt"),
        F.when(F.col("id") % 4 == 0, None).otherwise(F.lit("note")).alias("note"),
        (F.col("id") % 3).cast("string").alias("code2"),
    )
    dims = {
        "STATUS": spark.createDataFrame(
            [(str(v), f"S{v}") for v in range(4)],  # value 4 falls back
            "source_value string, target_value string",
        ),
        "TIER": spark.createDataFrame(
            [(str(v), f"T{v}") for v in range(3)],
            "source_value string, target_value string",
        ),
    }
    return src, dims


def test_all_171_tables_compile_and_resolve(mapping_world):
    """Every table of the production-width scope compiles to an
    ANALYZED plan (schema fully resolved) with exactly the target
    columns — no per-table hand-written code anywhere."""
    src, dims = mapping_world
    for i in range(N_TABLES):
        spec = _spec(i)
        out = compile_select(src, spec, dims)
        assert out.columns == [c.target for c in spec.columns], spec.target_table
        # analysis already ran (columns forces it); dtypes resolved too
        want_amt = dict(out.dtypes)[f"t{i}_amount"]
        assert want_amt == "double"


def test_mapping_plan_shape_is_one_join_per_code_group(mapping_world):
    """The compiled plan is select-list + ONE broadcast join per
    DISTINCT code group (never per column, never per row — the
    reference's FN_CONVERT_CODE does an O(rows) lookup SELECT per
    value): 1 join for the 1-group shape, 2 for the 2-group shape."""
    src, dims = mapping_world
    for i, want_joins in ((1, 1), (3, 2)):
        plan = (
            compile_select(src, _spec(i), dims)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan.count("Join LeftOuter") == want_joins, plan


def test_mapping_results_correct_on_sample_tables(mapping_world):
    """Spot-execute three of the 171: values, fallbacks, defaults."""
    src, dims = mapping_world
    for i in (0, 1, 170):
        rows = {r[f"t{i}_id"]: r for r in compile_select(src, _spec(i), dims).collect()}
        assert len(rows) == 100
        assert rows[0][f"t{i}_code_cd"] == "S0"
        assert rows[4][f"t{i}_code_cd"] == "4"  # unmapped -> fallback
        assert rows[2][f"t{i}_active"] == 1 and rows[3][f"t{i}_active"] == 0
        assert rows[3][f"t{i}_amount"] == 30.0
        assert rows[4][f"t{i}_note"] == "N/A" and rows[5][f"t{i}_note"] == "note"
        assert rows[7][f"t{i}_created_by"] == "SYNC"
        if i % 3 == 0:
            assert rows[5][f"t{i}_tier_cd"] == "T2"
