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


# ---------------------------------------------------------------------------
# Mirror direction at production width (VERDICT r6 #7 remainder / r7 #3)
# ---------------------------------------------------------------------------

from cdc_sync_poc_spark.plans.mapping import invert_dims, invert_mapping

# original dtype of every CAST column's source — what the return leg
# casts back to (the forward spec only records the cast TARGET type)
_SOURCE_TYPES = {"amt": "bigint"}


def _lossless(spec: TableMapping) -> TableMapping:
    """The invertible core of a spec: DEFAULT-with-source relaxed to
    RENAME (null-filling is not undoable) and injected constants
    dropped — exactly what invert_mapping documents as lossy."""
    cols = []
    for cm in spec.columns:
        if cm.transform == "DEFAULT":
            if cm.source is None:
                continue
            cols.append(ColumnMapping(cm.source, cm.target))
        else:
            cols.append(cm)
    return TableMapping(spec.source_table, spec.target_table, spec.key, tuple(cols))


@pytest.mark.slow
def test_all_171_mirror_specs_compile_and_invert_involutes(mapping_world):
    """Every one of the 171 specs mirrors into a TOBE->ASIS spec that
    (a) compiles to an ANALYZED plan against the forward OUTPUT with
    exactly the original source columns, and (b) double-inversion is
    the identity on the spec's invertible core — compile->invert->
    compile round-trips at full production width."""
    src, dims = mapping_world
    rdims = invert_dims(dims)
    for i in range(N_TABLES):
        spec = _spec(i)
        fwd = compile_select(src, spec, dims)
        mirror = invert_mapping(spec, _SOURCE_TYPES)
        assert mirror.source_table == f"tgt_{i}"
        assert mirror.target_table == f"src_{i}"
        assert mirror.key == f"t{i}_id"
        back = compile_select(fwd, mirror, rdims)
        want_cols = [c.source for c in spec.columns if c.source is not None]
        assert back.columns == want_cols, spec.target_table
        assert dict(back.dtypes)["amt"] == "bigint"
        # involution: invert(invert(spec)) == the spec's invertible core
        mirror_types = {f"t{i}_amount": "double"}
        assert invert_mapping(mirror, mirror_types) == _lossless(spec)


def test_mirror_roundtrip_is_identity_on_sample_tables(mapping_world):
    """Spot-execute the round trip on three of the 171: source ->
    forward compile -> mirror compile recovers the NORMALIZED source
    exactly (normalization = the forward DEFAULT null-fill, the one
    documented lossy transform; every other column is bit-identical,
    including the unmapped-code fallback passing back through the
    mirrored dim's fallback)."""
    src, dims = mapping_world
    rdims = invert_dims(dims)
    for i in (0, 1, 170):
        spec = _spec(i)
        mirror = invert_mapping(spec, _SOURCE_TYPES)
        back = compile_select(compile_select(src, spec, dims), mirror, rdims)
        cols = [c.source for c in spec.columns if c.source is not None]
        normalized = src.withColumn("note", F.coalesce("note", F.lit("N/A")))
        got = {tuple(r) for r in back.select(*cols).collect()}
        want = {tuple(r) for r in normalized.select(*cols).collect()}
        assert got == want, spec.target_table
        # a second trip through the mirror pair is exactly idempotent
        twice = compile_select(compile_select(back, spec, dims), mirror, rdims)
        assert {tuple(r) for r in twice.select(*cols).collect()} == want


def test_mirror_specs_execute_on_tobe_fixture_rows(spark, mapping_world):
    """VERDICT r8 #6: execute the same three MIRRORED specs on
    independent TOBE-side fixture rows — values, fallbacks, defaults —
    so the inverted SELECTs' own semantics are proven directly, not
    only as the second leg of a forward round trip (which can never
    feed the mirror a value the forward leg doesn't produce, e.g. an
    unmapped TOBE-side code)."""
    _, dims = mapping_world
    rdims = invert_dims(dims)
    for i in (0, 1, 170):
        spec = _spec(i)
        mirror = invert_mapping(spec, _SOURCE_TYPES)
        # a TOBE-side table in the forward OUTPUT schema, including a
        # mapped code, an unmapped code (dim fallback), both flag
        # values, and a note that must pass through un-defaulted
        tobe_cols = (
            f"t{i}_id long, t{i}_code_cd string, t{i}_active int,"
            f" t{i}_amount double, t{i}_note string"
        )
        rows = [
            (1, "S2", 1, 10.0, "note"),
            (2, "Z9", 0, 20.5, "N/A"),
        ]
        if i % 3 == 0:
            tobe = spark.createDataFrame(
                [r + ("T1",) for r in rows],
                tobe_cols + f", t{i}_tier_cd string",
            )
        else:
            tobe = spark.createDataFrame(rows, tobe_cols)
        back = {r["k"]: r for r in compile_select(tobe, mirror, rdims).collect()}
        assert len(back) == 2
        assert back[1]["code"] == "2"      # mirrored CODE_MAP
        assert back[2]["code"] == "Z9"     # unmapped -> dim fallback
        assert back[1]["yn"] == "Y"        # CASE_10 -> 'Y'
        assert back[2]["yn"] == "N"
        assert back[1]["amt"] == 10        # CAST back to bigint
        assert back[2]["amt"] == 20        # truncating cast, documented
        assert back[2]["note"] == "N/A"    # DEFAULT mirror = plain RENAME
        if i % 3 == 0:
            assert back[1]["code2"] == "1"
