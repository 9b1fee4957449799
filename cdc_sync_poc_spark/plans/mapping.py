"""Mapping-spec-driven transform compiler.

The reference drives its ASIS<->TOBE transforms from configuration:
table/column/code/default mapping (design tables SYNC_TABLE_MAPPING /
SYNC_COLUMN_MAPPING / SYNC_CODE_MAPPING,
docs/02-설계/01_동기화_설계.md:168-206) hand-expanded into PL/SQL
select-lists (poc/tobe-oracle/init/04_create_procedures.sql:159-172).
Here the spec is data and the compiler emits Column expressions — one
declarative ``select`` per table, so adding the production target's 171
tables (CLAUDE.md:34-42) is configuration, not code.

Transform kinds:

* RENAME            — plain alias
* CODE_MAP(dim)     — broadcast left join + coalesce fallback (r04)
* CASE_YN           — 'Y'/'N' char -> 1/0 (r03)
* CASE_10           — 1/0 -> 'Y'/'N' (the mirror of CASE_YN)
* CAST(type)        — type cast (r05)
* DEFAULT(value)    — NVL/constant injection (r08)

The reference scope is BIDIRECTIONAL (ASIS->TOBE and TOBE->ASIS over
the same mapping rows, reference CLAUDE.md:34-42 + reverse mapping
seeds poc/asis-oracle/init/03_create_mapping_tables.sql:24-35);
``invert_mapping`` derives the mirror-direction spec from a forward
spec, so one configured direction yields both compiled plans. The
value-lossy transforms are exactly the non-invertible part: a
DEFAULT's null-filling cannot be undone (its mirror is a plain
RENAME — the normalized value round-trips exactly), and a
target-only constant column has no source twin (dropped). Everything
else — renames, code maps (mirrored dim), Y/N flags, casts — inverts
to data-level round-trip identity, which tests/test_mapping_scale.py
asserts at the production 171-table width. Caveat on the flag pair
(ADVICE r8): CASE_YN maps NULL and any non-'Y' value to 0, which the
CASE_10 mirror returns as 'N' — so flag round-trip identity holds
only on a clean non-null 'Y'/'N' (resp. 1/0) domain; dirty or null
flag values are silently normalized to the 'N'/0 leg, the same
one-way normalization DEFAULT performs on nulls.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnMapping:
    source: str | None  # None => target-only constant column
    target: str
    transform: str = "RENAME"  # RENAME | CODE_MAP | CASE_YN | CAST | DEFAULT
    arg: str | None = None  # CAST: type name; DEFAULT: literal; CODE_MAP: map group


@dataclass(frozen=True)
class TableMapping:
    source_table: str
    target_table: str
    key: str
    columns: tuple[ColumnMapping, ...]


def compile_select(
    df: DataFrame,
    spec: TableMapping,
    code_dims: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Compile a TableMapping into one DataFrame plan.

    ``code_dims`` maps a CODE_MAP group name to a small dim DataFrame
    with columns (source_value, target_value); each used dim is
    broadcast-joined once (NOT per-row lookups — FN_CONVERT_CODE's
    O(rows) SELECTs collapse into one hash join per group).
    """
    out = df
    joined_groups: dict[str, str] = {}
    for cm in spec.columns:
        if cm.transform == "CODE_MAP":
            if cm.arg is None or code_dims is None or cm.arg not in code_dims:
                raise ValueError(f"CODE_MAP needs a dim for group {cm.arg!r}")
            if cm.arg not in joined_groups:
                dim = code_dims[cm.arg]
                tgt = f"__map_{cm.arg}"
                dim = dim.select(
                    F.col("source_value").alias(f"{tgt}_src"),
                    F.col("target_value").alias(f"{tgt}_tgt"),
                )
                out = out.join(
                    F.broadcast(dim),
                    out[cm.source].cast("string") == dim[f"{tgt}_src"],
                    "left",
                )
                joined_groups[cm.arg] = tgt

    cols: list[Column] = []
    for cm in spec.columns:
        if cm.transform == "RENAME":
            cols.append(F.col(cm.source).alias(cm.target))
        elif cm.transform == "CASE_YN":
            cols.append(
                F.when(F.col(cm.source) == "Y", 1).otherwise(0).alias(cm.target)
            )
        elif cm.transform == "CASE_10":
            cols.append(
                F.when(F.col(cm.source) == 1, "Y").otherwise("N").alias(cm.target)
            )
        elif cm.transform == "CAST":
            cols.append(F.col(cm.source).cast(cm.arg).alias(cm.target))
        elif cm.transform == "DEFAULT":
            if cm.source is None:
                cols.append(F.lit(cm.arg).alias(cm.target))
            else:
                cols.append(
                    F.coalesce(F.col(cm.source), F.lit(cm.arg)).alias(cm.target)
                )
        elif cm.transform == "CODE_MAP":
            tgt = joined_groups[cm.arg]
            cols.append(
                F.coalesce(
                    F.col(f"{tgt}_tgt"), F.col(cm.source).cast("string")
                ).alias(cm.target)
            )
        else:
            raise ValueError(f"unknown transform {cm.transform!r}")
    return out.select(*cols)


def invert_dims(code_dims: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Mirror every code dim: (source_value, target_value) swapped —
    the reference's reverse mapping rows derived instead of re-seeded.
    Correct whenever the dim is a bijection on its mapped values (the
    reference's code tables are; a non-bijective dim is a config error
    in either direction)."""
    return {
        g: dim.select(
            F.col("target_value").alias("source_value"),
            F.col("source_value").alias("target_value"),
        )
        for g, dim in code_dims.items()
    }


def invert_mapping(
    spec: TableMapping, source_types: dict[str, str] | None = None
) -> TableMapping:
    """Derive the mirror-direction TableMapping (TOBE->ASIS from
    ASIS->TOBE or vice versa).

    ``source_types`` supplies the original dtype of every CAST column's
    source (the forward spec only records the cast TARGET type, so the
    return leg needs to be told what to cast back to).

    Lossy-by-design mirrors: DEFAULT with a source column inverts to
    RENAME (null-filling is not undoable — the normalized value is what
    round-trips), and a target-only constant column (source None) is
    dropped. Use the mirrored dims from :func:`invert_dims` when
    compiling the result.
    """
    cols: list[ColumnMapping] = []
    for cm in spec.columns:
        if cm.transform == "RENAME":
            cols.append(ColumnMapping(cm.target, cm.source))
        elif cm.transform == "CODE_MAP":
            cols.append(ColumnMapping(cm.target, cm.source, "CODE_MAP", cm.arg))
        elif cm.transform == "CASE_YN":
            cols.append(ColumnMapping(cm.target, cm.source, "CASE_10"))
        elif cm.transform == "CASE_10":
            cols.append(ColumnMapping(cm.target, cm.source, "CASE_YN"))
        elif cm.transform == "CAST":
            back = (source_types or {}).get(cm.source)
            if back is None:
                raise ValueError(
                    f"invert_mapping needs source_types[{cm.source!r}] "
                    "to mirror a CAST column"
                )
            cols.append(ColumnMapping(cm.target, cm.source, "CAST", back))
        elif cm.transform == "DEFAULT":
            if cm.source is None:
                continue  # injected constant: no source twin to restore
            cols.append(ColumnMapping(cm.target, cm.source))
        else:
            raise ValueError(f"unknown transform {cm.transform!r}")
    by_source = {cm.source: cm.target for cm in spec.columns if cm.source}
    return TableMapping(
        spec.target_table,
        spec.source_table,
        by_source.get(spec.key, spec.key),
        tuple(cols),
    )
