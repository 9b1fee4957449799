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
* CAST(type)        — type cast (r05)
* DEFAULT(value)    — NVL/constant injection (r08)
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
