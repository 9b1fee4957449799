"""Skew-salting for hot join keys.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; salting is the explicit tool for the pathological case — a join
key where a handful of values dominate (e.g. one customer producing half
the change stream) and the skewed side is too hot even for AQE splits.

Pattern: explode the SMALL side into ``factor`` copies per row (one per
salt value), salt the LARGE side randomly-but-deterministically (hash of
a unique column mod factor — never rand(), which breaks retries and
lineage), and join on (key, salt). Each hot key's rows then spread over
``factor`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_large_side(df: DataFrame, unique_col: str, factor: int) -> DataFrame:
    """Deterministic salt for the skewed (large) side: a stable hash of a
    unique column mod ``factor`` — reproducible across task retries."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(factor))
    )


def explode_small_side(df: DataFrame, factor: int) -> DataFrame:
    """Replicate the small side once per salt value."""
    salts = F.array(*[F.lit(i).cast("long") for i in range(factor)])
    return df.withColumn(SALT_COL, F.explode(salts))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Column,
    unique_col: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` (skewed) with ``small`` on ``on`` + matching salt,
    spreading each hot key over ``factor`` partitions. Result equals the
    unsalted join (each large row matches exactly one salt copy) ONLY
    for inner/left joins: a right or full_outer join would emit each
    unmatched small-side row once per exploded salt copy, so those are
    rejected rather than silently duplicating rows."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "outer joins duplicate unmatched small-side rows per salt copy"
        )
    l = salt_large_side(large, unique_col, factor)
    s = explode_small_side(small, factor)
    joined = l.join(s, on & (l[SALT_COL] == s[SALT_COL]), how)
    return joined.drop(SALT_COL)
