"""Query registry — the driver contract surface.

Every operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string over the fixture views (``region nation customer
supplier part orders lineitem events documents embeddings``).

``__spark_entry__.queries()`` / ``oracle_sql()`` simply expose these
dicts. Column names are aliased identically on both sides because the
driver's compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is DuckDB SQL or None
    for non-SQL-expressible ops (driver then records a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_queries() -> None:
    """Import every module that registers queries (idempotent)."""
    import cdc_sync_poc_spark.cdc.envelope  # noqa: F401
    import cdc_sync_poc_spark.cdc.pipeline  # noqa: F401
    import cdc_sync_poc_spark.llm.dedup  # noqa: F401
    import cdc_sync_poc_spark.llm.multimodal  # noqa: F401
    import cdc_sync_poc_spark.llm.similarity  # noqa: F401
    import cdc_sync_poc_spark.llm.text  # noqa: F401
    import cdc_sync_poc_spark.llm.text_stats  # noqa: F401
    import cdc_sync_poc_spark.operators.aggregates  # noqa: F401
    import cdc_sync_poc_spark.operators.apply  # noqa: F401
    import cdc_sync_poc_spark.operators.bench_relational  # noqa: F401
    import cdc_sync_poc_spark.operators.conflict  # noqa: F401
    import cdc_sync_poc_spark.operators.joins  # noqa: F401
    import cdc_sync_poc_spark.operators.rowops  # noqa: F401
    import cdc_sync_poc_spark.operators.sorts  # noqa: F401
    import cdc_sync_poc_spark.operators.stateful  # noqa: F401
