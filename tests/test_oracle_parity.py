"""The central correctness gate, mirroring the driver: every registered
query runs on Spark AND its DuckDB oracle; results must match exactly
(row count + sorted column names + order-insensitive values).
"""

from __future__ import annotations

import pytest

from cdc_sync_poc_spark.registry import ORACLES, QUERIES, load_all_queries
from tests.compare import compare_frames
from tests.conftest import SF_DIR

load_all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(spark_pdf) >= 0  # rows-only check (non-SQL-expressible)
        return
    duck_pdf = duck.sql(ORACLES[name]).df()
    assert compare_frames(spark_pdf, duck_pdf) == "MATCH"


def test_all_queries_have_oracles_unless_documented():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # non-SQL-expressible ops may omit oracles; keep the list explicit
    allowed_missing: set[str] = set()
    assert set(missing) <= allowed_missing, (
        f"queries without oracle SQL: {missing}"
    )
