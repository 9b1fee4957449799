"""Scale-path evidence: bucketed tables eliminate the join shuffle.

At 100 TB the base/landing tables are bucketed (or Delta-partitioned) on
the MERGE key so the per-batch apply join is co-located. This test proves
the mechanism on the fixture data: writing both sides bucketed by the
join key removes every Exchange from the join plan that the unbucketed
plan needs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from cdc_sync_poc_spark.sources.loader import load_table

    wh = tmp_path_factory.mktemp("bucketed")
    load_table(spark, SF_DIR, "customer").write.bucketBy(8, "c_custkey").sortBy(
        "c_custkey"
    ).option("path", str(wh / "customer_b")).mode("overwrite").saveAsTable(
        "customer_b"
    )
    load_table(spark, SF_DIR, "orders").write.bucketBy(8, "o_custkey").sortBy(
        "o_custkey"
    ).option("path", str(wh / "orders_b")).mode("overwrite").saveAsTable("orders_b")
    yield
    spark.sql("DROP TABLE IF EXISTS customer_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


@pytest.fixture()
def no_broadcast(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_eliminates_shuffle(spark, bucketed_tables, no_broadcast):
    c = spark.table("customer_b")
    o = spark.table("orders_b")
    joined = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_custkey").agg(
        F.count("*").alias("n_orders")
    )
    plan = _plan(joined)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan
    assert joined.count() > 0


def test_unbucketed_join_shuffles_for_contrast(spark, no_broadcast):
    from cdc_sync_poc_spark.sources.loader import load_table

    c = load_table(spark, SF_DIR, "customer")
    o = load_table(spark, SF_DIR, "orders")
    joined = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_custkey").agg(
        F.count("*").alias("n_orders")
    )
    assert "Exchange hashpartitioning" in _plan(joined)