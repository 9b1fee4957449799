"""Scale-path evidence: dynamic partition pruning (DPP).

When a partitioned fact table joins a dim whose filter selects few
join-key values, Catalyst turns the dim side into a runtime subquery
on the fact scan's PartitionFilters — the fact table's directory
listing is pruned at execution time to just the partitions that can
match. On a 100 TB lake partitioned by the join key this is the
difference between scanning every partition and scanning one; the
bloom-filter test covers the row-level analog for non-partition keys.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_sync_poc_spark.sources.loader import load_table
from tests.conftest import SF_DIR

_CONFS = {
    # the fixture dim is tiny, so force the decision off size stats
    "spark.sql.optimizer.dynamicPartitionPruning.useStats": "false",
    "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio": "10",
}


@pytest.fixture()
def dpp_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, dpp_confs, tmp_path):
    out = str(tmp_path / "orders_by_prio")
    orders = load_table(spark, SF_DIR, "orders")
    orders.write.partitionBy("o_orderpriority").parquet(out)
    fact = spark.read.parquet(out)

    # a filtered dim keyed on the partition column — the DPP trigger
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("5-LOW", 0)], "o_orderpriority string, keep int"
    ).filter("keep = 1")
    j = fact.join(dim, "o_orderpriority").groupBy("o_orderpriority").agg(
        F.count("*").alias("n")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan

    # pruning is advisory, never semantic: result equals the plain join
    got = {(r.o_orderpriority, r.n) for r in j.collect()}
    want = {
        (r.o_orderpriority, r.n)
        for r in orders.filter("o_orderpriority = '1-URGENT'")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
