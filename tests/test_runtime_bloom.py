"""Scale-path evidence: Spark's runtime bloom-filter join pruning.

When a shuffle join's build side is selective, Catalyst can inject a
bloom filter built from the build-side keys as a ``might_contain``
predicate on the PROBE-side scan — rows that cannot match are dropped
before the shuffle, which at 100 TB is the difference between
shuffling the whole fact table and shuffling the ~matching slice.
The feature is size-gated (probe side must look big enough to be worth
it), so the thresholds are lowered here to demonstrate the plan shape
the real cluster gets for free; correctness is asserted against the
un-filtered join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_sync_poc_spark.sources.loader import load_table
from tests.conftest import SF_DIR

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@pytest.fixture()
def bloom_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_probe_side(spark, bloom_confs):
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan, plan

    # the injected filter is advisory (false positives allowed, no
    # false negatives): the result must equal the plain join's
    got = {(r.o_orderpriority, r.n) for r in j.collect()}
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    want = {
        (r.o_orderpriority, r.n)
        for r in (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        ).collect()
    }
    assert got == want


def test_explicit_bloom_prefilter_prunes_and_is_superset(spark):
    """The explicit DataFrame-level bloom (j09): every true match
    survives the prefilter (no false negatives — exactness of the
    downstream join depends on it), and the prefilter actually prunes
    (the pass-through rate is near |dim|/|fact|, not ~1)."""
    from cdc_sync_poc_spark.operators.joins import bloom_prefilter

    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    dim = (
        load_table(spark, SF_DIR, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    pre = bloom_prefilter(orders, "o_custkey", dim, "c_custkey")
    true_matches = orders.join(
        dim, orders.o_custkey == dim.c_custkey, "left_semi"
    )
    n_orders, n_pre, n_true = orders.count(), pre.count(), true_matches.count()
    # superset of the true matches
    assert true_matches.exceptAll(pre).count() == 0
    assert n_true <= n_pre
    # and a real prefilter: with ~1% selective dim and 2^14 bits the
    # false-positive mass is tiny — require at least 2x pruning
    assert n_pre < n_orders / 2
