"""Repo-wide physical-plan contract (SURVEY §2.9 + the scale rules):
every registered query's executed plan is swept at sf0.001 and pinned
against the anti-patterns the round reviews check by hand —

* no shuffle-based ``CartesianProduct`` anywhere (broadcast-scalar
  attachment shows as BroadcastNestedLoopJoin over a 1-row side and is
  the sanctioned form; a CartesianProduct means two big sides met
  without keys);
* no row-at-a-time Python UDF (``BatchEvalPython``) anywhere;
* Arrow-batched pandas UDFs (``ArrowEvalPython``) only at the ONE
  sanctioned site — the r07 Debezium decimal decode;
* keyed pandas (``FlatMapGroupsInPandas``) only in the queries that
  consume the loop-guard 3+-chain walk (functions/loopguard.py), whose
  fast paths keep singletons and pairs JVM-side.

Adding a query that trips one of these is a deliberate decision: extend
the allowlist here WITH the scale argument, the way loopguard documents
its pandas branch.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# the queries that share the persisted loop-guard walk (stateful dedup
# family + its audit/apply/pipeline consumers)
LOOPGUARD_CONSUMERS = {
    "sink_audit_log",
    "a01_global_counters",
    "a02_group_by_topic",
    "a03_group_by_status",
    "a04_max_last_ts",
    "pipeline_e2e",
    "ap05_exactly_once_mark",
    "ap06_sequential_replay",
    "s04_union_merge_sort",
    "st01_loop_dedup",
}
ARROW_SANCTIONED = {"r07_decimal_decode"}


@pytest.fixture(scope="module")
def plans(spark):
    from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    return {
        name: fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        for name, fn in QUERIES.items()
    }


def test_no_cartesian_product_anywhere(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert bad == [], bad


def test_no_row_at_a_time_python_udf_anywhere(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert bad == [], bad


def test_arrow_pandas_udf_only_at_sanctioned_site(plans):
    got = {n for n, p in plans.items() if "ArrowEvalPython" in p}
    assert got <= ARROW_SANCTIONED, sorted(got - ARROW_SANCTIONED)


def test_keyed_pandas_only_for_loopguard_chains(plans):
    got = {n for n, p in plans.items() if "FlatMapGroupsInPandas" in p}
    assert got <= LOOPGUARD_CONSUMERS, sorted(got - LOOPGUARD_CONSUMERS)
