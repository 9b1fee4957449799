"""bench.py driver contract: one JSON-serializable dict with metric /
value / unit / queries / sf, and every listed query resolvable."""

from __future__ import annotations

import json

from tests.conftest import SF_DIR


def test_bench_run_contract(spark):
    import bench

    result = bench.run(
        spark=spark, sf_dir=SF_DIR, names=["bench_q1_pricing", "dedup_exact"]
    )
    line = json.dumps(result)  # must be one serializable JSON line
    parsed = json.loads(line)
    assert parsed["unit"] == "sec"
    assert set(parsed["queries"]) == {"bench_q1_pricing", "dedup_exact"}
    assert parsed["value"] >= 0 and parsed["sf"] == 0.001
    assert abs(parsed["value"] - sum(parsed["queries"].values())) < 1e-6
    # round-4 additions: medians reported alongside mins, same keys,
    # median >= min per query
    assert set(parsed["queries_median"]) == set(parsed["queries"])
    assert abs(
        parsed["value_median"] - sum(parsed["queries_median"].values())
    ) < 1e-6
    for k in parsed["queries"]:
        assert parsed["queries_median"][k] >= parsed["queries"][k] - 1e-9, k


def test_bench_summary_line_is_small_and_self_contained(spark):
    """The LAST stdout line of bench.py is a short summary that must
    survive a tail-truncated capture: bounded size, parseable on its
    own, and carrying the headline scalars."""
    import bench

    result = bench.run(spark=spark, sf_dir=SF_DIR, names=["bench_q1_pricing"])
    line = json.dumps(bench.summarize(result))
    assert len(line) < 500  # a tail capture always keeps this intact
    parsed = json.loads(line)
    assert parsed["value"] == result["value"]
    assert parsed["value_median"] == result["value_median"]
    assert parsed["sf"] == result["sf"]
    assert parsed["n_queries"] == 1 and parsed["n_errors"] == 0
    assert "queries" not in parsed  # summary-only: no per-query maps


def test_bench_list_is_resolvable():
    import bench
    from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing


def test_bench_ledger_covers_registry():
    """Coverage ledger: headline + excluded-with-reason = the whole
    registry, disjoint; every excluded id carries a non-empty reason."""
    import bench
    from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    headline, excluded = set(bench.BENCH_QUERIES), set(bench.BENCH_EXCLUDED)
    assert not headline & excluded
    assert headline | excluded == set(QUERIES), (
        sorted(set(QUERIES) - headline - excluded),  # unledgered
        sorted((headline | excluded) - set(QUERIES)),  # stale ledger ids
    )
    assert all(bench.BENCH_EXCLUDED[q].strip() for q in excluded)


def test_scale_probe_emits_exponents(spark):
    """The scale-probe re-runs the top-K queries at the smaller sibling
    sf dirs and fits a per-query exponent over the largest decade."""
    import bench

    timings = {"bench_q1_pricing": 1.0, "dedup_exact": 0.5}
    old_k = bench.SCALE_PROBE_TOP_K
    bench.SCALE_PROBE_TOP_K = 1  # probe only the most expensive
    try:
        scaling = bench.scale_probe(
            spark, "/root/testdata/sf0.01", 0.01, timings
        )
    finally:
        bench.SCALE_PROBE_TOP_K = old_k
    assert set(scaling) == {"bench_q1_pricing"}
    entry = scaling["bench_q1_pricing"]
    # one probe point (sf0.001) + the main-pass time
    assert set(entry["t"]) == {"0.001", "0.01"}
    assert entry["t"]["0.01"] == 1.0
    assert entry["t"]["0.001"] > 0
    assert entry["exponent"] is not None
