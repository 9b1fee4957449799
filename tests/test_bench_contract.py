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
    # a tail capture keeps the last ~2000 chars; the final line must
    # parse whole from it (r15: per_query rides it under this budget)
    assert len(line) <= bench._SUMMARY_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["value"] == result["value"]
    assert parsed["value_median"] == result["value_median"]
    assert parsed["sf"] == result["sf"]
    assert parsed["n_queries"] == 1 and parsed["n_errors"] == 0
    assert "queries" not in parsed  # the full min/median maps stay off
    # per_query (VERDICT r14 #4): min-of-passes seconds, 2 decimals
    assert parsed["per_query"] == {
        "bench_q1_pricing": round(result["queries"]["bench_q1_pricing"], 2)
    }


def test_bench_summary_per_query_fills_to_budget_heaviest_first():
    """per_query greedily carries the MOST expensive queries and stops
    at the line budget, so the final line stays tail-capture-safe while
    every regression-relevant query is per-query-visible."""
    import bench

    result = {
        "metric": "headline_queries_total",
        "unit": "sec",
        "queries": {f"q{i:03d}_{'x' * 20}": i * 0.01 for i in range(400)},
        "queries_median": {},
        "scaling": {},
        "agg": "a",
        "sf": 0.1,
        "reps": 3,
        "value_median": 1.0,
        "value": 1.0,
        "contention": {"loadavg_1m": 1.0},
    }
    line = json.dumps(bench.summarize(result))
    assert len(line) <= bench._SUMMARY_LINE_BUDGET
    pq = json.loads(line)["per_query"]
    assert 0 < len(pq) < 400  # budget bites before the full map
    kept_min = min(result["queries"][q] for q in pq)
    dropped_max = max(
        v for q, v in result["queries"].items() if q not in pq
    )
    assert kept_min >= dropped_max  # heaviest-first greedy order


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
    sf dirs AND the main sf with one shared methodology (warm min-of-2
    single-query runs, ADVICE r7 — the headline min-of-interleaved-
    passes number is no longer mixed into the fit) and fits a per-query
    exponent over the largest decade."""
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
    # one probe point (sf0.001) + the re-timed main-sf point
    assert set(entry["t"]) == {"0.001", "0.01"}
    # the main point is RE-TIMED under probe methodology, not copied
    # from the headline number fed in
    assert entry["t"]["0.01"] != 1.0 and entry["t"]["0.01"] > 0
    assert entry["t"]["0.001"] > 0
    assert entry["exponent"] is not None
    assert entry["methodology"] == "warm_min_of_2_all_points"


def test_exclusion_ledger_has_no_duplicate_ids():
    """ADVICE r7: an id listed in two exclusion groups collapses
    silently in the BENCH_EXCLUDED flatten — the import-time assert
    plus this test pin the invariant."""
    import bench

    assert len(bench.BENCH_EXCLUDED) == sum(
        len(qs) for qs in bench._EXCLUDE_GROUPS.values()
    )


def test_dedup_candidate_telemetry_fields(spark):
    """VERDICT r7 #4: candidate-set telemetry for the similarity-join
    family — n_candidates (pairs entering exact verification) and
    n_pairs (survivors) per candidate-generating dedup query, with
    candidates >= pairs."""
    from cdc_sync_poc_spark.llm.dedup import dedup_candidate_telemetry

    tel = dedup_candidate_telemetry(spark, SF_DIR)
    assert set(tel) == {
        "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_ppjoin_exact",
    }
    for q, t in tel.items():
        assert set(t) == {"n_candidates", "n_pairs"}, q
        assert t["n_candidates"] >= t["n_pairs"] >= 0, (q, t)
        assert t["n_candidates"] > 0, q  # the fixture corpus has dups


def test_candidate_growth_probe_emits_exponent(spark):
    """VERDICT r8 #4: the bench telemetry block counts candidates at
    the sibling sf dirs too and fits the same two-top-points log-log
    exponent as the time probe. This test runs the telemetry at two sf
    points, applies the identical fit, bounds the growth, and pins the
    field names the bench wires into the detail line (running the full
    bench.run() here would re-time 146 queries)."""
    import math

    import bench

    cand_by_sf = {}
    from cdc_sync_poc_spark.llm.dedup import dedup_candidate_telemetry

    for s, d in (("0.001", "/root/testdata/sf0.001"),
                 ("0.01", "/root/testdata/sf0.01")):
        cand_by_sf[s] = dedup_candidate_telemetry(spark, d)
    # mirror bench.run()'s fit on the collected points
    for q in cand_by_sf["0.01"]:
        pts = sorted(
            (float(s), m[q]["n_candidates"]) for s, m in cand_by_sf.items()
        )
        pos = [(s, c) for s, c in pts if c > 0]
        if len(pos) >= 2:
            e = math.log(pos[-1][1] / pos[-2][1]) / math.log(
                pos[-1][0] / pos[-2][0]
            )
            # sub-quadratic growth is the 100 TB guard this probe exists
            # to watch; the fixture corpus is comfortably sub-linear
            assert e < 2.0, (q, pos, e)
    # and the bench source actually wires the two fields into the
    # detail line (greppable contract with the driver's BENCH_r{N})
    src = open(bench.__file__).read()
    assert '"candidates_by_sf"' in src.replace("'", '"')
    assert '"candidate_exponent"' in src.replace("'", '"')


def test_trend_baseline_contract():
    """BENCH_LOCAL_BASELINE.json exists because the driver's BENCH_r{N}
    artifact is tail-truncated to the summary line: per-query
    round-over-round regression detection needs a repo-owned snapshot.
    Pin its shape and that every baseline query is still registered
    (a renamed/removed query would silently fall out of the trend)."""
    import json
    import pathlib

    import bench
    from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    base = json.loads(
        (pathlib.Path(bench.__file__).parent / "BENCH_LOCAL_BASELINE.json")
        .read_text()
    )
    assert set(base) >= {"round", "sf", "queries"}
    assert base["sf"] == 0.1
    unknown = set(base["queries"]) - set(QUERIES)
    assert unknown == set(), sorted(unknown)
    # and the trend block is wired into the detail line
    src = open(bench.__file__).read()
    assert '"trend"' in src.replace("'", '"')


def test_plan_memo_excludes_every_eager_builder(spark):
    """The registry plan memo (registry.py, r14) may only serve builders
    whose construction is pure plan assembly: a builder that fires Spark
    jobs while CONSTRUCTING computes data, and memoizing its DataFrame
    would cache results across invocations — which the bench/driver
    contract forbids. Pin the measured census both ways: every memoized
    builder fires ZERO jobs on a warm re-construction, and every
    PLAN_MEMO_EXCLUDE entry really is eager (so a fixed builder gets
    un-excluded instead of rotting in the list)."""
    from cdc_sync_poc_spark.registry import (
        PLAN_MEMO_EXCLUDE,
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    unknown = PLAN_MEMO_EXCLUDE - set(QUERIES)
    assert unknown == set(), sorted(unknown)
    tracker = spark.sparkContext.statusTracker
    raw = {
        n: getattr(QUERIES[n], "__wrapped__", QUERIES[n]) for n in QUERIES
    }
    # two warm passes: internal per-session memos (quantizer, stream
    # ingest, cluster labels) settle so the census sees steady state.
    # Warm passes don't need job ATTRIBUTION (only the serial census
    # below does), so they run on a thread pool — 512 serial plan
    # constructions were ~2/3 of this test's ~2 min wall (the driver's
    # suite run must fit its time budget, VERDICT r14 #2).
    from concurrent.futures import ThreadPoolExecutor

    def warm(fn):
        fn(spark, SF_DIR)
        fn(spark, SF_DIR)

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(warm, raw.values()))
    wrongly_memoized = []
    wrongly_excluded = []
    for n, fn in raw.items():
        before = set(tracker().getJobIdsForGroup(None) or [])
        fn(spark, SF_DIR)
        fired = len(set(tracker().getJobIdsForGroup(None) or []) - before)
        if n in PLAN_MEMO_EXCLUDE:
            if fired == 0:
                wrongly_excluded.append(n)
        elif fired > 0:
            wrongly_memoized.append((n, fired))
    assert not wrongly_memoized, (
        "eager construction under the plan memo (results would be "
        f"cached): {wrongly_memoized}"
    )
    assert not wrongly_excluded, (
        "pure builders needlessly excluded from the plan memo: "
        f"{wrongly_excluded}"
    )
