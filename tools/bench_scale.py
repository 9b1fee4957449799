#!/usr/bin/env python
"""Scale-credibility probe (VERDICT r14 "Next round" #7): run the
heaviest headline queries once at a LARGER fixture than the driver
ships (the derived sf1 from tools/gen_scale_fixture.py) at a given
core count, so the 8-vs-32-core ratio measures data parallelism
instead of the scheduling overhead that dominates sf0.1 (where the r14
driver measured the whole suite FASTER on 8 cores than 32).

One core count per process (fresh JVM — the 8-core run must not
inherit a 32-core session): the caller runs it twice and merges.

Usage: SPARK_GRAFT_CPUS=32 python tools/bench_scale.py [--sf=DIR]
       [--out=FILE] [names...]
Emits one JSON object: {"cpus": N, "sf_dir": ..., "queries":
{name: min_warm_sec}} (warm min-of-2: first run builds the shared
caches, the next two are timed — same steady-state semantics as the
bench's scale probe).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# heaviest steady-state queries of the r15 baseline ledger plus the
# warmup-heavy cache builders (their build IS the 100 TB cost)
DEFAULT_NAMES = [
    "dedup_ngram_jaccard",      # builds shingle+signature caches
    "corpus_decontam_incremental",
    "bench_q21_waiting",
    "dedup_span_intervals",
    "graph_pagerank_mass",
    "events_kmv_distinct",
    "dedup_winnowing_pairs",
    "bench_q18_large_orders",
    "sim_ann_topk_all",
    "mm_dedup_phash",
    "text_rarity_score",
    "ap09_reconciliation",
    "bench_q10_returned",
    "corpus_contamination",
    "dedup_minhash_estimate",
]


def main() -> None:
    sf_dir = "/root/scale_fixture/sf1"
    out = None
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif not a.startswith("--"):
            names.append(a)
    names = names or DEFAULT_NAMES

    from cdc_sync_poc_spark import get_spark
    from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    spark = get_spark("bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()

    timings: dict[str, float] = {}
    for name in names:
        try:
            QUERIES[name](spark, sf_dir).count()  # warm: cache builds
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001 — one failure must not
            # void the probe
            timings[name] = None
            print(f"# ERROR {name}: {str(ex)[:200]}", file=sys.stderr)
        print(f"# {name}: {timings[name]}", file=sys.stderr)

    result = {"cpus": cpus, "sf_dir": sf_dir, "queries": timings}
    line = json.dumps(result)
    print(line)
    if out:
        pathlib.Path(out).write_text(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
