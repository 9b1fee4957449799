#!/usr/bin/env python
"""Per-query profiling harness (optimization round 14).

For each named query: time the DataFrame CONSTRUCTION (Python build +
py4j chatter; analysis happens lazily) and the EXECUTION (`count()`,
the bench's timed action) separately, several reps each, and count the
Spark jobs one execution schedules — the fixed per-job overhead is the
dominant cost at bench SF, so job count is the structural number the
shuffle/stage work below the data sizes shows up as.

Usage: python tools/profile_query.py q1 q2 ... [--reps N] [--sf DIR]
Prints one line per query: construct s / exec s (min of reps) / jobs.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    from cdc_sync_poc_spark import get_spark
    from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker

    for name in args:
        fn = QUERIES[name]
        # warm shared caches once (not timed)
        fn(spark, sf_dir).count()
        con_s, exe_s, jobs = [], [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            j0 = len(tracker().getJobIdsForGroup(None) or [])
            ids0 = set(tracker().getJobIdsForGroup(None) or [])
            df.count()
            t2 = time.perf_counter()
            ids1 = set(tracker().getJobIdsForGroup(None) or [])
            jobs = len(ids1 - ids0)
            con_s.append(t1 - t0)
            exe_s.append(t2 - t1)
        print(
            f"{name}: construct {min(con_s):.3f}s exec {min(exe_s):.3f}s "
            f"jobs {jobs}"
        )


if __name__ == "__main__":
    main()
