#!/usr/bin/env python
"""Capture `.explain("formatted")` output for named queries into
plans/<round>/<query>_<tag>.txt (default round: r15) (optimization-round evidence).

Usage: python tools/capture_plan.py TAG q1 q2 ... [--sf=DIR] [--exec] [--round=rNN]

--exec runs the query (count) before explaining, so AQE's FINAL plan
is captured (isFinalPlan=true, with ReusedExchange / AQEShuffleRead
nodes) instead of the initial one — needed when the claim under
evidence is runtime exchange reuse.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    tag = sys.argv[1]
    names = [a for a in sys.argv[2:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[2:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    from cdc_sync_poc_spark import get_spark
    from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    spark = get_spark("capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    rnd = "r15"
    for a in sys.argv[2:]:
        if a.startswith("--round="):
            rnd = a.split("=", 1)[1]
    out_dir = pathlib.Path(__file__).resolve().parents[1] / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    execute = "--exec" in sys.argv
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        if execute:
            # collect, not count: count() wraps the plan in its OWN
            # QueryExecution, leaving this one un-executed (explain
            # would still print the initial isFinalPlan=false plan)
            df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(plan)
        print(f"{name} -> {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
