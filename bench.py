#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-count). A
warmup query first absorbs JVM/codegen startup so timings reflect the
plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cdc_sync_poc_spark import get_spark
from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

BENCH_QUERIES = [
    "bench_q1_pricing",
    "bench_q3_shipping",
    "bench_q5_local_supplier",
    "bench_q18_large_orders",
    "st01_loop_dedup",
    "pipeline_e2e",
    "ap01_merge_cdc",
    "dedup_exact",
    "dedup_ngram_jaccard",  # materializes the shared shingle cache
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_topk_bruteforce",
    "sim_ann_lsh",
    "sim_ann_topk_all",
    "sim_ivf_topk",
    "text_quality",
    "plan_mapping_roundtrip",
    "mm_decode_features",
]


def run(spark=None, sf_dir: str | None = None, names: list[str] | None = None) -> dict:
    """Run the bench and return the result dict (separated from main()
    so tests can drive it with a shared session)."""
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    load_all_queries()
    owns_session = spark is None
    if owns_session:
        spark = get_spark("cdc-sync-poc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer caches
    QUERIES["bench_q1_pricing"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names or BENCH_QUERIES:
        t0 = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if owns_session:
        spark.stop()
    return result


def main() -> None:
    print(json.dumps(run()))


if __name__ == "__main__":
    main()
