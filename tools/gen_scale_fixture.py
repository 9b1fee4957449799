#!/usr/bin/env python
"""Derive a larger scale fixture from /root/testdata/sf0.1 (VERDICT r14
"Next round" #7: one scale-credible data point — at sf0.1 the whole
suite is scheduling-bound, 8 cores beat 32, so per-query parallelism
claims need a bigger input than the driver ships).

The driver's testdata is read-only and its generator is not public, so
the fixture is EXTRAPOLATED: N disjoint deterministic shards of sf0.1,
written outside /root/testdata. Design constraints, in order:

* Joins/FKs stay consistent per shard: every key column gets the same
  +c * KEY_OFFSET shift, so cross-shard joins cannot occur and data
  volume per join key distribution matches sf0.1 exactly.
* Duplicate structure scales LINEARLY: document texts get a per-shard
  word tag (word -> word~c), so shards share no shingles/spans/
  fingerprints and the dedup families see 10 independent sf0.1
  corpora — NOT a 10x-duplicated corpus whose posting lists and
  candidate pairs would blow up quadratically and measure an unreal
  workload. Within-shard duplicate structure is bit-identical to
  sf0.1.
* Embedding geometry is preserved but decorrelated: each shard's
  vectors are circularly rotated by 7*c dimensions — norms, pairwise
  dot products WITHIN a shard, and the per-dimension value population
  are all preserved; cross-shard near-duplicates are not introduced.

This fixture is for SCALING MEASUREMENT ONLY (tools/bench_scale.py):
no oracle runs against it, nothing in the repo reads it outside that
probe, and nothing is precomputed from it.

Usage: python tools/gen_scale_fixture.py [--copies=10] [--out=DIR]
                                         [--src=/root/testdata/sf0.1]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

KEY_OFFSET = 100_000_000  # far above any sf0.1 key value

# every column that is (or references) an entity id, per table
_KEY_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

EMB_ROT_STEP = 7  # dims rotated per shard copy (coprime-ish with 64)


def main() -> None:
    copies = 10
    out = "/root/scale_fixture/sf1"
    src = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
        if a.startswith("--src="):
            src = a.split("=", 1)[1]

    from pyspark.sql import functions as F

    from cdc_sync_poc_spark import get_spark

    spark = get_spark("gen-scale-fixture")
    spark.sparkContext.setLogLevel("ERROR")

    for table, key_cols in _KEY_COLS.items():
        base = spark.read.parquet(f"{src}/{table}.parquet")
        cols = base.columns
        missing = [k for k in key_cols if k not in cols]
        assert not missing, f"{table}: fixture schema drifted: {missing}"
        shards = []
        for c in range(copies):
            df = base
            for k in key_cols:
                df = df.withColumn(k, F.col(k) + F.lit(c * KEY_OFFSET))
            if table == "documents":
                # word -> word~c: shards share no shingles (see module
                # docstring); c=0 keeps sf0.1's exact text so one shard
                # is the original corpus
                if c > 0:
                    df = df.withColumn(
                        "text",
                        F.array_join(
                            F.transform(
                                F.split(F.col("text"), " "),
                                lambda w: F.concat(w, F.lit(f"~{c}")),
                            ),
                            " ",
                        ),
                    )
            if table == "embeddings" and c > 0:
                rot = (c * EMB_ROT_STEP) % 64
                if rot:
                    df = df.withColumn(
                        "embedding",
                        F.concat(
                            F.slice(F.col("embedding"), rot + 1, 64 - rot),
                            F.slice(F.col("embedding"), 1, rot),
                        ),
                    )
            shards.append(df)
        full = shards[0]
        for s in shards[1:]:
            full = full.unionByName(s)
        tmp = f"{out}/_tmp_{table}"
        full.coalesce(4).write.mode("overwrite").parquet(tmp)
        # the driver fixture layout is ONE parquet FILE per table
        # (loader reads {dir}/{table}.parquet as a file) — consolidate
        # the Spark output directory into a single file
        import shutil

        import pyarrow.dataset as ds
        import pyarrow.parquet as pq

        tbl = ds.dataset(tmp, format="parquet").to_table()
        pq.write_table(tbl, f"{out}/{table}.parquet",
                       compression="snappy", row_group_size=200_000)
        shutil.rmtree(tmp)
        print(f"{table}: {base.count()} -> {copies}x written")
    spark.stop()
    print(f"done: {out}")


if __name__ == "__main__":
    main()
