"""Lake maintenance: small-file compaction for hive-partitioned parquet
sinks — the OPTIMIZE step every streaming/incremental writer needs
(each micro-batch or dynamic-partition overwrite leaves one-file-per-
task debris; a 100 TB lake accumulating thousands of KB-sized files per
partition turns every scan into a listing + open storm).

``compact_partitions`` rewrites each partition directory whose file
population is worse than the target (more files than ``ceil(bytes /
target_bytes)``) into exactly that many files, via coalesce — a
map-only rewrite, no shuffle — and swaps the directory atomically
(write to a sibling temp dir, rename old out, rename new in; the same
crash-recoverable two-phase swap as the CDC writer's state buckets).
Partitions already at or under the target file count are NOT touched —
compaction cost is proportional to the debris, not the lake.

This is the manual recipe for a plain parquet directory; on a table
format (Delta/Iceberg) the same decision logic drives OPTIMIZE /
rewrite_data_files, which add snapshot isolation on top. Readers racing
the rename see either the old or the new directory listing — both are
complete copies of the data (document-level atomicity per partition,
not table-level; the table-format upgrade is exactly about making this
table-level).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of the parquet files in ``path``."""
    n = b = 0
    for f in os.listdir(path):
        if f.endswith(".parquet") and not f.startswith((".", "_")):
            n += 1
            b += os.path.getsize(os.path.join(path, f))
    return n, b


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> list[dict]:
    """Compact each hive partition dir under ``path`` (or ``path``
    itself when unpartitioned) to ``ceil(bytes / target_bytes)`` files.
    Returns a per-partition report: partition, files_before,
    files_after, bytes (only touched partitions appear)."""
    parts = [
        d
        for d in sorted(os.listdir(path))
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]
    targets = parts if parts else [""]
    report: list[dict] = []
    for part in targets:
        pdir = os.path.join(path, part) if part else path
        n_files, n_bytes = _dir_stats(pdir)
        want = max(1, math.ceil(n_bytes / target_bytes))
        if n_files <= want:
            continue
        tmp = pdir.rstrip("/") + ".compact-tmp"
        old = pdir.rstrip("/") + ".compact-old"
        # read THIS partition's data files only (no partition-column
        # recursion) and rewrite as `want` files — coalesce is a
        # map-only fan-in, no shuffle
        spark.read.parquet(pdir).coalesce(want).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)  # stale crash debris
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old)
        after, _ = _dir_stats(pdir)
        report.append(
            {
                "partition": part or ".",
                "files_before": n_files,
                "files_after": after,
                "bytes": n_bytes,
            }
        )
    return report


def expire_old_batches(path: str, keep_latest: int) -> list[int]:
    """Retention for per-batch partition sinks (the audit log, the
    streaming dedup-index dirs): delete ``batch_id=N`` partitions older
    than the newest ``keep_latest`` — the TTL sweep that keeps an
    append-forever sink bounded (the reference's SP_CLEANUP_HASH job,
    generalized to any batch-partitioned directory). Returns the
    deleted batch ids (empty when nothing is old enough).

    Pure directory-listing work — no Spark job; idempotent (a second
    sweep finds nothing). Readers racing the delete see partition-level
    atomicity, same contract as compaction above."""
    if not os.path.isdir(path):
        return []
    batches = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("batch_id=")
        and os.path.isdir(os.path.join(path, d))
        and d.split("=", 1)[1].isdigit()
    )
    doomed = batches[:-keep_latest] if keep_latest > 0 else batches
    for b in doomed:
        shutil.rmtree(os.path.join(path, f"batch_id={b}"))
    return doomed
