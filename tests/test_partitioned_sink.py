"""Scale-path evidence for the lake layout: partitionBy writes create
hive-style directories whose filters become PartitionFilters (no data
read outside the hit partitions), and dynamic partition overwrite
replaces only the partitions present in the incoming batch — the
incremental-maintenance write pattern a 100 TB lake relies on
(reference contrast: the reference's sink is per-row JDBC MERGE,
CdcSyncService.java; a lake sink must get this layout right instead).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_sync_poc_spark.sources.loader import load_table
from tests.conftest import SF_DIR


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    docs = load_table(spark, SF_DIR, "documents")
    docs.write.partitionBy("lang").parquet(out)

    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = _executed_plan(back)
    # the lang predicate must be a partition filter on the scan, not a
    # post-scan data filter: pruned directory listing, zero IO on the
    # other languages
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
    want = docs.filter(F.col("lang") == "en").count()
    assert back.count() == want


def test_dynamic_partition_overwrite_touches_only_incoming(spark, tmp_path):
    out = str(tmp_path / "docs_dyn")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars", "lang")
    docs.write.partitionBy("lang").parquet(out)
    before_en = spark.read.parquet(out).filter("lang = 'en'").count()
    before_all = spark.read.parquet(out).count()

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # rewrite ONE partition with a filtered slice; overwrite mode
        # 'dynamic' must leave every other lang directory intact
        patch = docs.filter("lang = 'en' AND doc_id % 2 = 0")
        n_patch = patch.count()
        patch.write.mode("overwrite").partitionBy("lang").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    after = spark.read.parquet(out)
    assert after.filter("lang = 'en'").count() == n_patch
    # non-targeted partitions untouched
    assert after.filter("lang <> 'en'").count() == before_all - before_en


def test_compaction_reduces_files_preserving_data(spark, tmp_path):
    """Small-file compaction (sources/maintenance.py): a debris-heavy
    partition is rewritten to the target file count with identical
    data; partitions already compact are not touched."""
    import os

    from cdc_sync_poc_spark.sources.maintenance import compact_partitions

    out = str(tmp_path / "docs_debris")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "n_chars", "lang"
    )
    # simulate micro-batch debris: 20 tiny files per partition
    docs.repartition(20).write.partitionBy("lang").parquet(out)

    def files_in(part):
        d = os.path.join(out, part)
        return sorted(
            f for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )

    parts = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert all(len(files_in(p)) > 1 for p in parts)
    before = {
        (r.doc_id, r.n_chars, r.lang) for r in spark.read.parquet(out).collect()
    }

    report = compact_partitions(spark, out, target_bytes=128 * 1024 * 1024)
    touched = {r["partition"] for r in report}
    assert touched == set(parts)  # all were debris-heavy
    for r in report:
        assert r["files_after"] == 1 and r["files_before"] > 1
    after = {
        (r.doc_id, r.n_chars, r.lang) for r in spark.read.parquet(out).collect()
    }
    assert after == before  # byte-level shuffle, value-level identity

    # idempotence: a second pass finds nothing to do and touches nothing
    snapshot = {p: files_in(p) for p in parts}
    assert compact_partitions(spark, out, target_bytes=128 * 1024 * 1024) == []
    assert {p: files_in(p) for p in parts} == snapshot


def test_expire_old_batches_keeps_latest(spark, tmp_path):
    """Batch-partition retention: only the newest keep_latest partitions
    survive; the sweep is idempotent and data in survivors is intact."""
    import os

    from cdc_sync_poc_spark.sources.maintenance import expire_old_batches

    out = str(tmp_path / "audit_sink")
    for b in range(5):
        spark.range(b * 10, b * 10 + 10).write.mode("overwrite").parquet(
            os.path.join(out, f"batch_id={b}")
        )
    assert expire_old_batches(out, keep_latest=2) == [0, 1, 2]
    assert sorted(os.listdir(out)) == ["batch_id=3", "batch_id=4"]
    assert expire_old_batches(out, keep_latest=2) == []  # idempotent
    ids = {r.id for r in spark.read.parquet(out).collect()}
    assert ids == set(range(30, 50))


def _compaction_fixture(spark, tmp_path, name):
    """A debris-heavy lang-partitioned sink + its value snapshot."""
    import os

    out = str(tmp_path / name)
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "n_chars", "lang"
    )
    docs.repartition(8).write.partitionBy("lang").parquet(out)
    parts = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    values = {
        (r.doc_id, r.n_chars, r.lang) for r in spark.read.parquet(out).collect()
    }
    return out, parts, values


def test_compaction_crash_before_first_rename_recovers(spark, tmp_path):
    """Kill after the temp write, before any rename: the partition is
    intact; recovery must delete the orphan temp as debris and a rerun
    must compact normally. While the temp exists, Spark partition
    discovery must NOT see a phantom partition value (the temp name is
    dot-prefixed and '='-free)."""
    import os

    from cdc_sync_poc_spark.sources.maintenance import (
        _swap_paths,
        compact_partitions,
        recover_compaction,
    )

    out, parts, values = _compaction_fixture(spark, tmp_path, "crashA")
    part = parts[0]
    pdir, tmp, old = _swap_paths(out, part)
    # simulate: temp fully written (with _SUCCESS), crash before renames
    spark.read.parquet(pdir).coalesce(1).write.parquet(tmp)
    assert os.path.exists(os.path.join(tmp, "_SUCCESS"))

    # phantom check: discovery sees only the real lang values
    langs = {r.lang for r in spark.read.parquet(out).select("lang").distinct().collect()}
    assert langs == {p.split("=", 1)[1] for p in parts}

    healed = recover_compaction(out)
    assert healed == [{"partition": part, "action": "cleaned"}]
    assert not os.path.isdir(tmp) and os.path.isdir(pdir)

    # rerun compacts everything; data identical
    report = compact_partitions(spark, out, target_bytes=128 * 1024 * 1024)
    assert {r["partition"] for r in report} == set(parts)
    after = {
        (r.doc_id, r.n_chars, r.lang) for r in spark.read.parquet(out).collect()
    }
    assert after == values


def test_compaction_crash_between_renames_rolls_forward(spark, tmp_path):
    """Kill between rename(P->old) and rename(tmp->P): the partition
    directory is ABSENT. Recovery must finish the swap (temp is
    complete), restoring the partition with the compacted copy — no
    phantom '.compact-old' partition value ever visible to Spark."""
    import os

    from cdc_sync_poc_spark.sources.maintenance import (
        _swap_paths,
        recover_compaction,
    )

    out, parts, values = _compaction_fixture(spark, tmp_path, "crashB")
    part = parts[0]
    pdir, tmp, old = _swap_paths(out, part)
    spark.read.parquet(pdir).coalesce(1).write.parquet(tmp)
    os.rename(pdir, old)  # crash here: P gone, old + complete tmp on disk

    # the half-swapped lake must still list ONLY real partition values
    # (old is dot-prefixed => invisible); data of the missing partition
    # is temporarily absent, never duplicated or phantom-valued
    langs = {r.lang for r in spark.read.parquet(out).select("lang").distinct().collect()}
    assert langs == {p.split("=", 1)[1] for p in parts} - {part.split("=", 1)[1]}

    healed = recover_compaction(out)
    assert healed == [{"partition": part, "action": "rolled_forward"}]
    assert os.path.isdir(pdir) and not os.path.isdir(tmp) and not os.path.isdir(old)
    after = {
        (r.doc_id, r.n_chars, r.lang) for r in spark.read.parquet(out).collect()
    }
    assert after == values  # the compacted copy has the full data


def test_compaction_crash_with_partial_temp_rolls_back(spark, tmp_path):
    """Partition renamed away but the temp is INCOMPLETE (no _SUCCESS —
    e.g. scratch from a concurrent crashed writer): recovery must roll
    BACK to the preserved old copy, never promote a partial temp."""
    import os
    import shutil

    from cdc_sync_poc_spark.sources.maintenance import (
        _swap_paths,
        recover_compaction,
    )

    out, parts, values = _compaction_fixture(spark, tmp_path, "crashC")
    part = parts[0]
    pdir, tmp, old = _swap_paths(out, part)
    spark.read.parquet(pdir).coalesce(1).write.parquet(tmp)
    os.remove(os.path.join(tmp, "_SUCCESS"))  # make the temp partial
    os.rename(pdir, old)

    healed = recover_compaction(out)
    assert healed == [{"partition": part, "action": "rolled_back"}]
    assert os.path.isdir(pdir) and not os.path.isdir(tmp) and not os.path.isdir(old)
    after = {
        (r.doc_id, r.n_chars, r.lang) for r in spark.read.parquet(out).collect()
    }
    assert after == values  # the original (uncompacted) copy survives
    shutil.rmtree(out)


def test_compaction_unpartitioned_root_swap_recovers(spark, tmp_path):
    """The unpartitioned case swaps `path` itself via siblings in its
    parent; the same roll-forward applies."""
    import os

    from cdc_sync_poc_spark.sources.maintenance import (
        _swap_paths,
        compact_partitions,
        recover_compaction,
    )

    out = str(tmp_path / "flat_sink")
    spark.range(100).repartition(10).write.parquet(out)
    values = {r.id for r in spark.read.parquet(out).collect()}
    report = compact_partitions(spark, out, target_bytes=128 * 1024 * 1024)
    assert report and report[0]["partition"] == "."
    assert {r.id for r in spark.read.parquet(out).collect()} == values

    pdir, tmp, old = _swap_paths(out, "")
    spark.read.parquet(out).coalesce(1).write.parquet(tmp)
    os.rename(pdir, old)  # crash between renames
    healed = recover_compaction(out)
    assert healed == [{"partition": ".", "action": "rolled_forward"}]
    assert {r.id for r in spark.read.parquet(out).collect()} == values
    assert not os.path.isdir(tmp) and not os.path.isdir(old)


def test_compaction_complete_temp_without_old_rolls_forward(spark, tmp_path):
    """ADVICE r7: live partition gone, no .compact-old, but a COMPLETE
    temp (with _SUCCESS) present — e.g. scratch from a concurrent
    crashed writer whose swap deleted .old before restoring the live
    dir. The temp may be the ONLY surviving copy: recovery must roll it
    forward, never rmtree it as debris."""
    import os
    import shutil

    from cdc_sync_poc_spark.sources.maintenance import (
        _swap_paths,
        recover_compaction,
    )

    out, parts, values = _compaction_fixture(spark, tmp_path, "crashD")
    part = parts[0]
    pdir, tmp, old = _swap_paths(out, part)
    spark.read.parquet(pdir).coalesce(1).write.parquet(tmp)
    shutil.rmtree(pdir)  # live gone, no .old — temp is the only copy

    healed = recover_compaction(out)
    assert healed == [{"partition": part, "action": "rolled_forward"}]
    assert os.path.isdir(pdir) and not os.path.isdir(tmp)
    after = {
        (r.doc_id, r.n_chars, r.lang) for r in spark.read.parquet(out).collect()
    }
    assert after == values


def test_compaction_partial_temp_without_old_reports_orphaned(spark, tmp_path):
    """Live partition gone, no .compact-old, temp PARTIAL (no _SUCCESS):
    nothing on disk is provably redundant, so recovery must refuse to
    delete and report 'orphaned' instead of cleaning the partial away."""
    import os

    from cdc_sync_poc_spark.sources.maintenance import (
        _swap_paths,
        recover_compaction,
    )

    out, parts, _ = _compaction_fixture(spark, tmp_path, "crashE")
    part = parts[0]
    pdir, tmp, old = _swap_paths(out, part)
    spark.read.parquet(pdir).coalesce(1).write.parquet(tmp)
    os.remove(os.path.join(tmp, "_SUCCESS"))
    import shutil

    shutil.rmtree(pdir)

    healed = recover_compaction(out)
    assert healed == [{"partition": part, "action": "orphaned"}]
    assert os.path.isdir(tmp)  # preserved for operator review
