"""Streaming incremental PageRank (streaming/pagerank.py): events
absorbed in event-time-ordered micro-batches must yield EXACTLY the
batch operator's fixed-point registers — including the cross-batch
boundary transitions the user-tail carry exists for — and a replayed
batch must not double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
import pytest

N_BATCHES = 3


def _batches(spark):
    """Split the fixture events into N event-time-ordered batches by
    ntile over (ts, event_id) — every batch boundary cuts through
    users' event sequences, which is what exercises the tail carry."""
    from pyspark.sql import Window

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "__b",
            F.ntile(N_BATCHES).over(
                Window.orderBy("ts", "event_id")
            ),
        )
    )
    return [
        ev.filter(F.col("__b") == i + 1).drop("__b").localCheckpoint()
        for i in range(N_BATCHES)
    ]


def _batch_ranks(spark):
    from cdc_sync_poc_spark.operators.graph import graph_pagerank_dist

    return {
        r.event_type: r.pr_fixed
        for r in graph_pagerank_dist(spark, SF_DIR).collect()
    }


def test_incremental_matches_batch(spark, tmp_path):
    from cdc_sync_poc_spark.streaming.pagerank import StreamingPageRank

    pr = StreamingPageRank(spark, str(tmp_path / "pr"))
    for i, b in enumerate(_batches(spark)):
        pr.absorb_batch(b, batch_id=i)
    got = {r.event_type: r.pr_fixed for r in pr.ranks().collect()}
    want = _batch_ranks(spark)
    assert got == want and len(got) > 0


def test_boundary_transitions_actually_cross_batches(spark):
    """The split must cut inside user sequences — otherwise the carry
    is untested. Assert at least one user's events span two batches."""
    batches = _batches(spark)
    u0 = {r.user_id for r in batches[0].select("user_id").distinct().collect()}
    u1 = {r.user_id for r in batches[1].select("user_id").distinct().collect()}
    assert u0 & u1


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Re-absorbing the FINAL batch (the at-least-once foreachBatch
    case) overwrites its own delta/tail partitions from the same
    pre-state: ranks unchanged."""
    from cdc_sync_poc_spark.streaming.pagerank import StreamingPageRank

    pr = StreamingPageRank(spark, str(tmp_path / "pr"))
    batches = _batches(spark)
    for i, b in enumerate(batches):
        pr.absorb_batch(b, batch_id=i)
    before = {r.event_type: r.pr_fixed for r in pr.ranks().collect()}
    pr.absorb_batch(batches[-1], batch_id=N_BATCHES - 1)  # replay
    after = {r.event_type: r.pr_fixed for r in pr.ranks().collect()}
    assert after == before == _batch_ranks(spark)


def test_empty_store_returns_empty_frame(spark, tmp_path):
    from cdc_sync_poc_spark.streaming.pagerank import StreamingPageRank

    pr = StreamingPageRank(spark, str(tmp_path / "pr_empty"))
    assert pr.ranks().count() == 0


def test_compact_before_any_absorb_is_a_clean_noop(spark, tmp_path):
    """ADVICE r8: compact() called directly on a store with no delta
    partitions (never absorbed, or already fully folded+cleaned) must
    no-op, not raise AnalysisException on the missing edges dir."""
    from cdc_sync_poc_spark.streaming.pagerank import StreamingPageRank

    pr = StreamingPageRank(spark, str(tmp_path / "pr_noop"))
    pr.compact(upto_batch_id=5)  # edges dir does not exist yet
    assert pr.ranks().count() == 0
    # and after full fold+cleanup, compacting further is equally safe
    batches = _batches(spark)
    pr.absorb_batch(batches[0], batch_id=0)
    pr.compact(upto_batch_id=0)
    before = {r.event_type: r.pr_fixed for r in pr.ranks().collect()}
    pr.compact(upto_batch_id=7)  # zero unfolded partitions remain
    after = {r.event_type: r.pr_fixed for r in pr.ranks().collect()}
    assert before == after and len(after) > 0


@pytest.mark.slow
def test_compaction_preserves_ranks_and_bounds_partitions(spark, tmp_path):
    """compact() folds delta partitions into the SwapStore base:
    ranks unchanged (bit-for-bit), folded partitions gone, and a
    second compact to the same watermark is a no-op."""
    import os

    from cdc_sync_poc_spark.streaming.pagerank import StreamingPageRank

    pr = StreamingPageRank(spark, str(tmp_path / "pr"))
    batches = _batches(spark)
    for i, b in enumerate(batches):
        pr.absorb_batch(b, batch_id=i)
    want = {r.event_type: r.pr_fixed for r in pr.ranks().collect()}

    pr.compact(upto_batch_id=1)  # fold batches 0..1, keep 2 as delta
    left = [
        d
        for d in os.listdir(str(tmp_path / "pr" / "edges"))
        if d.startswith("batch_id=")
    ]
    assert left == ["batch_id=2"]
    got = {r.event_type: r.pr_fixed for r in pr.ranks().collect()}
    assert got == want
    pr.compact(upto_batch_id=1)  # idempotent no-op
    assert {r.event_type: r.pr_fixed for r in pr.ranks().collect()} == want

    pr.compact(upto_batch_id=2)  # fold everything — deltas empty
    assert not any(
        d.startswith("batch_id=")
        for d in os.listdir(str(tmp_path / "pr" / "edges"))
    )
    assert {r.event_type: r.pr_fixed for r in pr.ranks().collect()} == want


@pytest.mark.slow
def test_compaction_crash_window_never_double_counts(spark, tmp_path):
    """Crash between the base swap and the delta cleanup leaves folded
    partitions on disk; the in-frame watermark must exclude them. The
    same watermark also shields an at-least-once REPLAY of an
    already-folded batch."""
    from unittest import mock

    from cdc_sync_poc_spark.streaming.pagerank import StreamingPageRank

    pr = StreamingPageRank(spark, str(tmp_path / "pr"))
    batches = _batches(spark)
    for i, b in enumerate(batches):
        pr.absorb_batch(b, batch_id=i)
    want = {r.event_type: r.pr_fixed for r in pr.ranks().collect()}

    # crash exactly between swap and cleanup: suppress the rmtree
    with mock.patch("shutil.rmtree"):
        pr.compact(upto_batch_id=1)
    import os

    left = {
        d
        for d in os.listdir(str(tmp_path / "pr" / "edges"))
        if d.startswith("batch_id=")
    }
    assert left == {"batch_id=0", "batch_id=1", "batch_id=2"}  # nothing cleaned
    assert {r.event_type: r.pr_fixed for r in pr.ranks().collect()} == want

    # an at-least-once replay of folded batch 1 recreates its partition;
    # the watermark still excludes it
    pr.absorb_batch(batches[1], batch_id=1)
    assert {r.event_type: r.pr_fixed for r in pr.ranks().collect()} == want


@pytest.mark.slow
def test_readstream_wrapper_matches_batch(spark, tmp_path):
    """Drive the REAL readStream wiring (file source, one file per
    trigger, availableNow): ranks after the stream drains must equal
    the batch operator. Files are event-time-ordered slices — the
    arrival-order contract under which stream == batch exactly."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from cdc_sync_poc_spark.streaming.pagerank import (
        StreamingPageRank,
        run_streaming_pagerank,
    )

    t = pq.read_table(f"{SF_DIR}/events.parquet")
    t = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        pc.cast(t.column("ts"), pa.timestamp("us")),
    ).sort_by([("ts", "ascending"), ("event_id", "ascending")])
    n = t.num_rows
    cuts = (0, n // 3, 2 * n // 3, n)
    in_dir = tmp_path / "pr_in"
    in_dir.mkdir()
    now = time.time()
    for i in range(3):
        f = in_dir / f"part-{i}.parquet"
        pq.write_table(t.slice(cuts[i], cuts[i + 1] - cuts[i]), f)
        os.utime(f, (now + i * 10, now + i * 10))

    root = tmp_path / "pr_root"
    q = run_streaming_pagerank(
        spark, str(in_dir), str(root), str(tmp_path / "ckpt_pr")
    )
    q.awaitTermination()
    got = {
        r.event_type: r.pr_fixed
        for r in StreamingPageRank(spark, str(root)).ranks().collect()
    }
    assert got == _batch_ranks(spark) and len(got) > 0

    # same stream with an in-flight compaction policy (fold after every
    # batch, lagging one): ranks identical, delta log bounded
    root2 = tmp_path / "pr_root2"
    q2 = run_streaming_pagerank(
        spark,
        str(in_dir),
        str(root2),
        str(tmp_path / "ckpt_pr2"),
        compact_every=1,
    )
    q2.awaitTermination()
    got2 = {
        r.event_type: r.pr_fixed
        for r in StreamingPageRank(spark, str(root2)).ranks().collect()
    }
    assert got2 == got
    left = [
        d
        for d in os.listdir(str(root2 / "edges"))
        if d.startswith("batch_id=")
    ]
    assert left == ["batch_id=2"]  # only the not-yet-folded newest batch
    tails_left = sorted(
        d
        for d in os.listdir(str(root2 / "tails"))
        if d.startswith("batch_id=")
    )
    assert tails_left == ["batch_id=1", "batch_id=2"]  # newest 2 kept


def test_prune_tails_keeps_replay_predecessor(spark, tmp_path):
    """After pruning to the newest 2 snapshots, a replay of the LAST
    batch (the only replayable one under the checkpoint contract) still
    finds its predecessor and reproduces identical ranks."""
    from cdc_sync_poc_spark.streaming.pagerank import StreamingPageRank

    pr = StreamingPageRank(spark, str(tmp_path / "pr"))
    batches = _batches(spark)
    for i, b in enumerate(batches):
        pr.absorb_batch(b, batch_id=i)
    want = {r.event_type: r.pr_fixed for r in pr.ranks().collect()}
    pr.prune_tails()
    pr.absorb_batch(batches[-1], batch_id=N_BATCHES - 1)  # replay
    got = {r.event_type: r.pr_fixed for r in pr.ranks().collect()}
    assert got == want == _batch_ranks(spark)


def _mk_batch(spark, rows):
    """rows: (user_id, ts_sec, event_id, event_type)"""
    import datetime as dtm

    base = dtm.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            (u, base + dtm.timedelta(seconds=s), e, t)
            for (u, s, e, t) in rows
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )


def test_ttl_evicts_idle_user_tails(spark, tmp_path):
    """VERDICT r8 #5: with ttl_batches set, a user with no events for
    that many batches leaves the tail snapshot — tails are bounded by
    the ACTIVE user set under a long stream, not the all-time one."""
    from cdc_sync_poc_spark.streaming.pagerank import StreamingPageRank

    pr = StreamingPageRank(spark, str(tmp_path / "pr"), ttl_batches=2)
    # u1 appears only in batch 0; u2 is active every batch
    pr.absorb_batch(_mk_batch(spark, [(1, 0, 1, "a"), (2, 1, 2, "b")]), 0)
    pr.absorb_batch(_mk_batch(spark, [(2, 10, 3, "c")]), 1)
    users_b1 = {r.user_id for r in pr._newest_tails().collect()}
    assert users_b1 == {1, 2}  # u1 idle 1 batch: still inside ttl
    pr.absorb_batch(_mk_batch(spark, [(2, 20, 4, "d")]), 2)
    users_b2 = {r.user_id for r in pr._newest_tails().collect()}
    assert users_b2 == {2}  # u1 idle 2 batches: evicted
    # a long stream keeps the snapshot at the active set
    for i in range(3, 10):
        pr.absorb_batch(_mk_batch(spark, [(2, 10 * i, i + 2, "e")]), i)
        assert {r.user_id for r in pr._newest_tails().collect()} == {2}


def test_ttl_returning_user_loses_exactly_one_boundary_edge(spark, tmp_path):
    """The documented deviation: an evicted-then-returning user drops
    ONLY the boundary transition across its idle gap — every other
    accumulated edge matches the no-ttl twin exactly, and replaying
    the return batch is still idempotent."""
    from pyspark.sql import functions as F

    from cdc_sync_poc_spark.streaming.pagerank import StreamingPageRank

    batches = [
        _mk_batch(spark, [(1, 0, 1, "a"), (1, 1, 2, "b"),
                          (2, 2, 3, "x")]),          # u1: a->b
        _mk_batch(spark, [(2, 10, 4, "y")]),          # u1 idle
        _mk_batch(spark, [(2, 20, 5, "x")]),          # u1 idle
        _mk_batch(spark, [(1, 30, 6, "c"), (1, 31, 7, "d"),
                          (2, 32, 8, "y")]),          # u1 returns: c->d
    ]
    prs = {}
    for name, ttl in (("nottl", None), ("ttl", 2)):
        pr = StreamingPageRank(spark, str(tmp_path / name), ttl_batches=ttl)
        for i, b in enumerate(batches):
            pr.absorb_batch(b, batch_id=i)
        prs[name] = pr

    def edge_counts(pr):
        return {
            (r.src, r.dst): r.n for r in pr._edge_counts().collect()
        }

    full, evicted = edge_counts(prs["nottl"]), edge_counts(prs["ttl"])
    # u1's boundary edge across the idle gap (b -> c) is the ONE delta
    assert full[("b", "c")] == 1
    diff = {k: full.get(k, 0) - evicted.get(k, 0)
            for k in set(full) | set(evicted)}
    assert {k: v for k, v in diff.items() if v != 0} == {("b", "c"): 1}
    # replaying the return batch changes nothing (byte-identical state)
    prs["ttl"].absorb_batch(batches[3], batch_id=3)
    assert edge_counts(prs["ttl"]) == evicted
    # the returning user is back in the tail snapshot afterwards
    assert {r.user_id for r in prs["ttl"]._newest_tails().collect()} == {1, 2}


def test_ttl_validation_and_legacy_snapshot_migration(spark, tmp_path):
    """Review findings: (a) ttl_batches < 1 fails loudly (0 would
    silently evict every tail each batch); (b) a tails store written
    by the pre-last_batch format still loads — carried rows count as
    last seen at their snapshot batch."""
    import pytest as _pytest

    from cdc_sync_poc_spark.streaming.pagerank import StreamingPageRank

    with _pytest.raises(ValueError, match="ttl_batches"):
        StreamingPageRank(spark, str(tmp_path / "bad"), ttl_batches=0)

    # write a legacy-format snapshot (no last_batch column) by hand
    root = tmp_path / "pr_legacy"
    pr = StreamingPageRank(spark, str(root), ttl_batches=2)
    legacy = _mk_batch(spark, [(1, 0, 1, "a"), (2, 1, 2, "b")])
    legacy.write.parquet(str(root / "tails" / "batch_id=0"))
    # absorbing the next batch reads the legacy snapshot: u1's tail
    # carries (treated as last seen at batch 0) and forms the boundary
    pr.absorb_batch(_mk_batch(spark, [(1, 10, 3, "c")]), 1)
    edges = {(r.src, r.dst): r.n for r in pr._edge_counts().collect()}
    assert edges == {("a", "c"): 1}
    users = {r.user_id for r in pr._newest_tails().collect()}
    assert users == {1, 2}
    # u2 (idle since the legacy snapshot) evicts once the ttl passes
    pr.absorb_batch(_mk_batch(spark, [(1, 20, 4, "d")]), 2)
    assert {r.user_id for r in pr._newest_tails().collect()} == {1}


def test_streaming_ranks_mass_variant_matches_batch(spark, tmp_path):
    """ranks(redistribute_dangling=True) over the absorbed stream must
    equal graph_pagerank_mass over the same events — the streaming
    state feeds the identical shared fixed point, flag included."""
    from cdc_sync_poc_spark.operators.graph import graph_pagerank_mass
    from cdc_sync_poc_spark.streaming.pagerank import StreamingPageRank

    pr = StreamingPageRank(spark, str(tmp_path / "prm"))
    for i, b in enumerate(_batches(spark)):
        pr.absorb_batch(b, batch_id=i)
    got = {
        r.event_type: r.pr_fixed
        for r in pr.ranks(redistribute_dangling=True).collect()
    }
    want = {
        r.event_type: r.pr_fixed
        for r in graph_pagerank_mass(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0
