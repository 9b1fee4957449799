"""Streaming SemDeDup maintainer (streaming/semdedup.py): the
foreachBatch twin of sem_dedup / sem_dedup_incremental. Convergence is
pinned against the BATCH sem_dedup output with batch splits
deliberately different from the batch query's wave mod (vec_id % 3 vs
% 2), so arrival-order independence is exercised, plus replay,
mid-stream compaction, retro-flip evidence, and the at-least-once
crash window."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _emb_batches(n_batches: int):
    """Fixture embeddings split by vec_id % n_batches, as pylists."""
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").select(
        ["vec_id", "embedding", "label"]
    )
    rows = t.to_pylist()
    return [
        [r for r in rows if r["vec_id"] % n_batches == b]
        for b in range(n_batches)
    ]


_EMB_PA_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]
)


def test_streaming_semdedup_converges_replays_and_compacts(spark, tmp_path):
    """Three arrival batches (vec_id % 3 — NOT the batch query's % 2
    waves) through the file stream must converge to the batch
    sem_dedup verdicts exactly; a replayed batch and a mid-stream
    compaction change nothing; later batches retro-screen earlier
    vectors (delta partitions carry earlier-batch vec_ids)."""
    from cdc_sync_poc_spark.llm.similarity import _ivf_refined, sem_dedup
    from cdc_sync_poc_spark.streaming.semdedup import (
        StreamingSemDedup,
        run_streaming_semdedup,
    )

    batches = _emb_batches(3)
    in_dir = tmp_path / "sd_in"
    in_dir.mkdir()
    now = time.time()
    for i, rows in enumerate(batches):
        f = in_dir / f"part-{i}.parquet"
        pq.write_table(pa.Table.from_pylist(rows, schema=_EMB_PA_SCHEMA), f)
        os.utime(f, (now + i * 10, now + i * 10))

    _n, _c0, cents1 = _ivf_refined(spark, SF_DIR)
    root = tmp_path / "sd_root"
    q = run_streaming_semdedup(
        spark, str(in_dir), str(root), str(tmp_path / "ckpt_sd"), cents1
    )
    q.awaitTermination()

    body = StreamingSemDedup(spark, str(root), cents_rows=cents1)
    got = {
        r.vec_id: (r.cell_id, r.max_cos, r.kept)
        for r in body.semdedup().collect()
    }
    want = {
        r.vec_id: (r.cell_id, r.max_cos, r.kept)
        for r in sem_dedup(spark, SF_DIR).collect()
    }
    assert got == want and got

    # retro evidence: a later batch's max-cos delta touches vec_ids
    # that arrived EARLIER (their verdicts were updated after the fact)
    later = spark.read.parquet(
        str(root / "maxcos" / "batch_id=2")
    ).select("vec_id")
    earlier_ids = {r["vec_id"] for b in batches[:2] for r in b}
    retro_ids = {r.vec_id for r in later.collect()} & earlier_ids
    assert retro_ids, "batch 2 delta carried no earlier-batch vec_ids"

    # replay the last batch: verdicts unchanged (max is idempotent AND
    # the replay recomputes from prior-only state)
    last = spark.createDataFrame(
        [(r["vec_id"], r["embedding"], r["label"]) for r in batches[2]],
        "vec_id long, embedding array<float>, label int",
    )
    body.absorb_batch(last, batch_id=2)
    again = {
        r.vec_id: (r.cell_id, r.max_cos, r.kept)
        for r in body.semdedup().collect()
    }
    assert again == want

    # compaction folds both stores without changing the answer
    body.compact(1)  # mid-stream: batch 2 stays a live delta
    folded = {
        r.vec_id: (r.cell_id, r.max_cos, r.kept)
        for r in body.semdedup().collect()
    }
    assert folded == want
    body.compact(2)
    assert {
        r.vec_id: (r.cell_id, r.max_cos, r.kept)
        for r in body.semdedup().collect()
    } == want


def test_streaming_semdedup_recovers_from_mid_batch_crash(spark, tmp_path):
    """At-least-once crash window: a batch that dies AFTER indexing its
    arrivals but BEFORE its max-cos delta must, on replay, recompute a
    byte-identical delta from identical prior state (index reads
    exclude the batch's own partition) and converge to the
    straight-line answer."""
    from cdc_sync_poc_spark.llm.similarity import _ivf_refined
    from cdc_sync_poc_spark.streaming.semdedup import StreamingSemDedup

    batches = _emb_batches(2)
    _n, _c0, cents1 = _ivf_refined(spark, SF_DIR)

    def frame(rows):
        return spark.createDataFrame(
            [(r["vec_id"], r["embedding"], r["label"]) for r in rows],
            "vec_id long, embedding array<float>, label int",
        )

    ref = StreamingSemDedup(spark, str(tmp_path / "ref"), cents_rows=cents1)
    for i, rows in enumerate(batches):
        ref.absorb_batch(frame(rows), batch_id=i)
    want = sorted(map(tuple, ref.semdedup().collect()))
    assert want

    body = StreamingSemDedup(
        spark, str(tmp_path / "crash"), cents_rows=cents1
    )
    body.absorb_batch(frame(batches[0]), batch_id=0)
    real_write = body.maxcos.write_delta
    calls = {"n": 0}

    def dying_write(df, batch_id):
        calls["n"] += 1
        raise RuntimeError("simulated crash before the max-cos delta")

    body.maxcos.write_delta = dying_write
    # the crash path must not strand the per-batch persist (the
    # persisted() contract): compare against the PRE-crash cache set —
    # other tests' session-shared caches are legitimately live when
    # the whole suite runs
    before = {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    try:
        body.absorb_batch(frame(batches[1]), batch_id=1)
    except RuntimeError:
        pass
    assert calls["n"] == 1  # crashed exactly in the window
    after = {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    assert after <= before, "crash path stranded a persisted frame"
    body.maxcos.write_delta = real_write
    # arrivals for batch 1 are already indexed; the replay overwrites
    # the partition and recomputes the delta from prior-only state
    body.absorb_batch(frame(batches[1]), batch_id=1)
    assert sorted(map(tuple, body.semdedup().collect())) == want
