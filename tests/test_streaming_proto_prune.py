"""Streaming prototypicality maintainer (streaming/proto_prune.py):
the score-at-ingest twin of emb_proto_prune. Pins convergence against
the BATCH prune output with a batch split different from the
registered query's (% 4 vs % 3) so arrival-order independence is
exercised, plus replay idempotence and mid-stream compaction — the
properties the shared AppendDeltaStore contract promises, asserted on
this client."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
import pytest


def _load(spark):
    from cdc_sync_poc_spark.sources.loader import load_table

    return load_table(spark, SF_DIR, "embeddings")


def _batch_scored(spark):
    """The batch argmax score frame emb_proto_prune builds — the state
    the streamed store must reach byte-identically."""
    from cdc_sync_poc_spark.llm.similarity import (
        _assign_struct_col,
        _ivf_refined,
        normed_frame,
    )

    _n, _c0, cents1 = _ivf_refined(spark, SF_DIR)
    return (
        normed_frame(_load(spark))
        .select("vec_id", _assign_struct_col(cents1).alias("mx"))
        .select(
            "vec_id",
            (-F.col("mx").getField("nc")).alias("cell_id"),
            F.col("mx").getField("cosc").alias("proto"),
        )
    ), cents1


def test_streamed_scores_converge_replay_and_compaction_safe(
    spark, tmp_path
):
    """Four arrival batches (vec_id % 4 — NOT the registered query's
    % 3 split) must reach the exact batch score state; replaying a
    batch after compaction folded it changes nothing (partition
    ownership + watermark), and the prune verdicts equal the batch
    emb_proto_prune frame row-for-row."""
    from cdc_sync_poc_spark.llm.similarity import _proto_rank_frame
    from cdc_sync_poc_spark.streaming.proto_prune import StreamingProtoPrune

    want_scored, cents1 = _batch_scored(spark)
    want = {
        (r.vec_id, r.cell_id, r.proto) for r in want_scored.collect()
    }

    embs = _load(spark)
    pp = StreamingProtoPrune(spark, str(tmp_path / "pp"), cents_rows=cents1)
    for b in range(4):
        pp.absorb_batch(embs.filter(F.col("vec_id") % 4 == b), b)
    pp.compact(2)  # batches 0-2 fold; batch 3 stays a live delta
    got = {(r.vec_id, r.cell_id, r.proto) for r in pp.scored().collect()}
    assert got == want

    # at-least-once replay of a FOLDED batch: recreates its delta
    # partition; the read watermark excludes it, state unchanged
    pp.absorb_batch(embs.filter(F.col("vec_id") % 4 == 1), 1)
    got = {(r.vec_id, r.cell_id, r.proto) for r in pp.scored().collect()}
    assert got == want

    # replay of the LIVE delta batch: overwrites its own partition
    # byte-identically, state unchanged
    pp.absorb_batch(embs.filter(F.col("vec_id") % 4 == 3), 3)
    got = {(r.vec_id, r.cell_id, r.proto) for r in pp.scored().collect()}
    assert got == want

    # prune verdicts equal the batch rank over the batch score frame
    got_prune = {
        tuple(r) for r in pp.prune().collect()
    }
    want_prune = {
        tuple(r) for r in _proto_rank_frame(want_scored).collect()
    }
    assert got_prune == want_prune


def test_empty_store_prune_is_typed_empty(spark, tmp_path):
    """A maintainer that has absorbed nothing prunes to an EMPTY frame
    with the full output schema (the degenerate-stream guard: a
    restarted job must be able to run its read path before the first
    batch lands)."""
    from cdc_sync_poc_spark.llm.similarity import _ivf_refined
    from cdc_sync_poc_spark.streaming.proto_prune import StreamingProtoPrune

    _n, _c0, cents1 = _ivf_refined(spark, SF_DIR)
    pp = StreamingProtoPrune(spark, str(tmp_path / "pp0"), cents_rows=cents1)
    out = pp.prune()
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id",
        "cell_id",
        "proto_rank",
        "cell_n",
        "prototypicality",
        "keep",
    ]


def _emb_batches(n_batches: int):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").select(
        ["vec_id", "embedding", "label"]
    )
    rows = t.to_pylist()
    return [
        [r for r in rows if r["vec_id"] % n_batches == b]
        for b in range(n_batches)
    ]


def _bframe(spark, rows):
    return spark.createDataFrame(
        [(r["vec_id"], r["embedding"], r["label"]) for r in rows],
        "vec_id long, embedding array<float>, label int",
    )


def _scores_from_index(idx):
    """Oracle for every split-repair assertion: each stored index row's
    score must equal the cosine to its STORED cell's centroid under the
    index's CURRENT quantizer — the same fold expression the scorer
    runs, evaluated through a join instead of the argmax."""
    from cdc_sync_poc_spark.llm.similarity import _cents_frame

    cents = _cents_frame(idx.spark, idx.centroids()).select(
        "cell_id", "cv", "cn"
    )
    cos = F.expr(
        "aggregate(zip_with(v, cv, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
        " (acc, z) -> acc + z)"
    ) / (F.col("nrm") * F.col("cn"))
    return {
        (r.vec_id, r.cell_id, r.proto)
        for r in idx.index()
        .select("vec_id", "cell_id", "v", "nrm")
        .join(cents, "cell_id")
        .select("vec_id", "cell_id", cos.alias("proto"))
        .collect()
    }


@pytest.mark.slow
def test_rederive_cells_repairs_scores_after_index_split(spark, tmp_path):
    """The module-docstring repair protocol, executed: index and score
    maintainer consume the same arrival stream; the index splits its
    heaviest cell; rederive_cells replaces the family's scores and
    adopts the new quantizer; stored scores equal the
    cosine-to-stored-cell oracle before the split, after the repair,
    AND after further ingest under the post-split quantizer."""
    from cdc_sync_poc_spark.llm.similarity import _ivf_refined
    from cdc_sync_poc_spark.streaming.ann_index import StreamingIVFIndex
    from cdc_sync_poc_spark.streaming.proto_prune import StreamingProtoPrune

    batches = _emb_batches(3)
    _n, _c0, cents1 = _ivf_refined(spark, SF_DIR)
    idx = StreamingIVFIndex(spark, str(tmp_path / "ivf"), cents_rows=cents1)
    pp = StreamingProtoPrune(spark, str(tmp_path / "pp"), cents_rows=cents1)
    for b in range(2):
        f = _bframe(spark, batches[b])
        idx.absorb_batch(f, b)
        pp.absorb_batch(f, b)
    assert {
        tuple(r) for r in pp.scored().collect()
    } == _scores_from_index(idx)

    occ = (
        idx.index().groupBy("cell_id").agg(F.count("*").alias("n")).collect()
    )
    cell = int(max(occ, key=lambda r: (r.n, -r.cell_id)).cell_id)
    new_ids = idx.split_cell(cell, 2)
    subs = [c for c in idx.centroids() if int(c.cell_id) in set(new_ids)]
    members = idx.index().filter(F.col("cell_id").isin(new_ids)).select(
        "vec_id", "v", "nrm", "batch_id"
    )
    pp.rederive_cells(new_ids, members, subs, idx.centroids(), 1)
    got = {tuple(r) for r in pp.scored().collect()}
    assert got == _scores_from_index(idx)
    # re-running the repair is a no-op (pure replacement)
    pp.rederive_cells(new_ids, members, subs, idx.centroids(), 1)
    assert {tuple(r) for r in pp.scored().collect()} == got

    # further ingest: both sides now assign/score under the post-split
    # quantizer and stay in lockstep
    f = _bframe(spark, batches[2])
    idx.absorb_batch(f, 2)
    pp.absorb_batch(f, 2)
    assert {
        tuple(r) for r in pp.scored().collect()
    } == _scores_from_index(idx)


def test_rederive_cells_requires_quiesced_ingest(spark, tmp_path):
    import pytest

    from cdc_sync_poc_spark.llm.similarity import _ivf_refined
    from cdc_sync_poc_spark.streaming.proto_prune import StreamingProtoPrune

    batches = _emb_batches(2)
    _n, _c0, cents1 = _ivf_refined(spark, SF_DIR)
    pp = StreamingProtoPrune(spark, str(tmp_path / "ppq"), cents_rows=cents1)
    for b in range(2):
        pp.absorb_batch(_bframe(spark, batches[b]), b)
    with pytest.raises(RuntimeError, match="quiesced"):
        pp.rederive_cells([0], pp.scored().limit(0), cents1, cents1, 0)
