"""Streaming BM25 corpus statistics (streaming/bm25_stats.py): after
absorbing micro-batches, the stored-state ranking must be bit-identical
to the batch operator over the union; deltas are replay-safe by
partition ownership; absorption order must not matter."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_DIR


def _doc_batches(tmp_path, n=60, n_batches=3):
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs = sorted(t.to_pylist(), key=lambda d: d["doc_id"])[:n]
    cuts = [docs[i::n_batches] for i in range(n_batches)]
    in_dir = tmp_path / "bm_in"
    in_dir.mkdir()
    schema = pa.schema(
        [
            ("doc_id", pa.int64()), ("text", pa.string()),
            ("lang", pa.string()), ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    now = time.time()
    for i, rows in enumerate(cuts):
        f = in_dir / f"part-{i}.parquet"
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), f)
        os.utime(f, (now + i * 10, now + i * 10))
    return in_dir, docs, cuts


def test_streaming_bm25_equals_batch_and_replays(spark, tmp_path):
    from cdc_sync_poc_spark.llm.lm_quality import bm25_rank_frame
    from cdc_sync_poc_spark.streaming.bm25_stats import (
        StreamingBM25Stats,
        run_streaming_bm25,
    )

    in_dir, docs, cuts = _doc_batches(tmp_path)
    root = tmp_path / "bm_root"
    q = run_streaming_bm25(
        spark, str(in_dir), str(root), str(tmp_path / "ckpt_bm")
    )
    q.awaitTermination()
    st = StreamingBM25Stats(spark, str(root))

    union = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in docs], "doc_id long, text string"
    )
    want = [(r.doc_id, r.bm25) for r in bm25_rank_frame(union).collect()]
    got = [(r.doc_id, r.bm25) for r in st.score().collect()]
    assert got == want
    assert len(got) > 0

    # replaying the middle batch changes nothing (partition ownership)
    df0, n0, len0 = st.totals()
    mid = spark.read.parquet(str(in_dir / "part-1.parquet"))
    st.absorb_batch(mid, batch_id=1)
    assert st.totals() == (df0, n0, len0)
    assert [(r.doc_id, r.bm25) for r in st.score().collect()] == want

    # arrival order is irrelevant: absorbing the batches reversed gives
    # the identical ranking (additive stats, append-only postings)
    st2 = StreamingBM25Stats(spark, str(tmp_path / "bm_rev"))
    for i, rows in enumerate(reversed(cuts)):
        st2.absorb_batch(
            spark.createDataFrame(
                [(d["doc_id"], d["text"]) for d in rows],
                "doc_id long, text string",
            ),
            batch_id=i,
        )
    assert [(r.doc_id, r.bm25) for r in st2.score().collect()] == want

    # the stats fold really is the batch corpus statistic
    df, n_docs, sum_len = st.totals()
    assert n_docs == len(docs)
    assert sum_len == sum(len(d["text"].split(" ")) for d in docs)
    texts = {d["doc_id"]: d["text"].split(" ") for d in docs}
    for t, c in df.items():
        assert c == sum(1 for ws in texts.values() if t in ws), t


def test_streaming_bm25_empty_store_and_empty_batch(spark, tmp_path):
    """Advisor findings (r9): totals()/score() before any batch must
    return typed-empty state like the sibling stores, not raise; an
    empty micro-batch (file-source restart artifact) must absorb
    cleanly as an all-zero delta that still owns its partition, and
    compaction over both stores must leave the ranking unchanged."""
    from cdc_sync_poc_spark.llm.lm_quality import bm25_rank_frame
    from cdc_sync_poc_spark.streaming.bm25_stats import StreamingBM25Stats

    st = StreamingBM25Stats(spark, str(tmp_path / "bm_empty"))
    assert st.totals() == ({}, 0, 0)
    empty_rank = st.score()
    assert empty_rank.collect() == []
    assert [f.name for f in empty_rank.schema.fields] == ["doc_id", "bm25"]

    # empty micro-batch first (sum(size(split())) over zero rows is
    # NULL pre-fix): absorbs as a zero delta
    empty = spark.createDataFrame([], "doc_id long, text string")
    st.absorb_batch(empty, batch_id=0)
    assert st.totals() == ({t: 0 for t in st.terms}, 0, 0)
    assert st.score().collect() == []

    # then a real batch; the zero delta contributes nothing
    _, docs, _ = _doc_batches(tmp_path, n=30, n_batches=1)
    union = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in docs], "doc_id long, text string"
    )
    st.absorb_batch(union, batch_id=1)
    want = [(r.doc_id, r.bm25) for r in bm25_rank_frame(union).collect()]
    assert [(r.doc_id, r.bm25) for r in st.score().collect()] == want

    # compact both stores (shared fold) — ranking identical after
    st.stats.compact(1)
    st.postings.compact(1)
    assert [(r.doc_id, r.bm25) for r in st.score().collect()] == want
    # replay of a folded batch is invisible through the watermark
    st.absorb_batch(union, batch_id=1)
    assert [(r.doc_id, r.bm25) for r in st.score().collect()] == want
