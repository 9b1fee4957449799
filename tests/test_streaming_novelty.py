"""Streaming n-gram novelty (streaming/novelty.py): after absorbing
micro-batches, the stored-state novelty table must be bit-identical to
the batch text_ngram_novelty over the union — including CROSS-BATCH
ownership steals (a later batch carrying a smaller doc_id takes grams
from an earlier one) — and replays / arrival order / compaction must
change nothing."""

from __future__ import annotations

import os
import time
import unittest.mock as mock

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_DIR


def _doc_batches(tmp_path, n=45, n_batches=3):
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs = sorted(t.to_pylist(), key=lambda d: d["doc_id"])[:n]
    # the LAST batch carries smaller doc_ids, including one that
    # duplicates an already-absorbed document's text under doc_id=1 —
    # a GUARANTEED cross-batch ownership steal
    cuts = [docs[15:30], docs[30:45], docs[:15] + [{**docs[16], "doc_id": 1}]]
    docs = docs + [{**docs[16], "doc_id": 1}]
    in_dir = tmp_path / "nov_in"
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


def _batch_want(spark, docs):
    from cdc_sync_poc_spark.llm.preprocess import text_ngram_novelty

    union = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in docs], "doc_id long, text string"
    )
    with mock.patch(
        "cdc_sync_poc_spark.llm.preprocess.load_table", return_value=union
    ):
        return {
            tuple(r) for r in text_ngram_novelty(spark, "ignored").collect()
        }


def test_streaming_novelty_equals_batch_with_ownership_steals(
    spark, tmp_path
):
    from cdc_sync_poc_spark.streaming.novelty import (
        StreamingNovelty,
        run_streaming_novelty,
    )

    in_dir, docs, cuts = _doc_batches(tmp_path)
    want = _batch_want(spark, docs)

    root = tmp_path / "nov_root"
    q = run_streaming_novelty(
        spark, str(in_dir), str(root), str(tmp_path / "ckpt_nov")
    )
    q.awaitTermination()
    st = StreamingNovelty(spark, str(root))
    got = {tuple(r) for r in st.novelty().collect()}
    assert got == want and len(got) > 0

    # the steal really happened: after only the first two batches the
    # mid-range docs owned grams the final batch's smaller ids now own
    partial = StreamingNovelty(spark, str(tmp_path / "nov_partial"))
    for i, rows in enumerate(cuts[:2]):
        partial.absorb_batch(
            spark.createDataFrame(
                [(d["doc_id"], d["text"]) for d in rows],
                "doc_id long, text string",
            ),
            i,
        )
    before = {r.doc_id: r.n_novel for r in partial.novelty().collect()}
    after = {r[0]: r[2] for r in got}
    stolen = [d for d in before if after.get(d, 0) < before[d]]
    assert stolen, "fixture produced no cross-batch ownership steal"

    # replaying the middle batch is a no-op (partition ownership)
    mid = spark.read.parquet(str(in_dir / "part-1.parquet"))
    st.absorb_batch(mid, batch_id=1)
    assert {tuple(r) for r in st.novelty().collect()} == want

    # arrival order is irrelevant (min-fold commutativity)
    rev = StreamingNovelty(spark, str(tmp_path / "nov_rev"))
    for i, rows in enumerate(reversed(cuts)):
        rev.absorb_batch(
            spark.createDataFrame(
                [(d["doc_id"], d["text"]) for d in rows],
                "doc_id long, text string",
            ),
            i,
        )
    assert {tuple(r) for r in rev.novelty().collect()} == want

    # compaction folds both stores; replay of a folded batch invisible
    st.compact(1)
    assert {tuple(r) for r in st.novelty().collect()} == want
    st.absorb_batch(mid, batch_id=1)
    assert {tuple(r) for r in st.novelty().collect()} == want
    assert not any(
        d.startswith("batch_id=1")
        for d in os.listdir(st.owners.deltas_dir)
        if d.startswith("batch_id=") and int(d.split("=")[1]) < 1
    )


def test_streaming_novelty_empty_store(spark, tmp_path):
    from cdc_sync_poc_spark.streaming.novelty import StreamingNovelty

    st = StreamingNovelty(spark, str(tmp_path / "nov_empty"))
    out = st.novelty()
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_distinct", "n_novel", "novelty_frac",
    ]
