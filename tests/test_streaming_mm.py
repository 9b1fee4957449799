"""Streaming media near-dup screen (streaming/mm_index.py): the union
of per-batch pair outputs must equal the batch mm_dedup_phash operator
over the union corpus — including pairs that cross batch boundaries —
and replays must be byte-idempotent."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_DIR


def test_streaming_media_screen_equals_batch_pairs(spark, tmp_path):
    from cdc_sync_poc_spark.llm.multimodal import (
        media_frame,
        phash_band_frame,
        phash_pairs_frame,
    )
    from cdc_sync_poc_spark.streaming.mm_index import (
        StreamingMediaIndex,
        run_streaming_media_index,
    )

    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs = sorted(t.to_pylist(), key=lambda d: d["doc_id"])[:45]
    # batch 1 re-uploads five batch-0 payloads under new ids (identical
    # bytes -> hamming 0 cross-batch pairs); batch 1 also carries an
    # IN-BATCH duplicate pair; batch 2 is fresh content
    batches = (
        docs[:15],
        [{**d, "doc_id": 9200 + i} for i, d in enumerate(docs[:5])]
        + docs[15:30]
        + [{**docs[16], "doc_id": 9300}],
        docs[30:45],
    )
    in_dir = tmp_path / "mm_in"
    in_dir.mkdir()
    schema = pa.schema(
        [
            ("doc_id", pa.int64()), ("text", pa.string()),
            ("lang", pa.string()), ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    now = time.time()
    for i, rows in enumerate(batches):
        f = in_dir / f"part-{i}.parquet"
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), f)
        os.utime(f, (now + i * 10, now + i * 10))

    root = tmp_path / "mm_root"
    q = run_streaming_media_index(
        spark, str(in_dir), str(root), str(tmp_path / "ckpt_mm")
    )
    q.awaitTermination()
    idx = StreamingMediaIndex(spark, str(root))

    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in idx.pairs().drop("batch_id").collect()
    }
    union_rows = [d for rows in batches for d in rows]
    union = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in union_rows],
        "doc_id long, text string",
    )
    want = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in phash_pairs_frame(phash_band_frame(media_frame(union))).collect()
    }
    assert got == want
    # the constructed duplicates are really in there: cross-batch and
    # within-batch exact pairs at hamming 0
    assert (batches[0][0]["doc_id"], 9200, 0) in got
    assert (docs[16]["doc_id"], 9300, 0) in got

    # each pair is reported exactly ONCE across all batch partitions
    all_rows = [
        (r.doc_a, r.doc_b) for r in idx.pairs().drop("batch_id").collect()
    ]
    assert len(all_rows) == len(set(all_rows))

    # replaying the middle batch leaves pairs AND bands byte-identical
    before_pairs = sorted(
        (r.doc_a, r.doc_b, r.hamming, r.batch_id) for r in idx.pairs().collect()
    )
    before_bands = sorted(
        map(tuple, spark.read.parquet(str(root / "bands")).collect())
    )
    mid = spark.read.parquet(str(in_dir / "part-1.parquet"))
    idx.screen_batch(mid, batch_id=1)
    after_pairs = sorted(
        (r.doc_a, r.doc_b, r.hamming, r.batch_id) for r in idx.pairs().collect()
    )
    after_bands = sorted(
        map(tuple, spark.read.parquet(str(root / "bands")).collect())
    )
    assert after_pairs == before_pairs
    assert after_bands == before_bands

    # compaction folds fingerprint partitions into the base without
    # changing screening: replay of a FOLDED batch is pair-idempotent,
    # and a later batch still finds cross-batch pairs against the base
    idx.compact(1)  # fold batches 0..1; batch 2 stays a delta
    left = sorted(
        d
        for d in os.listdir(str(root / "bands"))
        if d.startswith("batch_id=")
    )
    assert left == ["batch_id=2"]
    idx.screen_batch(mid, batch_id=1)  # replay of a folded batch
    assert sorted(
        (r.doc_a, r.doc_b, r.hamming, r.batch_id) for r in idx.pairs().collect()
    ) == before_pairs

    b3 = spark.createDataFrame(
        [(9400, docs[0]["text"])], "doc_id long, text string"
    )
    idx.screen_batch(b3, batch_id=3)
    got3 = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in spark.read.parquet(str(root / "pairs" / "batch_id=3")).collect()
    }
    assert (batches[0][0]["doc_id"], 9400, 0) in got3  # found via the BASE
    assert (9200, 9400, 0) in got3  # and via the re-crawl's fingerprints
