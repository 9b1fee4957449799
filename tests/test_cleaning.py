"""Behavioral tests for the rule-based cleaning pass and data layout:
Gopher rule flags on constructed documents, corpus-wide line-dedup
keep-first semantics, and the Z-order bucket locality guarantee.
(Exact oracle parity for all three is covered by test_oracle_parity.)
"""

from __future__ import annotations

from cdc_sync_poc_spark.llm.cleaning import (
    LINE_WORDS,
    gopher_rules_frame,
    line_dedup_frame,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_flags(spark):
    short = "tiny doc"  # fails word count + stopwords
    good = " ".join(["the", "a", "of"] + ["word"] * 30)  # passes all
    numeric = " ".join(["the", "a"] + ["123"] * 30)  # fails alpha frac
    out = {
        r.doc_id: r
        for r in gopher_rules_frame(
            _docs(spark, [(1, short), (2, good), (3, numeric)])
        ).collect()
    }
    assert not out[1].rule_word_count and not out[1].rule_stopwords
    assert not out[1].gopher_pass
    assert out[2].rule_word_count and out[2].rule_mean_len
    assert out[2].rule_alpha and out[2].rule_stopwords and out[2].gopher_pass
    assert not out[3].rule_alpha and not out[3].gopher_pass
    assert out[3].rule_stopwords  # two stopwords present


def test_line_dedup_keeps_first_occurrence_only(spark):
    seg_a = " ".join(f"a{i}" for i in range(LINE_WORDS))
    seg_b = " ".join(f"b{i}" for i in range(LINE_WORDS))
    seg_c = " ".join(f"c{i}" for i in range(LINE_WORDS))
    rows = [
        (1, f"{seg_a} {seg_b}"),  # first occurrences of a and b
        (2, f"{seg_a} {seg_c}"),  # a is a repeat -> dropped; c kept
        (3, seg_b),  # entire doc is a repeat -> empty text
    ]
    out = {r.doc_id: r for r in line_dedup_frame(_docs(spark, rows)).collect()}
    assert (out[1].n_seg, out[1].n_kept) == (2, 2)
    assert out[1].text_kept == f"{seg_a} {seg_b}"
    assert (out[2].n_seg, out[2].n_kept) == (2, 1)
    assert out[2].text_kept == seg_c
    assert (out[3].n_seg, out[3].n_kept) == (1, 0)
    assert out[3].text_kept == ""


def test_line_dedup_keeps_partial_tail(spark):
    seg_a = " ".join(f"a{i}" for i in range(LINE_WORDS))
    rows = [(1, f"{seg_a} tail words")]  # 1 full segment + 2-word tail
    (r,) = line_dedup_frame(_docs(spark, rows)).collect()
    assert (r.n_seg, r.n_kept) == (2, 2)
    assert r.text_kept == f"{seg_a} tail words"  # no truncation


def test_zorder_bucket_bounding_boxes_are_narrow(spark):
    from tests.conftest import SF_DIR

    from cdc_sync_poc_spark.sources.layout import (
        ZORDER_BITS,
        ZORDER_SIDE_BITS,
        maint_zorder_layout,
    )

    # bucket fixes the top ceil/floor(ZORDER_BITS/2) bits of each key ->
    # each bucket's per-axis range is at most 2^(SIDE_BITS - bits_fixed)
    a_fixed = ZORDER_BITS // 2  # a holds the even (lower) interleave bits
    b_fixed = ZORDER_BITS - a_fixed
    a_span = 1 << (ZORDER_SIDE_BITS - a_fixed)
    b_span = 1 << (ZORDER_SIDE_BITS - b_fixed)
    for r in maint_zorder_layout(spark, SF_DIR).collect():
        assert r.a_max - r.a_min < a_span
        assert r.b_max - r.b_min < b_span
        assert r.n_rows > 0


def test_bpe_greedy_merge_and_step_chaining(spark):
    """BPE fold semantics: (1) greedy left-to-right within a run —
    'aaa' under merge (a,a) becomes [aa, a], so step 2's counts see the
    merged symbol; (2) later steps build on earlier merges."""
    from cdc_sync_poc_spark.llm.tokenizer import bpe_merges_frame

    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab"), (2, "ab ab")], "doc_id long, text string"
    )
    rows = {r.step: r for r in bpe_merges_frame(docs).collect()}
    # step 1: pairs in 'aaab'x3 -> (a,a):6, (a,b):3+2=5 ... 'a a' wins
    assert rows[1].pair == "a a" and rows[1].cnt == 6
    # step 2: 'aaab' is now [aa, a, b] (greedy: first two a's merged,
    # third left) -> pairs (aa,a):3, (a,b):3+2=5 -> 'a b' wins
    assert rows[2].pair == "a b" and rows[2].cnt == 5
    # step 3: 'aaab' -> [aa, ab], 'ab' -> [ab]; (aa,ab):3 wins
    assert rows[3].pair == "aa ab" and rows[3].cnt == 3


def test_bpe_survives_pair_exhaustion(spark):
    """A corpus whose words fully merge before BPE_STEPS completes must
    keep its vocab state (merge steps with no pairs are no-ops) and
    report only the merges actually found — not annihilate everything
    through a cross join with an empty winner frame."""
    from cdc_sync_poc_spark.llm.tokenizer import _bpe_chain, bpe_merges_frame

    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    merges = bpe_merges_frame(docs).collect()
    assert [(r.step, r.merged, r.cnt) for r in merges] == [(1, "ab", 3)]
    cur, _m = _bpe_chain(docs)
    assert cur.collect()[0].spaced == "ab"  # state survives steps 2..N
