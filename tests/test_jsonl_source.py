"""JSONL source (sources/jsonl.py): corrupt-line quarantine and
round-trip parity beyond what the registered oracle query covers."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    from cdc_sync_poc_spark.sources.jsonl import read_jsonl_docs

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "a b", "lang": "en", "source": "s", "n_chars": 3}\n'
        "{this is not json\n"
        '{"doc_id": 2, "text": "c d", "lang": "de", "source": "s", "n_chars": 3}\n'
        '{"doc_id": 3, "text": "e"\n'
    )
    df = read_jsonl_docs(spark, str(p)).cache()
    good = df.filter(df._corrupt_record.isNull())
    bad = df.filter(df._corrupt_record.isNotNull())
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert bad.count() == 2  # malformed + truncated line both quarantined
    # quarantined rows keep the raw line for the dead-letter sink
    assert all(r._corrupt_record.startswith("{") for r in bad.collect())
    df.unpersist()


def test_jsonl_text_roundtrips_exactly(spark):
    from cdc_sync_poc_spark.sources.jsonl import ensure_jsonl, read_jsonl_docs

    path = ensure_jsonl(SF_DIR)
    via_json = {
        r.doc_id: r.text for r in read_jsonl_docs(spark, path).collect()
    }
    via_parquet = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert via_json == via_parquet


def test_csv_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    """Malformed records (bad type, wrong arity) land in
    _corrupt_record without poisoning their neighbors. NOTE: an
    UNTERMINATED QUOTE is deliberately absent here — under
    multiLine=true (required for legally-quoted embedded newlines) an
    unbalanced quote consumes the rest of the file by CSV's own
    grammar; that failure mode is unrecoverable in ANY dialect-honest
    reader and is caught instead by the round-trip md5 oracle."""
    from cdc_sync_poc_spark.sources.csvsrc import read_csv_docs

    p = tmp_path / "docs.csv"
    p.write_text(
        '"1","a b","en","s","3"\n'
        '"not-a-number","x","en","s","3"\n'
        '"2","c d","de","s","3"\n'
        '"too","few"\n'
    )
    df = read_csv_docs(spark, str(p)).cache()
    good = df.filter(df._corrupt_record.isNull())
    bad = df.filter(df._corrupt_record.isNotNull())
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert bad.count() == 2  # bad-type + short row both quarantined
    df.unpersist()


def test_csv_embedded_newline_roundtrips(spark, tmp_path):
    """A text with an embedded newline is legally quoted by the
    QUOTE_ALL writer; the reader's multiLine=true must reassemble it
    into ONE document instead of quarantining two malformed halves
    (ADVICE r4: the latent write/read dialect mismatch)."""
    import csv

    from cdc_sync_poc_spark.sources.csvsrc import read_csv_docs

    rows = [
        (1, "first line\nsecond line", "en", "s", 22),
        (2, 'quote " and, comma', "en", "s", 18),
        (3, "plain", "de", "s", 5),
    ]
    p = tmp_path / "docs.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_ALL, escapechar="\\", doublequote=False)
        for r in rows:
            w.writerow(r)
    df = read_csv_docs(spark, str(p)).cache()
    assert df.filter(df._corrupt_record.isNotNull()).count() == 0
    got = {r.doc_id: r.text for r in df.collect()}
    assert got == {i: t for i, t, *_ in rows}
    df.unpersist()


def test_csv_text_roundtrips_exactly(spark):
    from cdc_sync_poc_spark.sources.csvsrc import ensure_csv, read_csv_docs

    path = ensure_csv(SF_DIR)
    via_csv = {r.doc_id: r.text for r in read_csv_docs(spark, path).collect()}
    via_parquet = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert via_csv == via_parquet


def test_orc_text_and_types_roundtrip_exactly(spark, tmp_path):
    """ORC round trip must preserve values AND Spark-side types (the
    drift ORC ingest actually risks), including text with embedded
    newlines/quotes/unicode written through the same pyarrow path."""
    import pandas as pd

    from cdc_sync_poc_spark.sources.orcsrc import ensure_orc, read_orc_docs

    path = ensure_orc(SF_DIR)
    got = read_orc_docs(spark, path)
    assert [(f.name, f.dataType.simpleString()) for f in got.schema.fields] == [
        ("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "bigint"),
    ]
    via_orc = {r.doc_id: r.text for r in got.collect()}
    via_parquet = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert via_orc == via_parquet

    # hostile text through the same derive path
    hostile = 'a,"b"\nc\\d\tе́🙂'
    pd.DataFrame(
        {
            "doc_id": [1],
            "text": [hostile],
            "lang": ["xx"],
            "source": ["t"],
            "n_chars": [len(hostile)],
        }
    ).to_parquet(f"{tmp_path}/documents.parquet")
    p2 = ensure_orc(str(tmp_path))
    assert read_orc_docs(spark, p2).collect()[0].text == hostile
