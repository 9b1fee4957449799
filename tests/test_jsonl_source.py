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
    from cdc_sync_poc_spark.sources.csvsrc import read_csv_docs

    p = tmp_path / "docs.csv"
    p.write_text(
        '"1","a b","en","s","3"\n'
        '"not,a,valid,row\n'
        '"2","c d","de","s","3"\n'
    )
    df = read_csv_docs(spark, str(p)).cache()
    good = df.filter(df._corrupt_record.isNull())
    bad = df.filter(df._corrupt_record.isNotNull())
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert bad.count() == 1
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
