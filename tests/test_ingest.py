"""JSONL/CSV ingestion sources with corrupt-record quarantine
(sources/ingest.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.sources.ingest import (
    read_documents_csv,
    read_documents_jsonl,
    split_quarantine,
)
from vector_db_mvp_spark.sources.testdata import load_table


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs.jsonl")
    docs.coalesce(2).write.json(path)
    back, bad = split_quarantine(read_documents_jsonl(spark, path))
    assert bad.count() == 0
    assert back.count() == docs.count()
    assert (
        back.exceptAll(docs.select(*back.columns)).count() == 0
    )


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
    )
    good, bad = split_quarantine(read_documents_jsonl(spark, str(p)))
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 1
    assert "not json" in bad.collect()[0][0]


def test_jsonl_strict_mode_fails_fast(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"doc_id": 1}\nnope\n')
    with pytest.raises(Exception):
        read_documents_jsonl(spark, str(p), strict=True).collect()


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello world,en,s1,11\n"
        "2,second doc,en,s2,10\n"
    )
    good, bad = split_quarantine(read_documents_csv(spark, str(p)))
    assert bad.count() == 0
    rows = {r["doc_id"]: r for r in good.collect()}
    assert rows[1]["text"] == "hello world"
    assert rows[2]["n_chars"] == 10
    # a row with a non-numeric id lands in quarantine (fresh path: caching
    # in split_quarantine keys on the file path, and ingest files are
    # immutable by contract — never rewrite under a read path)
    p2 = tmp_path / "in2.csv"
    p2.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello,en,s1,5\n"
        "oops,broken,en,s1,not_a_number\n"
    )
    good2, bad2 = split_quarantine(read_documents_csv(spark, str(p2)))
    assert [r["doc_id"] for r in good2.collect()] == [1]
    assert bad2.count() == 1


def test_schema_reaches_scan_no_inference_pass(spark, tmp_path):
    # with an explicit schema the reader plans exactly one scan of the data
    # (inference would trigger an extra job before the query even runs)
    p = tmp_path / "in.jsonl"
    p.write_text('{"doc_id": 1, "text": "t", "lang": "en", "source": "s", "n_chars": 1}\n')
    df = read_documents_jsonl(spark, str(p))
    assert [f.name for f in df.schema.fields[:5]] == [
        "doc_id", "text", "lang", "source", "n_chars"
    ]
    assert df.schema["doc_id"].dataType.simpleString() == "bigint"


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC source: parquet-parity roundtrip + filters reach the ORC scan."""
    from vector_db_mvp_spark.sources.ingest import (
        read_documents_orc,
        write_documents_orc,
    )

    rows = [(1, "alpha text", "en", "web", 10), (2, "beta text", "de", "book", 9)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "docs_orc")
    write_documents_orc(df, path)
    back = read_documents_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    plan = (
        back.filter("lang = 'en'")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "PushedFilters" in plan and "lang" in plan
