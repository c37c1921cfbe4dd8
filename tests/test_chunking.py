"""Sliding-window document chunking (operators/chunking.py)."""

from __future__ import annotations

from vector_db_mvp_spark.operators.chunking import chunk_documents


def _rows(df):
    return {
        (r["doc_id"], r["chunk_idx"]): r
        for r in df.collect()
    }


def test_windows_overlap_and_cover(spark):
    text = " ".join(f"w{i}" for i in range(45))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = _rows(chunk_documents(df, window=20, stride=15))
    assert len(rows) == 3  # starts 0, 15, 30
    assert rows[(1, 0)]["chunk_text"].startswith("w0 ") and rows[(1, 0)]["n_tokens"] == 20
    assert rows[(1, 1)]["chunk_start"] == 15
    assert rows[(1, 1)]["chunk_text"].split(" ")[0] == "w15"
    # overlap: last 5 tokens of chunk 0 are the first 5 of chunk 1
    assert rows[(1, 0)]["chunk_text"].split(" ")[15:] == rows[(1, 1)]["chunk_text"].split(" ")[:5]
    # tail window is short but kept
    assert rows[(1, 2)]["n_tokens"] == 15


def test_short_doc_is_one_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = _rows(chunk_documents(df, window=20, stride=15))
    assert len(rows) == 1
    assert rows[(1, 0)]["chunk_text"] == "a b c"
    assert rows[(1, 0)]["n_tokens"] == 3


def test_every_token_appears_in_some_chunk(spark):
    text = " ".join(f"t{i}" for i in range(61))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    out = chunk_documents(df, window=10, stride=10)  # disjoint windows
    seen = []
    for r in sorted(out.collect(), key=lambda r: r["chunk_idx"]):
        seen.extend(r["chunk_text"].split(" "))
    assert seen == text.split(" ")
