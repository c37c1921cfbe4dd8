"""Sentence-segmentation UDTF (X4) vs the native split+posexplode twin."""

from __future__ import annotations

from vector_db_mvp_spark.operators.sentencize import (
    register_split_sentences,
    split_sentences_native,
)
from vector_db_mvp_spark.sources.testdata import load_table
from vector_db_mvp_spark.workload.text import ORACLE_SQL, QUERIES

from .oracle import assert_oracle_match


def test_udtf_matches_native(spark, sf_dir):
    """The Python UDTF (lateral join) must emit exactly the native plan's
    rows — same indices (empties dropped AFTER indexing), same text."""
    register_split_sentences(spark)
    docs = load_table(spark, sf_dir, "documents").limit(200)
    docs.createOrReplaceTempView("_sent_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, s.sentence_idx, s.sentence "
        "FROM _sent_docs d, LATERAL split_sentences(d.text) s"
    )
    native = split_sentences_native(docs)
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, native.collect()))
    assert a == b
    assert len(a) == 200  # fixture texts hold no terminators: 1 row per doc


def test_udtf_matches_native_multirow(spark):
    """Parity on texts that actually split (the fixture corpus has no
    sentence terminators), including empty-part edge shapes."""
    register_split_sentences(spark)
    df = spark.createDataFrame(
        [(1, "a. b! c?"), (2, "!x.  y"), (3, "."), (4, "tail")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_sent_multi")
    via_udtf = spark.sql(
        "SELECT d.doc_id, s.sentence_idx, s.sentence "
        "FROM _sent_multi d, LATERAL split_sentences(d.text) s"
    )
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, split_sentences_native(df).collect()))
    assert a == b and len(a) == 6


def test_edge_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "One. Two! Three?"),
            (2, "...leading and trailing..."),
            (3, ""),
            (4, None),
            (5, "no terminator at all"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["sentence_idx"]): r["sentence"]
        for r in split_sentences_native(df).collect()
    }
    assert rows[(1, 0)] == "One" and rows[(1, 1)] == "Two" and rows[(1, 2)] == "Three"
    # leading terminator -> part 0 is empty and dropped, index 1 survives
    assert rows[(2, 1)] == "leading and trailing"
    assert not any(k[0] == 3 for k in rows) and not any(k[0] == 4 for k in rows)
    assert rows[(5, 0)] == "no terminator at all"


def test_sentence_split_oracle(spark, sf_dir):
    assert_oracle_match(
        spark, sf_dir, QUERIES["sentence_split"], ORACLE_SQL["sentence_split"]
    )
