"""Semantics pins for exact_substring_pairs (operators/substring.py):
hand-built documents with KNOWN shared spans, so the diagonal run-length
arithmetic (span = max(pa) - min(pa) + L) is verified against lengths a
human computed, not just against a SQL replay of the same construction."""

from __future__ import annotations

import pytest

from vector_db_mvp_spark.operators.substring import exact_substring_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _w(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_span_exact_length(spark):
    # Docs 1 and 2 share exactly a 7-token span, embedded at DIFFERENT
    # offsets (diagonal != 0); everything else is disjoint vocabulary.
    span = _w(7, "s")
    d1 = _w(3, "a") + " " + span + " " + _w(4, "b")
    d2 = _w(5, "c") + " " + span + " " + _w(2, "d")
    got = exact_substring_pairs(
        _docs(spark, [(1, d1), (2, d2), (3, _w(20, "z"))]), min_tokens=5
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc1"], r["doc2"]) == (1, 2)
    assert r["max_span_tokens"] == 7
    # one maximal run of 3 consecutive 5-grams on one diagonal
    assert r["n_spans"] == 1
    assert r["n_shared_grams"] == 3


def test_below_threshold_pair_excluded(spark):
    # A shared 4-token span never matches any 5-gram: no pair emitted.
    span = _w(4, "s")
    d1 = _w(6, "a") + " " + span
    d2 = span + " " + _w(6, "b")
    out = exact_substring_pairs(_docs(spark, [(1, d1), (2, d2)]), min_tokens=5)
    assert out.count() == 0


def test_two_disjoint_spans_counted_separately(spark):
    # Two separate shared spans (7 and 5 tokens) with disjoint filler:
    # max span 7, two islands, (7-5+1)+(5-5+1) = 4 shared 5-grams.
    s1, s2 = _w(7, "x"), _w(5, "y")
    d1 = s1 + " " + _w(4, "a") + " " + s2
    d2 = _w(3, "b") + " " + s1 + " " + _w(6, "c") + " " + s2 + " " + _w(2, "d")
    got = exact_substring_pairs(_docs(spark, [(1, d1), (2, d2)]), min_tokens=5).collect()
    assert len(got) == 1
    r = got[0]
    assert r["max_span_tokens"] == 7
    assert r["n_spans"] == 2
    assert r["n_shared_grams"] == 4


def test_identical_docs_full_length_span(spark):
    text = _w(12, "t")
    got = exact_substring_pairs(
        _docs(spark, [(10, text), (20, text)]), min_tokens=5
    ).collect()
    assert len(got) == 1
    assert got[0]["max_span_tokens"] == 12


def test_validates_min_tokens(spark):
    with pytest.raises(ValueError):
        exact_substring_pairs(_docs(spark, [(1, "a b c")]), min_tokens=1)
