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


def test_incremental_equals_full_restricted(spark, tmp_path):
    """The batch path must equal the full recompute restricted to pairs
    touching the batch — INCLUDING when the batch id is smaller than the
    state id (the position-swap orientation leg) and larger (the direct
    leg), plus a batch-vs-batch pair."""
    from vector_db_mvp_spark.operators.substring import (
        build_substring_state,
        incremental_substring_pairs,
    )

    span = _w(6, "s")
    rows = [
        (1, _w(3, "a") + " " + span),            # state; pairs with 2 and 9
        (2, span + " " + _w(4, "b")),            # batch (2 < state ids 1? no: 2>1)
        (9, _w(2, "c") + " " + span),            # batch, 9 > 1 (direct leg)
        (0, span + " " + _w(5, "d")),            # batch, 0 < 1 (swap leg)
        (5, _w(10, "z")),                        # state, no shared span
    ]
    docs = _docs(spark, rows)
    state_docs = docs.filter("doc_id IN (1, 5)")
    batch_docs = docs.filter("doc_id IN (0, 2, 9)")
    state = str(tmp_path / "substr-state")
    build_substring_state(state_docs, state, min_tokens=5)
    got = {
        (r["doc1"], r["doc2"]): (
            r["max_span_tokens"], r["n_spans"], r["n_shared_grams"]
        )
        for r in incremental_substring_pairs(
            spark, state, batch_docs, min_tokens=5
        ).collect()
    }
    full = {
        (r["doc1"], r["doc2"]): (
            r["max_span_tokens"], r["n_spans"], r["n_shared_grams"]
        )
        for r in exact_substring_pairs(docs, min_tokens=5).collect()
        if r["doc1"] in (0, 2, 9) or r["doc2"] in (0, 2, 9)
    }
    assert got == full
    # the shared 6-token span is recovered at full length on both swap and
    # direct orientations, and state-only pairs are absent
    assert got[(0, 1)][0] == 6 and got[(1, 9)][0] == 6 and (1, 5) not in got
