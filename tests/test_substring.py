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


def test_cap_nonbinding_equals_uncapped(spark):
    """max_postings far above every occurrence count changes nothing."""
    span = _w(7, "s")
    docs = _docs(
        spark,
        [
            (1, _w(3, "a") + " " + span),
            (2, span + " " + _w(4, "b")),
            (3, _w(15, "z")),
        ],
    )
    capped = sorted(
        map(tuple, exact_substring_pairs(docs, min_tokens=5, max_postings=100).collect())
    )
    uncapped = sorted(
        map(tuple, exact_substring_pairs(docs, min_tokens=5).collect())
    )
    assert capped == uncapped and len(capped) == 1


def test_cap_bounds_boilerplate_pairs(spark):
    """A boilerplate span shared by 20 docs explodes to C(20,2)=190 pairs
    uncapped; with max_postings=8 every boilerplate gram (20 occurrences)
    is dropped, leaving only the rare-span pair — the cap provably bounds
    pair count while keeping the real dedup signal."""
    boiler = _w(8, "lic")  # the "license header"
    rare = _w(8, "r")
    rows = [(i, boiler + " " + _w(4, f"u{i}x")) for i in range(100, 120)]
    rows += [(900, _w(3, "p") + " " + rare), (901, rare + " " + _w(2, "q"))]
    docs = _docs(spark, rows)
    uncapped = exact_substring_pairs(docs, min_tokens=5)
    assert uncapped.count() == 190 + 1
    capped = exact_substring_pairs(docs, min_tokens=5, max_postings=8).collect()
    assert len(capped) == 1
    r = capped[0]
    assert (r["doc1"], r["doc2"], r["max_span_tokens"]) == (900, 901, 8)


def test_capped_incremental_equals_capped_full_restricted(spark, tmp_path):
    """Capped incremental == capped full recompute restricted to pairs
    touching the batch, on a corpus where the cap BINDS (a boilerplate
    gram spanning state and batch exceeds the cap only when both sides
    are counted — the total-occurrence contract)."""
    from vector_db_mvp_spark.operators.substring import (
        build_substring_state,
        incremental_substring_pairs,
    )

    boiler = _w(6, "lic")
    rare = _w(6, "r")
    rows = [(i, boiler + " " + _w(3, f"u{i}x")) for i in range(1, 5)]  # state
    rows += [(10, boiler + " " + rare), (11, rare + " " + _w(4, "q"))]  # batch
    docs = _docs(spark, rows)
    state_docs = docs.filter("doc_id < 10")
    batch_docs = docs.filter("doc_id >= 10")
    state = str(tmp_path / "substr-cap-state")
    build_substring_state(state_docs, state, min_tokens=5)
    cap = 4  # boiler grams occur 5x total (4 state + 1 batch) -> dropped
    got = {
        tuple(r)
        for r in incremental_substring_pairs(
            spark, state, batch_docs, min_tokens=5, max_postings=cap
        ).collect()
    }
    full = {
        tuple(r)
        for r in exact_substring_pairs(
            docs, min_tokens=5, max_postings=cap
        ).collect()
        if r["doc1"] >= 10 or r["doc2"] >= 10
    }
    assert got == full
    # the boilerplate pair (state x batch) is capped away; rare pair stays
    assert {(d1, d2) for (d1, d2, *_rest) in got} == {(10, 11)}


def test_bucketed_state_table_same_pairs_no_state_side_exchange(
    spark, tmp_path
):
    """The published bucketed postings table must (a) produce identical
    pairs to the path-based state, (b) sort-merge the batch-vs-state
    anchor join with NO exchange on the state branch — the bucket layout
    on _h provides the partitioning (the incremental.py table pattern)."""
    from vector_db_mvp_spark.operators.substring import (
        _pairs_vs_state,
        _postings,
        build_substring_state,
        incremental_substring_pairs,
        incremental_substring_pairs_table,
        publish_substring_state_table,
    )

    span = _w(7, "s")
    rows = [
        (1, _w(3, "a") + " " + span),
        (2, _w(9, "x")),
        (5, span + " " + _w(4, "y")),          # state sibling with the span
        (10, _w(2, "b") + " " + span),          # batch: pairs with 1 and 5
        (11, _w(8, "q")),
    ]
    docs = _docs(spark, rows)
    state_docs = docs.filter("doc_id < 10")
    batch_docs = docs.filter("doc_id >= 10")
    prefix = "substrstate_test"
    try:
        publish_substring_state_table(
            state_docs, prefix, str(tmp_path / "wh"), min_tokens=5
        )
        got = sorted(
            map(
                tuple,
                incremental_substring_pairs_table(
                    spark, prefix, batch_docs, min_tokens=5
                ).collect(),
            )
        )
        state = str(tmp_path / "plainstate")
        build_substring_state(state_docs, state, min_tokens=5)
        want = sorted(
            map(
                tuple,
                incremental_substring_pairs(
                    spark, state, batch_docs, min_tokens=5
                ).collect(),
            )
        )
        assert got == want and len(got) == 2

        # Plan pin on the exact join _pairs_vs_state executes: state
        # branch = Sort -> Filter -> bucketed FileScan, no Exchange.
        cand = _pairs_vs_state(
            spark.table(f"{prefix}_postings"),
            _postings(batch_docs, 5, "text", "doc_id"),
            5,
            None,
            merge_hint=True,
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        k = plan.index(f"{prefix}_postings")
        state_branch = plan[plan[:k].rindex("Sort [") : k]
        assert "Exchange" not in state_branch, state_branch
        assert "Bucketed: true" in plan[k : k + 300]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_postings")
