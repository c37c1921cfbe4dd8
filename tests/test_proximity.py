"""Semantics pins for proximity_search (NEAR/k) — especially the bin-edge
cases the floor-vs-cast truncation bug class would break (positions below
the window width, pairs straddling a bin boundary)."""

from __future__ import annotations

import pytest

from vector_db_mvp_spark.operators.phrase import proximity_search


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # d1: a@0, b@3 -> within 5 (distance 3); also b@9 -> distance 9, out.
        (1, "a x x b x x x x x b"),
        # d2: pair exactly AT the window bound (distance 5) must qualify.
        (2, "a x x x x b"),
        # d3: distance 6 -> no match.
        (3, "a x x x x x b"),
        # d4: straddles a bin boundary: a@4 (bin 0), b@6 (bin 1), d=2.
        (4, "x x x x a x b"),
        # d5: only term a.
        (5, "a x a"),
        # d6: multiple qualifying pairs: a@0,a@2 x b@1 -> d=1 and d=1.
        (6, "a b a"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_proximity_semantics(docs):
    got = {
        r["doc_id"]: (r["n_pairs"], r["min_distance"])
        for r in proximity_search(docs, "a", "b", 5).collect()
    }
    assert got == {
        1: (1, 3),
        2: (1, 5),
        4: (1, 2),
        6: (2, 1),
    }


def test_proximity_validates_args(docs):
    with pytest.raises(ValueError):
        proximity_search(docs, "a", "a", 5)
    with pytest.raises(ValueError):
        proximity_search(docs, "a", "b", 0)
