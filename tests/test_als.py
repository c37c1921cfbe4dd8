"""Implicit ALS recommendation (operators/als.py) — behavioral contract
(iterative least squares is not SQL-replayable; same verification model as
test_brp_lsh)."""

from __future__ import annotations

import pytest

from vector_db_mvp_spark.operators.als import (
    fit_als,
    purchase_interactions,
    recommend_items,
)


@pytest.fixture(scope="module")
def block_interactions(spark):
    """Two disjoint taste blocks: users 0-9 buy items 100-104 heavily,
    users 10-19 buy items 200-204. Perfect block structure ALS must
    recover."""
    rows = []
    for u in range(10):
        for i in range(100, 105):
            rows.append((u, i, 5.0))
    for u in range(10, 20):
        for i in range(200, 205):
            rows.append((u, i, 5.0))
    # One cross-block purchase as noise.
    rows.append((0, 200, 1.0))
    return spark.createDataFrame(rows, "user int, item int, rating float")


def test_block_structure_recovered(block_interactions):
    model = fit_als(block_interactions, rank=4, max_iter=8)
    recs = recommend_items(model, 3).collect()
    by_user = {}
    for r in recs:
        by_user.setdefault(r.user, []).append(r.item)
    # Every block-A user's top recommendations stay in block A, and vice
    # versa (scores for in-block items dominate).
    for u in range(1, 10):
        assert all(100 <= i < 105 for i in by_user[u]), (u, by_user[u])
    for u in range(10, 20):
        assert all(200 <= i < 205 for i in by_user[u]), (u, by_user[u])


def test_seeded_fit_is_deterministic(block_interactions):
    a = recommend_items(fit_als(block_interactions), 3).collect()
    b = recommend_items(fit_als(block_interactions), 3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_interactions_shape(spark, sf_dir):
    from vector_db_mvp_spark.sources.testdata import load_table

    inter = purchase_interactions(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    assert inter.columns == ["user", "item", "rating"]
    row = inter.first()
    assert row.rating >= 1.0


def test_end_to_end_on_fixture(spark, sf_dir):
    """Fit on the real fixture interactions and make k recommendations for
    every user — the serving path runs clean end to end."""
    from vector_db_mvp_spark.sources.testdata import load_table

    inter = purchase_interactions(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    model = fit_als(inter, rank=4, max_iter=3)
    recs = recommend_items(model, 5)
    counts = recs.groupBy("user").count().collect()
    assert counts and all(c["count"] == 5 for c in counts)
