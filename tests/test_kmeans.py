"""Lloyd's k-means with SQL-reproducible determinism (operators/kmeans.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.kmeans import (
    assign_clusters,
    kmeans_assignments,
)


@pytest.fixture(scope="module")
def blobs(spark):
    """Two well-separated 2-D blobs, ids ordered so the deterministic init
    (k smallest ids) seeds one centroid in each blob."""
    pts = [
        (0, [0.0, 0.0]), (2, [0.1, 0.0]), (4, [0.0, 0.1]), (6, [0.1, 0.1]),
        (1, [5.0, 5.0]), (3, [5.1, 5.0]), (5, [5.0, 5.1]), (7, [5.1, 5.1]),
    ]
    return spark.createDataFrame(pts, "vec_id long, embedding array<float>")


def test_separated_blobs_recovered(blobs):
    out = kmeans_assignments(blobs, 2, 3).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
    assert sorted(map(sorted, by_cluster.values())) == [
        [0, 2, 4, 6],
        [1, 3, 5, 7],
    ]


def test_assignment_tie_breaks_to_lowest_cluster(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    # Equidistant centroids -> first (lowest index) wins.
    out = assign_clusters(df, [[0.0, 0.0], [2.0, 0.0]]).collect()[0]
    assert out.cluster == 0 and out.dist == 1.0


def test_null_embeddings_invisible(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, None)], "vec_id long, embedding array<float>"
    )
    assert kmeans_assignments(df, 1, 1).count() == 1


def test_iterations_reduce_or_hold_inertia(blobs):
    """More Lloyd rounds never increase total within-cluster distance."""
    def inertia(iters: int) -> float:
        rows = kmeans_assignments(blobs, 2, iters).collect()
        return sum(r.dist for r in rows)

    assert inertia(3) <= inertia(1) + 1e-9


def test_empty_cluster_keeps_previous_centroid(spark):
    """k=3 over 2 tight points: one centroid ends up member-less and must
    survive the update (not crash / not collapse the centroid list)."""
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [0.1]), (2, [0.05])],
        "vec_id long, embedding array<float>",
    )
    out = kmeans_assignments(df, 3, 2)
    assert out.count() == 3
    assert out.agg(F.max("cluster")).collect()[0][0] <= 2
