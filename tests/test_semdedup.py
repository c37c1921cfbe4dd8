"""SemDeDup (operators/semdedup.py): cluster-then-compare semantic dedup.

Covers: nearest-centroid assignment, domination rule (most-central row of a
near-dup neighborhood is kept, ties to lowest id), zero-vector convention,
and the plan shape (hash join on cluster_id, no cartesian product).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.semdedup import semantic_dedup, unit_rows

DIM = 8
C0 = [1.0] + [0.0] * (DIM - 1)
C1 = [0.0, 1.0] + [0.0] * (DIM - 2)


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _run(spark, rows, tau=0.8):
    out = semantic_dedup(_df(spark, rows), [C0, C1], tau=tau).orderBy("vec_id")
    return {r["vec_id"]: r.asDict() for r in out.collect()}


def test_duplicate_neighborhood_keeps_most_central(spark):
    # v1 sits exactly on centroid 0; v2 is a slightly rotated copy
    # (cos(v1,v2) > tau, both assigned to cluster 0) -> v2 dropped.
    v2 = [0.95, 0.05] + [0.0] * (DIM - 2)
    got = _run(spark, [(1, C0), (2, v2), (3, C1)])
    assert got[1]["cluster_id"] == 0 and got[1]["is_kept"]
    assert got[2]["cluster_id"] == 0 and not got[2]["is_kept"]
    assert got[3]["cluster_id"] == 1 and got[3]["is_kept"]
    assert got[1]["centrality"] == pytest.approx(1.0)


def test_tie_broken_by_lowest_id(spark):
    # identical vectors: equal centrality, lower id wins
    got = _run(spark, [(7, C0), (4, C0)])
    assert got[4]["is_kept"] and not got[7]["is_kept"]


def test_distant_rows_in_same_cluster_both_kept(spark):
    # same nearest centroid, but cosine between them below tau -> no drop
    a = [0.9, 0.4] + [0.0] * (DIM - 2)
    b = [0.9, -0.4] + [0.0] * (DIM - 2)
    got = _run(spark, [(1, a), (2, b)], tau=0.95)
    assert got[1]["is_kept"] and got[2]["is_kept"]


def test_cross_cluster_duplicates_not_compared(spark):
    # two near-identical vectors straddling the centroid boundary land in
    # different clusters -> SemDeDup (by design) keeps both; the recall
    # loss vs the exact O(N^2) join is the documented trade.
    a = [0.71, 0.70] + [0.0] * (DIM - 2)
    b = [0.70, 0.71] + [0.0] * (DIM - 2)
    got = _run(spark, [(1, a), (2, b)])
    assert got[1]["cluster_id"] != got[2]["cluster_id"]
    assert got[1]["is_kept"] and got[2]["is_kept"]


def test_null_embeddings_excluded_zero_vector_kept(spark):
    rows = [(1, C0), (2, None), (3, [0.0] * DIM)]
    got = _run(spark, rows)
    assert set(got) == {1, 3}
    # zero vector: centrality 0 by convention, cos to everything 0 -> kept
    assert got[3]["centrality"] == 0.0 and got[3]["is_kept"]


def test_unit_rows_normalizes_and_keeps_zero():
    u = unit_rows([[3.0, 4.0], [0.0, 0.0]])
    assert u[0] == pytest.approx([0.6, 0.8])
    assert u[1] == [0.0, 0.0]


def test_plan_no_cartesian_product(spark):
    rows = [(i, [float(i % 3), float(i % 5)] + [0.0] * (DIM - 2)) for i in range(20)]
    df = semantic_dedup(_df(spark, rows), [C0, C1], tau=0.8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_matmul_assign_matches_native(spark, sf_dir):
    """The C~sqrt(N) scale path (Arrow matmul assignment) must make the
    same keep/drop decisions as the codegen-fold oracle path on the real
    fixture embeddings (BLAS-vs-fold dot ties are measure-zero there)."""
    from vector_db_mvp_spark.sources.testdata import load_table
    from vector_db_mvp_spark.workload.text import _semdedup_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _semdedup_centroids(k=32, seed=13)
    nat = semantic_dedup(emb, cents, tau=0.4, assign="native").orderBy("vec_id")
    mat = semantic_dedup(emb, cents, tau=0.4, assign="matmul").orderBy("vec_id")
    assert [r.asDict() for r in nat.collect()] == [
        r.asDict() for r in mat.collect()
    ]
