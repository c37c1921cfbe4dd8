"""Neighborhood-structure operators (operators/linkpred.py) and HITS
(operators/pagerank.py) against hand-computable graphs and a pure-Python
reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.linkpred import (
    adamic_adar,
    clustering_coefficient,
)
from vector_db_mvp_spark.operators.pagerank import hits


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_clustering_k4_is_one(spark):
    """Complete graph K4: every node's neighborhood is fully closed."""
    nodes = ["a", "b", "c", "d"]
    pairs = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    got = {r.node: r for r in clustering_coefficient(_edges(spark, pairs)).collect()}
    for n in nodes:
        assert got[n].deg == 3
        assert got[n].n_triangles == 3
        assert got[n].coeff == 1.0


def test_clustering_path_is_zero(spark):
    """Path a-b-c: b has two unconnected neighbors -> coeff 0; the
    degree-1 endpoints are excluded (deg >= 2 filter)."""
    got = {
        r.node: r
        for r in clustering_coefficient(
            _edges(spark, [("a", "b"), ("b", "c")])
        ).collect()
    }
    assert set(got) == {"b"}
    assert got["b"].n_triangles == 0 and got["b"].coeff == 0.0


def test_clustering_mixed_triangle_plus_tail(spark):
    """Triangle abc with a tail a-d: coeff(a) = 2*1/(3*2) = 1/3."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")])
    got = {r.node: r for r in clustering_coefficient(e).collect()}
    assert got["a"].deg == 3 and got["a"].n_triangles == 1
    assert got["a"].coeff == pytest.approx(1 / 3, abs=1e-6)
    assert got["b"].coeff == 1.0 and got["c"].coeff == 1.0


def test_adamic_adar_known_square(spark):
    """Square a-b-c-d-a: the two diagonals (a,c) and (b,d) each share two
    degree-2 common neighbors -> score 2/ln(2); existing edges excluded."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    got = {(r.a, r.b): r for r in adamic_adar(e).collect()}
    assert set(got) == {("a", "c"), ("b", "d")}
    for r in got.values():
        assert r.n_common == 2
        assert r.score == pytest.approx(2 / math.log(2), abs=1e-6)


def test_adamic_adar_excludes_existing_edges(spark):
    """Triangle: every pair is an edge -> no candidates at all."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert adamic_adar(e).count() == 0


def test_adamic_adar_matches_pure_python(spark):
    """Random-ish deterministic graph vs a direct O(V^3) reference."""
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("c", "d"),
        ("d", "e"), ("e", "f"), ("b", "f"), ("c", "f"),
    ]
    adj: dict[str, set[str]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expect = {}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if y in adj[x]:
                continue
            common = adj[x] & adj[y]
            if common:
                expect[(x, y)] = sum(
                    round(1 / math.log(len(adj[z])), 12) for z in common
                )
    got = {(r.a, r.b): r.score for r in adamic_adar(_edges(spark, pairs)).collect()}
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=1e-6)


def test_adamic_adar_center_degree_cap(spark):
    """The hub-cap knob drops wedges centered on high-degree nodes; on a
    star there are no other centers, so capping below the hub degree
    empties the result."""
    pairs = [("hub", s) for s in ("x", "y", "z", "w")]
    e = _edges(spark, pairs)
    assert adamic_adar(e).count() == 6  # C(4,2) spoke pairs via the hub
    assert adamic_adar(e, max_center_degree=3).count() == 0


def test_hits_rejects_zero_iters(spark):
    """iters=0 would leave auth=None and crash on the final union; the
    entry guard must reject it up front (matching ktruss_edges)."""
    e = _edges(spark, [("c1", "s1")])
    with pytest.raises(ValueError, match="iters"):
        hits(e, 0)


def test_sql_adamic_adar_cap_param_renders(spark):
    """The oracle-side cap is a first-class parameter, not a string
    replace — it must appear in the HAVING clause when set and be absent
    otherwise."""
    from vector_db_mvp_spark.operators.linkpred import sql_adamic_adar

    capped = sql_adamic_adar("SELECT 1 AS src, 2 AS dst", max_center_degree=6)
    uncapped = sql_adamic_adar("SELECT 1 AS src, 2 AS dst")
    assert "COUNT(*) <= 6" in capped
    assert "COUNT(*) <=" not in uncapped


def test_hits_bipartite_known(spark):
    """2 customers x 2 suppliers, c1 buys from both, c2 from s1 only:
    the better-connected supplier s1 must out-rank s2, and the
    better-connected hub c1 must out-rank c2."""
    e = _edges(spark, [("c1", "s1"), ("c1", "s2"), ("c2", "s1")])
    got = {(r.role, r.node): r.score for r in hits(e, 2).collect()}
    assert got[("authority", "s1")] > got[("authority", "s2")]
    assert got[("hub", "c1")] > got[("hub", "c2")]
    # L1 normalization: each role's scores sum to ~1.
    assert sum(v for (role, _), v in got.items() if role == "hub") == pytest.approx(
        1.0, abs=1e-9
    )
    assert sum(
        v for (role, _), v in got.items() if role == "authority"
    ) == pytest.approx(1.0, abs=1e-9)


def test_hits_broadcast_and_coshuffle_paths_identical(spark):
    """The broadcast_shares knob must not change results (same contract
    as pagerank's)."""
    pairs = [("c%d" % i, "s%d" % (i % 3)) for i in range(12)] + [
        ("c1", "s2"), ("c4", "s0")
    ]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, hits(e, 2, broadcast_shares=True).collect()))
    b = sorted(map(tuple, hits(e, 2, broadcast_shares=False).collect()))
    assert a == b


def test_hits_matches_pure_python(spark):
    """Direct float reference with the same 12-decimal pinning."""
    pairs = [("c1", "s1"), ("c1", "s2"), ("c2", "s1"), ("c3", "s3"), ("c3", "s1")]
    hub = {c: 1.0 for c, _ in pairs}
    auth: dict[str, float] = {}
    for _ in range(2):
        auth = {}
        for c, s in pairs:
            auth[s] = auth.get(s, 0.0) + round(hub[c], 12)
        tot = sum(auth.values())
        auth = {s: round(v / tot, 12) for s, v in auth.items()}
        hub = {}
        for c, s in pairs:
            hub[c] = hub.get(c, 0.0) + round(auth[s], 12)
        tot = sum(hub.values())
        hub = {c: round(v / tot, 12) for c, v in hub.items()}
    got = {(r.role, r.node): r.score for r in hits(_edges(spark, pairs), 2).collect()}
    for c, v in hub.items():
        assert got[("hub", c)] == pytest.approx(v, abs=1e-9)
    for s, v in auth.items():
        assert got[("authority", s)] == pytest.approx(v, abs=1e-9)
