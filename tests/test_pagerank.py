"""Fixed-iteration PageRank (operators/pagerank.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.pagerank import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_ranks_sum_to_one(spark):
    """Stochastic conservation: with no dangling nodes the ranks stay a
    probability distribution (up to the per-round rounding)."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    total = pagerank(e, 3).agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_symmetric_cycle_is_uniform(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    ranks = {r.node: r.rank for r in pagerank(e, 5).collect()}
    assert ranks["a"] == ranks["b"] == ranks["c"] == pytest.approx(1 / 3, abs=1e-9)


def test_hub_outranks_spokes(spark):
    """Star graph (symmetrized): the hub collects rank from every spoke."""
    pairs = []
    for s in ("x", "y", "z", "w"):
        pairs += [("hub", s), (s, "hub")]
    ranks = {r.node: r.rank for r in pagerank(_edges(spark, pairs), 3).collect()}
    assert ranks["hub"] > max(ranks[s] for s in ("x", "y", "z", "w"))


def test_duplicate_edges_collapse(spark):
    """The edge list is distinct()-ed: repeating an edge must not change
    the result."""
    once = pagerank(_edges(spark, [("a", "b"), ("b", "a")]), 2).collect()
    twice = pagerank(
        _edges(spark, [("a", "b"), ("a", "b"), ("b", "a")]), 2
    ).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


def test_triangle_counts_on_known_graph(spark):
    from vector_db_mvp_spark.operators.pagerank import triangle_participation

    # K4 on {a,b,c,d}: 4 triangles, each node in exactly 3.
    nodes = ["a", "b", "c", "d"]
    pairs = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    e = spark.createDataFrame(pairs, "src string, dst string")
    got = {r.node: r.n_triangles for r in triangle_participation(e).collect()}
    assert got == {n: 3 for n in nodes}


def test_triangle_orientation_dedups_reversed_edges(spark):
    from vector_db_mvp_spark.operators.pagerank import triangle_participation

    # Triangle given with mixed/duplicated orientations: still ONE triangle.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "a")],
        "src string, dst string",
    )
    got = {r.node: r.n_triangles for r in triangle_participation(e).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_wedge_join_is_degree_oriented(spark):
    """A small-id hub must generate ZERO wedges: every hub edge points AT
    the hub under the (degree, id) orientation. Triangle counts stay
    exact. (The id-oriented plan this replaces gave the hub C(N,2)
    wedges — .claude/probe_r12_wedge_orient.json measures 2000x at
    N=4000.)"""
    from pyspark.sql import functions as F

    from vector_db_mvp_spark.operators.pagerank import (
        _oriented_wedge_triangles,
    )

    n = 30
    rows = [(0, i) for i in range(1, n + 1)] + [(i, i + 1) for i in range(1, n)]
    e = (
        spark.createDataFrame(rows, "a long, b long")
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    tri = _oriented_wedge_triangles(e).collect()
    # ring edge (i, i+1) + hub closes triangle {0, i, i+1}: n-1 triangles
    assert len(tri) == n - 1
    assert all({r.x, r.y, r.z} == {0, i, i + 1} for r, i in zip(
        sorted(tri, key=lambda r: min({r.x, r.y, r.z} - {0})), range(1, n)
    ))
    # the hub (max degree) must never be a wedge CENTER: x is the
    # (deg,id)-lowest vertex of each triangle, and the hub is highest
    assert all(r.x != 0 for r in tri)


def test_no_triangles_in_a_path(spark):
    from vector_db_mvp_spark.operators.pagerank import triangle_participation

    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    assert triangle_participation(e).count() == 0


def _explain(df):
    from pyspark.sql import SparkSession

    jvm = SparkSession.getActiveSession()._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


_G = [
    ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
    ("d", "a"), ("d", "b"), ("b", "a"), ("a", "d"),
]


def test_coshuffle_path_bit_identical_to_broadcast(spark):
    """broadcast_shares=False (the |V|-beyond-broadcast-reach path) must
    produce BIT-identical ranks: same expressions, same 12-decimal pins,
    only the physical join strategy differs."""
    b = sorted(map(tuple, pagerank(_edges(spark, _G), 5, broadcast_shares=True).collect()))
    s = sorted(map(tuple, pagerank(_edges(spark, _G), 5, broadcast_shares=False).collect()))
    assert b == s


def test_ppr_coshuffle_path_bit_identical(spark):
    from vector_db_mvp_spark.operators.pagerank import personalized_pagerank

    b = sorted(map(tuple, personalized_pagerank(
        _edges(spark, _G), 4, "a", broadcast_shares=True).collect()))
    s = sorted(map(tuple, personalized_pagerank(
        _edges(spark, _G), 4, "a", broadcast_shares=False).collect()))
    assert b == s


def test_auto_threshold_drops_broadcast_above_max_nodes(spark):
    """"auto" with a threshold below |V| must plan ZERO BroadcastExchange —
    the 100 TB insurance: neither driver nor executors ever hold the full
    |V| share table."""
    df = pagerank(_edges(spark, _G), 2, broadcast_max_nodes=1)
    plan = _explain(df)
    assert "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan


def test_auto_threshold_keeps_broadcast_below_max_nodes(spark):
    df = pagerank(_edges(spark, _G), 2, broadcast_max_nodes=10_000)
    assert "BroadcastExchange" in _explain(df)


def test_ppr_auto_threshold_drops_broadcast(spark):
    from vector_db_mvp_spark.operators.pagerank import personalized_pagerank

    df = personalized_pagerank(_edges(spark, _G), 2, "a", broadcast_max_nodes=1)
    plan = _explain(df)
    assert "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan


def test_weighted_pagerank_matches_pure_python(spark):
    """Weighted variant against a direct float reference with the same
    12-decimal pinning (weights change both out-degree normalization and
    per-edge contribution)."""
    from vector_db_mvp_spark.operators.pagerank import pagerank

    pairs = [("a", "b", 3), ("b", "a", 3), ("a", "c", 1),
             ("c", "a", 1), ("b", "c", 2), ("c", "b", 2)]
    e = spark.createDataFrame(pairs, "src string, dst string, w long")
    d = 0.85
    nodes = {"a", "b", "c"}
    outw = {}
    for s, _, w in pairs:
        outw[s] = outw.get(s, 0) + w
    rank = {v: 1.0 / 3 for v in nodes}
    for _ in range(3):
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in pairs:
            contrib[t] += round(rank[s] / outw[s] * w, 12)
        rank = {
            v: round((1 - d) / 3 + d * contrib[v], 12) for v in nodes
        }
    got = {
        r.node: r.rank
        for r in pagerank(e, 3, weight_col="w", assume_distinct=True).collect()
    }
    import pytest as _pt

    assert got == _pt.approx(rank, abs=2e-9)


def test_weight_one_equals_unweighted(spark):
    """All-ones weights must reproduce the unweighted ranks exactly."""
    from vector_db_mvp_spark.operators.pagerank import pagerank

    pairs = [(s, t) for s, t in
             [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("b", "c"), ("c", "b")]]
    e = spark.createDataFrame(pairs, "src string, dst string")
    ew = e.withColumn("w", F.lit(1).cast("long"))
    a = sorted(map(tuple, pagerank(e, 3).collect()))
    b = sorted(map(tuple, pagerank(ew, 3, weight_col="w").collect()))
    assert a == b


def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src string, dst string, w double")


def test_weight_guard_rejects_zero_negative_fractional(spark):
    """r12 verdict task 4 + ADVICE: the weighted path silently cast w to
    long (fractions truncate) and DECIMAL(9,0) (w >= 1e9 NULLs out) —
    the entry guard must fail loudly on every degenerate weight class
    instead (the hits()/ktruss/logistic_newton discipline)."""
    import pytest as _pt

    from vector_db_mvp_spark.operators.pagerank import pagerank

    base = [("a", "b", 2.0), ("b", "a", 2.0)]
    with _pt.raises(ValueError, match="> 0"):
        pagerank(_wedges(spark, base + [("a", "b", 0.0)]), 2,
                 weight_col="w", assume_distinct=True).collect()
    with _pt.raises(ValueError, match="> 0"):
        pagerank(_wedges(spark, [("a", "b", -3.0), ("b", "a", 2.0)]), 2,
                 weight_col="w", assume_distinct=True).collect()
    with _pt.raises(ValueError, match="integral"):
        pagerank(_wedges(spark, [("a", "b", 1.5), ("b", "a", 2.0)]), 2,
                 weight_col="w", assume_distinct=True).collect()
    with _pt.raises(ValueError, match="2\\^53"):
        pagerank(_wedges(spark, [("a", "b", float(2**53)), ("b", "a", 2.0)]),
                 2, weight_col="w", assume_distinct=True).collect()
    # NaN passes every range comparison and NULL is invisible to
    # min/max/floor. NULLs are poisoned to NaN in the edge select (both
    # assume_distinct paths) BEFORE any sum, so the NaN check is the
    # single funnel for both bad-weight classes — there is deliberately
    # no separate isNull branch (it would be unreachable, ADVICE r13).
    with _pt.raises(ValueError, match="NaN"):
        pagerank(_wedges(spark, [("a", "b", float("nan")), ("b", "a", 2.0)]),
                 2, weight_col="w", assume_distinct=True).collect()
    with _pt.raises(ValueError, match="NaN"):
        pagerank(_wedges(spark, [("a", "b", None), ("b", "a", 2.0)]),
                 2, weight_col="w").collect()


def test_large_weights_keep_significant_digits(spark):
    """Two r12 defects in one pin: (a) the DECIMAL(9,0) product cast
    silently NULLed any w >= 1e9 (edge contributions dropped from the
    sum); (b) rounding the share BEFORE the weight multiply underflowed
    the 12-decimal pin at large out-weight (uniform w=1e10 gave 0.339 vs
    the exact 0.3333 — ~2 significant digits). With the round-after-
    multiply form, uniform huge weights must cancel back to the
    unweighted ranks to ~1e-9 (per-edge IEEE rounding only)."""
    import pytest as _pt

    from vector_db_mvp_spark.operators.pagerank import pagerank

    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
             ("b", "c"), ("c", "b")]
    e = spark.createDataFrame(pairs, "src string, dst string")
    ew = e.withColumn("w", F.lit(10_000_000_000).cast("double"))  # 1e10
    a = dict(map(tuple, pagerank(e, 3).collect()))
    b = dict(map(tuple, pagerank(ew, 3, weight_col="w").collect()))
    assert b == _pt.approx(a, abs=1e-9)


def test_duplicate_weighted_edges_sum(spark):
    """ADVICE r12: with assume_distinct=False, duplicate (src, dst)
    pairs differing only in w both survived distinct() and were double-
    counted. They must now merge by SUMMING weights — identical to
    presenting the pre-summed multigraph with assume_distinct=True."""
    from vector_db_mvp_spark.operators.pagerank import pagerank

    dup = [("a", "b", 1.0), ("a", "b", 2.0), ("b", "a", 3.0),
           ("a", "c", 1.0), ("c", "a", 1.0), ("b", "c", 2.0),
           ("c", "b", 2.0)]
    summed = [("a", "b", 3.0), ("b", "a", 3.0), ("a", "c", 1.0),
              ("c", "a", 1.0), ("b", "c", 2.0), ("c", "b", 2.0)]
    a = sorted(map(tuple, pagerank(
        _wedges(spark, dup), 3, weight_col="w").collect()))
    b = sorted(map(tuple, pagerank(
        _wedges(spark, summed), 3, weight_col="w",
        assume_distinct=True).collect()))
    assert a == b


def test_weighted_ppr_ones_equals_unweighted(spark):
    """All-ones weights through the ppr leg of the shared weighted
    machinery must reproduce the unweighted personalized ranks exactly
    (x1.0 is an exact IEEE no-op, so even the round-after-multiply pin
    is unchanged)."""
    from vector_db_mvp_spark.operators.pagerank import personalized_pagerank

    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
             ("b", "c"), ("c", "b")]
    e = spark.createDataFrame(pairs, "src string, dst string")
    ew = e.withColumn("w", F.lit(1).cast("double"))
    a = sorted(map(tuple, personalized_pagerank(
        e, 3, "a", assume_distinct=True).collect()))
    b = sorted(map(tuple, personalized_pagerank(
        ew, 3, "a", assume_distinct=True, weight_col="w").collect()))
    assert a == b
