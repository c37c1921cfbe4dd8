"""k-core semantics pins: hand-built graph with a known core, plus the
registered instance's convergence (one extra peel round is a no-op, so
the fixed-round result IS the true k-core at the gate scale)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_mvp_spark.operators.kcore import kcore_nodes


def _undirected(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_kcore_peels_tail_and_keeps_clique(spark):
    # 4-clique {1,2,3,4} plus a pendant path 4-5-6: the 3-core is exactly
    # the clique (5 and 6 peel, and their removal does not break it).
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(4, 5), (5, 6)]
    edges = _undirected(spark, clique + tail)
    got = {r["node"]: r["core_degree"] for r in kcore_nodes(edges, 3, 4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cascade_to_empty(spark):
    # A pure cycle has degree 2 everywhere: the 3-core is empty, reached in
    # one synchronous round.
    cycle = [(1, 2), (2, 3), (3, 4), (4, 1)]
    edges = _undirected(spark, cycle)
    assert kcore_nodes(edges, 3, 2).count() == 0


def test_registered_instance_converges(spark, sf_dir):
    """The (k=65, rounds=5) oracle instance must have CONVERGED by round 5
    at the gate scale: running one extra round changes nothing, so the
    fixed-round replay equals the true k-core."""
    from vector_db_mvp_spark.workload.relational import (
        _KCORE_K,
        _KCORE_ROUNDS,
        q_part_kcore,
    )
    from vector_db_mvp_spark.operators.kcore import kcore_nodes as kn
    from vector_db_mvp_spark.sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem")
    d = li.select("l_orderkey", "l_partkey").distinct()
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    at_r = {
        (r["part"], r["core_degree"]) for r in q_part_kcore(spark, sf_dir).collect()
    }
    extra = {
        (r["node"], r["core_degree"])
        for r in kn(edges, _KCORE_K, _KCORE_ROUNDS + 1).collect()
    }
    assert at_r == extra and len(at_r) > 0


def test_kcore_early_exit_equals_fixed_rounds(spark):
    """The convergence early-exit must be bit-identical to running the
    full fixed round count: once a round removes nothing, every later
    synchronous round is the identity. Pin by comparing a round count
    far past convergence (the 3-core of clique+tail converges in 2
    rounds; ask for 50) against the minimal converged run."""
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(4, 5), (5, 6)]
    edges = _undirected(spark, clique + tail)
    minimal = {(r["node"], r["core_degree"]) for r in kcore_nodes(edges, 3, 2).collect()}
    far_past = {
        (r["node"], r["core_degree"]) for r in kcore_nodes(edges, 3, 50).collect()
    }
    assert minimal == far_past == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_kcore_empty_edges_early_exit(spark):
    # Zero surviving edges must short-circuit (and not error) regardless
    # of the requested round count.
    cycle = [(1, 2), (2, 3), (3, 1)]
    edges = _undirected(spark, cycle)
    assert kcore_nodes(edges, 5, 100).count() == 0


def test_kcore_validates_args(spark):
    edges = _undirected(spark, [(1, 2)])
    with pytest.raises(ValueError):
        kcore_nodes(edges, 0, 3)
    with pytest.raises(ValueError):
        kcore_nodes(edges, 3, 0)


def test_broadcast_and_shuffle_peel_bit_identical(spark):
    """The broadcast_keep knob must not change results (the pagerank
    broadcast_shares contract applied to the peel)."""
    from vector_db_mvp_spark.operators.kcore import kcore_nodes

    pairs = []
    # K6 core + a fringe path that peels away at k=3
    nodes = list(range(6))
    for i in nodes:
        for j in nodes:
            if i != j:
                pairs.append((i, j))
    pairs += [(6, 0), (0, 6), (6, 7), (7, 6)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    a = sorted(map(tuple, kcore_nodes(e, 3, 4, broadcast_keep=True).collect()))
    b = sorted(map(tuple, kcore_nodes(e, 3, 4, broadcast_keep=False).collect()))
    assert a == b
    assert {n for n, _ in a} == set(range(6))
