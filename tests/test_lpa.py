"""Synchronous label propagation (operators/lpa.py)."""

from __future__ import annotations

from vector_db_mvp_spark.operators.lpa import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_two_cliques_with_bridge_match_reference(spark):
    """Two triangles joined by one bridge edge: the fixed-round
    deterministic run must match the pure-python reference exactly
    (synchronous LPA with min tie-break oscillates on symmetric
    structures — the CONTRACT is determinism, not convergence)."""
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    pairs = tri1 + tri2 + [(3, 10)]
    adj: dict[int, list[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    labels = {n: n for n in adj}
    for _ in range(3):
        labels = {
            n: min(
                {labels[m] for m in nbrs},
                key=lambda l: (-sum(labels[m] == l for m in nbrs), l),
            )
            for n, nbrs in adj.items()
        }
    got = {
        r.node: r.label
        for r in label_propagation(_edges(spark, pairs), 3).collect()
    }
    assert got == labels


def test_clique_converges_to_min_label(spark):
    pairs = [(x, y) for x in (5, 6, 7, 8) for y in (5, 6, 7, 8) if x < y]
    labels = {
        r.node: r.label for r in label_propagation(_edges(spark, pairs), 3).collect()
    }
    assert set(labels.values()) == {5}


def test_deterministic_across_runs(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4), (5, 6)]
    a = sorted(map(tuple, label_propagation(_edges(spark, pairs), 3).collect()))
    b = sorted(map(tuple, label_propagation(_edges(spark, pairs), 3).collect()))
    assert a == b


def test_matches_pure_python_reference(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 5), (6, 7), (7, 8)]
    adj: dict[int, list[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    labels = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n, nbrs in adj.items():
            counts: dict[int, int] = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            new[n] = min(
                (l for l in counts), key=lambda l: (-counts[l], l)
            )
        labels = new
    got = {
        r.node: r.label for r in label_propagation(_edges(spark, pairs), 3).collect()
    }
    assert got == labels


def test_max_degree_noop_when_cap_exceeds_max_degree(spark):
    """The skew knob must be exact when it doesn't bind: capped at the
    graph's max degree == uncapped, bit-identical."""
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    a = sorted(map(tuple, label_propagation(_edges(spark, pairs), 3).collect()))
    b = sorted(
        map(
            tuple,
            label_propagation(_edges(spark, pairs), 3, max_degree=3).collect(),
        )
    )
    assert a == b


def test_max_degree_caps_hub_fanout(spark):
    """With a binding cap, a degree-N hub propagates via at most
    max_degree out-edges per round; every node still gets a label and
    the run stays deterministic."""
    import pytest

    n = 40
    pairs = [(0, i) for i in range(1, n + 1)] + [(i, i + 1) for i in range(1, n)]
    a = sorted(
        map(tuple, label_propagation(_edges(spark, pairs), 2, max_degree=5).collect())
    )
    b = sorted(
        map(tuple, label_propagation(_edges(spark, pairs), 2, max_degree=5).collect())
    )
    assert a == b  # deterministic hash-ordered sample
    assert len(a) == n + 1  # every node labeled, none dropped by the cap
    with pytest.raises(ValueError, match="max_degree"):
        label_propagation(_edges(spark, pairs), 2, max_degree=0)


def test_two_phase_trim_matches_one_phase_reference(spark):
    """r12 verdict task 5: the hub trim is now two-phase (hash-threshold
    pre-prune, then the exact row_number cut). The sample contract is
    BIT-IDENTICAL to the one-phase form — pin it against a pure-python
    replica of the one-phase semantics (full (h64, dst) sort per hub,
    take max_degree) on a hub graph big enough that the pre-prune BINDS
    (degree 201 > 8 x cap 5, threshold keeps ~20% of hub edges)."""
    import hashlib

    n, cap, rounds = 200, 5, 2
    pairs = [(0, i) for i in range(1, n + 1)] + [
        (i, i + 1) for i in range(1, n)
    ]
    sym = set()
    for u, v in pairs:
        sym.add((u, v))
        sym.add((v, u))
    deg: dict[int, int] = {}
    adj: dict[int, list[int]] = {}
    for s, d in sym:
        deg[s] = deg.get(s, 0) + 1
        adj.setdefault(s, []).append(d)
    assert deg[0] > 8 * cap  # the pre-prune threshold actually binds

    def h64(s: int, d: int) -> int:
        return int(hashlib.md5(f"{s},{d}".encode()).hexdigest()[:15], 16)

    kept = []
    for s, outs in adj.items():
        if deg[s] > cap:
            outs = sorted(outs, key=lambda d: (h64(s, d), d))[:cap]
        kept += [(s, d) for d in outs]
    labels = {nd: nd for nd in deg}
    for _ in range(rounds):
        cnt: dict[int, dict[int, int]] = {}
        for s, d in kept:
            cnt.setdefault(d, {})
            cnt[d][labels[s]] = cnt[d].get(labels[s], 0) + 1
        labels = {d: min(c, key=lambda l: (-c[l], l)) for d, c in cnt.items()}
    got = {
        r.node: r.label
        for r in label_propagation(
            _edges(spark, pairs), rounds, max_degree=cap
        ).collect()
    }
    assert got == labels


def test_registered_cap_binds_at_gate_scale(spark):
    """The r11 gotcha: a capped twin whose cap exceeds the gate-scale max
    degree verifies nothing. Pin that the >=2 co-purchase graph's max
    degree exceeds _LPA_CAP at sf0.01 AND the capped output differs from
    the uncapped one there."""
    from pyspark.sql import functions as F

    from vector_db_mvp_spark.workload.copurchase import copurchase_weighted
    from vector_db_mvp_spark.workload.relational import (
        _LPA_CAP,
        q_part_communities,
        q_part_communities_capped,
    )

    sf = "/root/testdata/sf0.01"
    half = copurchase_weighted(spark, sf).filter(F.col("n_orders") >= 2)
    sym = half.select("src", "dst").unionAll(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    max_deg = sym.groupBy("src").count().agg(F.max("count")).first()[0]
    assert max_deg > _LPA_CAP
    a = sorted(map(tuple, q_part_communities(spark, sf).collect()))
    b = sorted(map(tuple, q_part_communities_capped(spark, sf).collect()))
    assert a != b
