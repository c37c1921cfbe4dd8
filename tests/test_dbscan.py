"""Deterministic DBSCAN (operators/dbscan.py).

Pins the role/cluster semantics on a hand-computed graph, partitioning
invariance, the distributed-CC path equivalence, and the brute-force
definition on the real fixture pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.dbscan import dbscan


def _points(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _pairs(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "id1 long, id2 long"
    )


# Two blobs bridged by a border point, plus an isolated noise point:
#   clique {1,2,3,4}  (degree 3 each)
#   clique {10,11,12,13} (degree 3 each)
#   5 attached to 4 and 10 only (degree 2)
#   6 isolated
_EDGES = [
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
    (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13),
    (4, 5), (5, 10),
]
_IDS = [1, 2, 3, 4, 5, 6, 10, 11, 12, 13]


def _run(spark, **kw):
    out = dbscan(
        _points(spark, _IDS), _pairs(spark, _EDGES), min_pts=4, id_col="id", **kw
    )
    return {r["id"]: (r["role"], r["cluster_id"]) for r in out.collect()}


def test_roles_and_clusters(spark):
    got = _run(spark)
    # min_pts=4 -> core iff degree >= 3: the two cliques.
    for i in (1, 2, 3, 4):
        assert got[i] == ("core", 1)
    for i in (10, 11, 12, 13):
        assert got[i] == ("core", 10)
    # 5 has core neighbors in BOTH clusters -> min cluster id, border.
    assert got[5] == ("border", 1)
    # 6 has no edges at all -> noise, NULL cluster.
    assert got[6] == ("noise", None)
    assert len(got) == len(_IDS)


def test_border_does_not_merge_clusters(spark):
    # The bridge point 5 is not core, so the two cliques must remain
    # distinct components (classic DBSCAN density-reachability: border
    # points never transmit connectivity).
    got = _run(spark)
    assert {c for _, (r, c) in got.items() if r == "core"} == {1, 10}


def test_partitioning_invariance(spark):
    assert _run(spark, num_partitions=2) == _run(spark, num_partitions=8)


def test_distributed_cc_path_equivalent(spark):
    # driver_threshold=0 forces the label-propagation loop in
    # connected_components; the labeling must be identical.
    assert _run(spark, driver_threshold=0) == _run(spark)


def test_min_pts_sweep(spark):
    # min_pts=6 -> core needs degree >= 5: nobody qualifies -> all noise.
    out = dbscan(
        _points(spark, _IDS), _pairs(spark, _EDGES), min_pts=6, id_col="id"
    ).collect()
    assert all(r["role"] == "noise" and r["cluster_id"] is None for r in out)
    # min_pts=2 -> core iff degree >= 1: everything with an edge is core,
    # the bridge fuses both blobs into one component; 6 stays noise.
    got = {
        r["id"]: (r["role"], r["cluster_id"])
        for r in dbscan(
            _points(spark, _IDS), _pairs(spark, _EDGES), min_pts=2, id_col="id"
        ).collect()
    }
    assert all(got[i] == ("core", 1) for i in _IDS if i != 6)
    assert got[6] == ("noise", None)


def test_knn_edges_cap_and_selection(spark, sf_dir):
    """knn_edges_lsh must equal the brute-force trim of the bucket
    candidate set: per src, keep the k best by (cosine DESC, dst ASC),
    union-symmetrize — and the result is bounded by N*k edges."""
    from vector_db_mvp_spark.functions.lsh import generate_planes
    from vector_db_mvp_spark.operators.dbscan import knn_edges_lsh
    from vector_db_mvp_spark.operators.dedup import embedding_neardup_pairs_lsh
    from vector_db_mvp_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    planes = generate_planes(64, 4, 4, seed=42)
    k = 3
    got = {
        (r["id1"], r["id2"])
        for r in knn_edges_lsh(emb, planes, k=k, tau=0.3).collect()
    }

    # Brute force from the (undirected) bucket-candidate pairs of the
    # independent dedup-operator path: directed ranking per endpoint.
    cand = embedding_neardup_pairs_lsh(emb, planes, tau=0.3).collect()
    directed: dict[int, list[tuple[float, int]]] = {}
    for r in cand:
        directed.setdefault(r["id1"], []).append((-r["cosine"], r["id2"]))
        directed.setdefault(r["id2"], []).append((-r["cosine"], r["id1"]))
    expected = set()
    for src, lst in directed.items():
        for _, dst in sorted(lst)[:k]:
            expected.add((min(src, dst), max(src, dst)))
    assert got == expected
    n = emb.count()
    assert len(got) <= n * k


def test_matches_bruteforce_on_fixture(spark, sf_dir):
    """Definition check on real data: run dbscan on the fixture's exact
    cosine pairs and re-derive roles/clusters with a pure-Python
    brute force from the same pair list."""
    from vector_db_mvp_spark.operators.dedup import embedding_neardup_pairs

    from vector_db_mvp_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    pairs_df = embedding_neardup_pairs(emb, tau=0.3).select("id1", "id2")
    pair_list = [(r["id1"], r["id2"]) for r in pairs_df.collect()]
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]

    got = {
        r["vec_id"]: (r["role"], r["cluster_id"])
        for r in dbscan(
            emb.select("vec_id"), pairs_df, min_pts=5, id_col="vec_id"
        ).collect()
    }

    # Brute force: adjacency -> degrees -> core -> core-component min-id
    # labels (BFS) -> border assignment.
    adj: dict[int, set[int]] = {i: set() for i in ids}
    for a, b in pair_list:
        adj[a].add(b)
        adj[b].add(a)
    core = {i for i in ids if len(adj[i]) >= 4}
    label: dict[int, int] = {}
    for seed in sorted(core):
        if seed in label:
            continue
        comp, queue = [seed], [seed]
        label[seed] = seed
        while queue:
            cur = queue.pop()
            for nb in adj[cur]:
                if nb in core and nb not in label:
                    label[nb] = seed
                    queue.append(nb)
                    comp.append(nb)
        lo = min(comp)
        for i in comp:
            label[i] = lo
    expected = {}
    for i in ids:
        if i in core:
            expected[i] = ("core", label[i])
        else:
            core_nbrs = [label[n] for n in adj[i] if n in core]
            if core_nbrs:
                expected[i] = ("border", min(core_nbrs))
            else:
                expected[i] = ("noise", None)
    assert got == expected
