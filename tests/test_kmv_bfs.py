"""KMV sketch + bounded BFS operator semantics (hand-built graphs/sets);
their sf-level oracle parity runs in test_queries_oracle via the registry."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.bfs import bfs_hops
from vector_db_mvp_spark.operators.sketch import kmv_distinct


def test_kmv_small_group_is_exact(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(3)],
        "g string, v long",
    )
    rows = {r["g"]: r for r in kmv_distinct(df, "g", "v", k=64).collect()}
    assert rows["a"]["distinct_estimate"] == 10 and rows["a"]["k_used"] == 10
    assert rows["b"]["distinct_estimate"] == 3 and rows["b"]["n_exact"] == 3


def test_kmv_large_group_estimator_formula(spark):
    n, k = 2000, 64
    df = spark.createDataFrame([("g", i) for i in range(n)], "g string, v long")
    row = kmv_distinct(df, "g", "v", k=k).collect()[0]
    hashes = sorted(hashlib.md5(str(i).encode()).hexdigest() for i in range(n))
    v = max(int(hashes[k - 1][:8], 16), 1)
    expect = int((k - 1) * 4294967296.0 / v)
    assert row["distinct_estimate"] == expect
    assert row["k_used"] == k and row["n_exact"] == n
    # the estimate is a real estimate: within ~3/sqrt(k) of truth
    # (deterministic given the fixed hash; this draw lands at +17%)
    assert abs(row["distinct_estimate"] - n) < n * 0.5


def test_kmv_duplicates_ignored(spark):
    df = spark.createDataFrame(
        [("g", i % 5) for i in range(100)], "g string, v long"
    )
    row = kmv_distinct(df, "g", "v", k=8).collect()[0]
    assert row["n_exact"] == 5 and row["distinct_estimate"] == 5


def test_cms_small_vocab_exact_and_ordered(spark):
    from vector_db_mvp_spark.operators.sketch import cms_heavy_hitters

    data = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 1
    df = spark.createDataFrame(data, "v string")
    rows = cms_heavy_hitters(df, "v", depth=4, width=1024, k=10).collect()
    # 3 values vs 4x1024 counters: no colliding pair survives the row-min,
    # so estimates are exact (deterministic — fixed md5 hash family).
    assert [(r["value"], r["est_count"]) for r in rows] == [
        ("a", 50),
        ("b", 30),
        ("c", 1),
    ]


def test_cms_estimate_never_undercounts(spark):
    from vector_db_mvp_spark.operators.sketch import cms_heavy_hitters

    # width 4 forces collisions: every estimate must still be >= the true
    # count (CM sketches only over-count).
    data = [(f"w{i % 23}",) for i in range(400)]
    df = spark.createDataFrame(data, "v string")
    true = {}
    for (v,) in data:
        true[v] = true.get(v, 0) + 1
    rows = cms_heavy_hitters(df, "v", depth=2, width=4, k=23).collect()
    assert len(rows) == 23
    for r in rows:
        assert r["est_count"] >= true[r["value"]]


def test_bfs_min_hop_on_path_graph(spark):
    # 1-2-3-4-5 chain plus shortcut 1-4: node 4 is hop 1, node 5 hop 2.
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hop"] for r in bfs_hops(edges, seeds, 3).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_bfs_hop_bound_and_disconnected(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hop"] for r in bfs_hops(edges, seeds, 2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # 4 beyond bound, 10/11 unreachable


def test_bfs_multi_seed(spark):
    pairs = [(1, 2), (2, 3), (5, 3)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (5,)], "node long")
    got = {r["node"]: r["hop"] for r in bfs_hops(edges, seeds, 2).collect()}
    assert got == {1: 0, 5: 0, 2: 1, 3: 1}


def test_kmv_no_single_partition_exchange(spark, sf_dir):
    from vector_db_mvp_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = kmv_distinct(ev, "event_type", "user_id", k=64)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_cheapest_paths_multihop_beats_direct(spark):
    from vector_db_mvp_spark.operators.bfs import cheapest_paths

    # 1 -(10)- 4 direct, but 1 -(2)- 2 -(3)- 4 is cheaper (5 vs 10); node 5
    # via the cheap route needs 3 hops (cost 6); node 6 is reachable within
    # the bound ONLY via the expensive direct edge (10+1+1) — pinning that
    # the hop bound applies per-path, not to the final relaxed cost.
    raw = [(1, 4, 10), (1, 2, 2), (2, 4, 3), (4, 5, 1), (5, 6, 1)]
    edges = spark.createDataFrame(
        raw + [(b, a, w) for a, b, w in raw], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["cost"]
        for r in cheapest_paths(edges, seeds, max_hops=3).collect()
    }
    assert got == {1: 0, 2: 2, 4: 5, 5: 6, 6: 12}


def test_cheapest_paths_multi_source_and_bound(spark):
    from vector_db_mvp_spark.operators.bfs import cheapest_paths

    raw = [(1, 2, 5), (10, 2, 1), (2, 3, 1)]
    edges = spark.createDataFrame(
        raw + [(b, a, w) for a, b, w in raw], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,), (10,)], "node long")
    got = {
        r["node"]: r["cost"]
        for r in cheapest_paths(edges, seeds, max_hops=1).collect()
    }
    # node 2 takes the cheaper seed (10); node 3 is beyond the 1-hop bound
    assert got == {1: 0, 10: 0, 2: 1}
