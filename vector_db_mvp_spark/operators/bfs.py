"""Bounded breadth-first search over an edge DataFrame.

Iterative graph traversal as a first-class distributed operator — the same
frontier-expansion shape a lineage/link-graph pass needs in a training-data
pipeline (e.g. "every page within 3 hops of a seed whitelist"). The
reference engine has no graph module; this extends the engine alongside
pagerank (operators/pagerank.py) and connected components
(operators/cluster.py).

Scale design (100 TB): classic frontier BFS — per round ONE equi-join of
the current frontier against the edge table (shuffle keyed on the node id,
frontier is the small side and shrinks as the graph saturates) plus one
left-anti join against the visited set. Edges are localCheckpoint-ed once
so the per-round plans do not re-derive the edge list; each new frontier is
checkpointed too, truncating lineage so round r's plan does not replay
rounds 1..r-1 (same pattern as cluster.py's HashMin loop). The visited set
carries min-hop labels for free: a node joins `visited` in the round it is
first reached, which IS its BFS distance.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Serialized in memory, spilling to disk under pressure. The corpus-sized
# edge table must never be cached DESERIALIZED (the on-heap row format is
# ~5x the serialized size — a 48 GiB heap OOM'd at the sf10 probe's ~180M
# edges, BENCH_sf10.md), but pure DISK_ONLY made every small-SF run pay
# checkpoint-write + read-back disk traffic it didn't need — ~1 s of
# page-cache contention in the crowded bench (BENCH_CREEP.md part B).
# Serialized memory-first keeps small graphs entirely in RAM (serialized
# size ~= disk size, so the 5x blowup cannot recur) and degrades to the
# DISK_ONLY behavior exactly when memory pressure forces eviction.
_EDGE_LEVEL = StorageLevel(True, True, False, False)


def bfs_hops(edges: DataFrame, seeds: DataFrame, max_hops: int) -> DataFrame:
    """Min-hop distance from ``seeds`` for every node within ``max_hops``.

    ``edges`` must be DataFrame[src, dst] with both directions present for
    undirected graphs; ``seeds`` is DataFrame[node]. Returns
    DataFrame[node, hop] where hop is the BFS distance (0 for seeds).

    The edge table is checkpointed serialized, memory-first with disk
    spill (``_EDGE_LEVEL``): corpus-sized (a co-purchase graph carries
    ~|baskets|·k² rows), so it must never sit on-heap DESERIALIZED (~5x
    the serialized size — OOM'd a 48 GiB heap at the sf10 probe's ~180M
    edges, BENCH_sf10.md), but small graphs now stay in RAM with zero
    disk traffic. Control-plane-sized frontiers stay in memory.
    """
    edges = edges.select("src", "dst").localCheckpoint(
        eager=True, storageLevel=_EDGE_LEVEL
    )
    seeds = seeds.select("node").distinct().localCheckpoint(eager=True)
    visited = seeds.withColumn("hop", F.lit(0))
    frontier = seeds
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt.withColumn("hop", F.lit(hop)))
        frontier = nxt
    return visited


def cheapest_paths(
    edges: DataFrame, seeds: DataFrame, max_hops: int
) -> DataFrame:
    """Bounded-hop single/multi-source cheapest paths (Bellman-Ford rounds).

    ``edges`` is DataFrame[src, dst, w] (integer weights — exact min, no
    float-accumulation ambiguity; both directions present for undirected
    graphs); ``seeds`` is DataFrame[node]. Returns DataFrame[node, cost]
    with the minimum total weight over any path of <= ``max_hops`` edges
    from any seed (0 for seeds).

    Scale shape: identical to :func:`bfs_hops` — per round one equi-join
    of the distance frame against the (serialized-checkpointed) edge table
    plus one min-aggregation; unlike BFS the frame does NOT shrink (a
    relaxation can improve an already-reached node), so each round is
    bounded by |reached| + |out-edges of reached|. Rounds are fixed at
    ``max_hops`` — the bounded-radius variant a pipeline actually asks for
    ("cheapest affinity route within k links"), which also caps the plan
    depth; unbounded Bellman-Ford would iterate to |V|-1 with the same
    per-round shape.
    """
    edges = edges.select("src", "dst", "w").localCheckpoint(
        eager=True, storageLevel=_EDGE_LEVEL
    )
    dist = (
        seeds.select("node")
        .distinct()
        .withColumn("cost", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_hops):
        cand = dist.join(edges, dist["node"] == edges["src"]).select(
            F.col("dst").alias("node"),
            (F.col("cost") + F.col("w")).alias("cost"),
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
    return dist
