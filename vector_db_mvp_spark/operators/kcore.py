"""k-core decomposition by synchronous peeling: repeatedly delete every
node whose CURRENT degree is < k; the survivors (if the peel has
converged) are exactly the k-core — the standard cohesion filter a graph
pipeline runs before community/embedding work (a node in the k-core has
>= k neighbors that are themselves in the k-core).

Spark realization: a fixed number of synchronous peel rounds, each ONE
degree aggregation + TWO semi-joins (an edge survives iff both endpoints
survive), with a serialized localCheckpoint per round so round r's plan
never replays rounds 0..r-1 (the bfs.py lineage rule; same ``_EDGE_LEVEL``
storage reasoning). Synchronous peeling is deterministic — each round's
output is a pure function of the previous edge set — so a SQL oracle can
replay it with ``rounds`` unrolled CTEs (the PageRank / k-means
fixed-iteration pattern), and parity holds whether or not the peel has
converged by the last round. Callers that need the TRUE k-core assert
convergence by checking one extra round is a no-op (pinned in
tests/test_kcore.py for the registered instance).

Scale: per round the shuffle carries the surviving edge set keyed by
endpoint — monotonically shrinking, never the corpus; degree skew is a
groupBy on node id (AQE-splittable). Rounds needed equals the peel depth
of the graph, typically small; at 100 TB the same loop runs with the edge
set partitioned by src.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bfs import _EDGE_LEVEL


def kcore_edges(
    edges: DataFrame,
    k: int,
    rounds: int,
    *,
    broadcast_keep: bool | str = "auto",
    broadcast_max_nodes: int | None = None,
) -> DataFrame:
    """Surviving (src, dst) edges after ``rounds`` synchronous peels at
    threshold ``k``. ``edges`` must carry BOTH directions of each
    undirected edge (so out-degree == degree).

    Convergence early-exit: once a round removes no edges the peel is a
    fixed point — every further synchronous round is the identity (the
    degree of every survivor is already >= k, so ``keep`` re-admits all
    of them) — so we stop instead of re-checkpointing an unchanged
    corpus-sized edge set ``rounds - r`` more times. The count per round
    is bounded control-plane (one scalar off an already-checkpointed
    frame), and the result is bit-identical to running the remaining
    rounds, so fixed-``rounds`` SQL oracles stay in parity.

    ``broadcast_keep``: the pagerank ``broadcast_shares`` contract
    applied to the peel. Each round needs the surviving NODE set on both
    edge endpoints; hash-joining it costs two |E|-sized exchanges per
    round. The node set is |V|-sized and SHRINKS monotonically, so below
    ``broadcast_max_nodes`` (pagerank's BROADCAST_MAX_NODES default) it
    broadcasts instead — per round: one map-side-combined degree shuffle
    and ZERO join exchanges. Measured honestly
    (.claude/probe_r12_kcore_broadcast.json): results bit-identical at
    sf0.1/sf1 and local[32] wall time FLAT (local shuffles are memory
    copies, and AQE already broadcasts small keeps at runtime) — the leg
    exists for the cluster shape, where two |E| network exchanges per
    round dwarf one |V| broadcast, and for keeps past the 10 MB AQE
    threshold that static planning would sort-merge. "auto" decides once
    from the initial node count (bounded control plane — one agg off the
    checkpointed frame); True/False force the leg. Above the threshold
    the shuffle path keeps the 100 TB safety: no |V|-sized
    driver/executor table.
    """
    if k < 1 or rounds < 1:
        raise ValueError("kcore_edges: k and rounds must be >= 1")
    # LAZY checkpoint + count, not eager + count (r15, guide §5): the
    # count is a full scan of the marked RDD, so it materializes every
    # partition into the block manager and completes the checkpoint in
    # the SAME job — eager=True ran one job to materialize and a second
    # to count, i.e. two jobs per round for one round's work. Lineage
    # truncation and the barrier semantics are identical once the count
    # returns; results are bit-identical (nothing about the plan
    # changes, only the number of actions driving it).
    alive = edges.select("src", "dst").localCheckpoint(
        eager=False, storageLevel=_EDGE_LEVEL
    )
    n_alive = alive.count()
    if broadcast_keep == "auto":
        if broadcast_max_nodes is None:
            from .pagerank import BROADCAST_MAX_NODES

            broadcast_max_nodes = BROADCAST_MAX_NODES
        n_nodes = alive.select("src").distinct().count()
        use_broadcast = n_nodes <= broadcast_max_nodes
    else:
        use_broadcast = bool(broadcast_keep)
    for _ in range(rounds):
        if n_alive == 0:
            break
        keep = (
            alive.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") >= k)
            .select(F.col("src").alias("_node"))
        )
        if use_broadcast:
            keep = F.broadcast(keep)
        nxt = (
            alive.join(keep, alive["src"] == keep["_node"], "left_semi")
            .join(keep, alive["dst"] == keep["_node"], "left_semi")
            # lazy: the convergence count right below materializes the
            # checkpoint in the same job (see the header comment) — one
            # job per peel round instead of two
            .localCheckpoint(eager=False, storageLevel=_EDGE_LEVEL)
        )
        n_nxt = nxt.count()
        if n_nxt == n_alive:
            # Fixed point: no edge was removed, so no endpoint lost
            # degree, so every later round returns the same set.
            break
        alive, n_alive = nxt, n_nxt
    return alive


def kcore_nodes(
    edges: DataFrame,
    k: int,
    rounds: int,
    *,
    broadcast_keep: bool | str = "auto",
) -> DataFrame:
    """(node, core_degree) for every node surviving ``rounds`` peels at
    threshold ``k`` — core_degree is its degree WITHIN the surviving
    subgraph (>= k everywhere once the peel has converged)."""
    alive = kcore_edges(edges, k, rounds, broadcast_keep=broadcast_keep)
    return alive.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )
