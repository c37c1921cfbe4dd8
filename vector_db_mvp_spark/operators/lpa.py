"""Synchronous Label Propagation community detection (Raghavan et al.
2007) with deterministic tie-breaking — the community-structure member of
the graph family beside connected components (operators/cluster.py,
which finds CONNECTivity, not density) and k-core (which finds density
but not partitions).

Semantics: labels start as node ids; each round every node adopts the
most frequent label among its NEIGHBORS, ties broken to the smallest
label (classic LPA is randomized — the deterministic tie-break makes the
fixed-round run engine-reproducible, so the oracle unrolls identical
rounds). Isolated nodes keep their own label.

Scale design (100 TB of edges): per round ONE shuffle — the
(dst, neighbor-label) aggregation with map-side combine — plus a per-node
argmax over that node's label histogram (window partitioned BY NODE:
partition size = the node's distinct neighbor-label count, never a
global sort). The edge list is materialized once; label frames are
|V|-sized. Same round discipline as pagerank/kcore: fixed iterations,
checkpoint per round to truncate lineage.

Numeric labels only (node ids): the argmax uses max(struct(cnt, -label))
so "count desc, label asc" is one aggregate, no window needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    rounds: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_symmetric: bool = False,
) -> DataFrame:
    """Run ``rounds`` synchronous LPA iterations over an undirected graph
    given as an edge list (symmetrized internally unless
    ``assume_symmetric``). Returns (node, label) after the final round.
    Labels must be numeric (node ids)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not assume_symmetric:
        e = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    e = e.localCheckpoint(eager=True)
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        hist = (
            e.join(labels.select(F.col("node").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # argmax by (count desc, label asc) as ONE aggregate:
        # max(struct(cnt, -label)).
        new = (
            hist.groupBy("node")
            .agg(F.max(F.struct(F.col("_c"), (-F.col("label")).alias("_nl"))).alias("_m"))
            .select("node", (-F.col("_m._nl")).alias("label"))
        )
        # isolated nodes (no in-edges in the symmetrized list cannot
        # happen for nodes drawn from src — every node has >=1 neighbor)
        labels = new.localCheckpoint(eager=True)
    return labels


def sql_label_propagation(edges_cte: str, rounds: int) -> str:
    """DuckDB unrolled mirror of :func:`label_propagation`;
    ``edges_cte`` must yield the SYMMETRIZED distinct (src, dst)."""
    parts = [
        f"e AS ({edges_cte})",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM e)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""l{i} AS (
  SELECT node, label FROM (
    SELECT e.dst AS node, p.label,
           ROW_NUMBER() OVER (PARTITION BY e.dst
                              ORDER BY COUNT(*) DESC, p.label ASC) AS rk
    FROM e JOIN l{i - 1} p ON e.src = p.node
    GROUP BY e.dst, p.label
  ) WHERE rk = 1
)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT node, label FROM l{rounds}"
    )
