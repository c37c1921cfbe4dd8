"""k-truss decomposition by synchronous support peeling: repeatedly
delete every edge whose CURRENT triangle support is < k−2; the surviving
subgraph (once converged) is the k-truss — the edge-cohesion refinement
of the k-core (every truss edge sits in ≥ k−2 triangles among survivors,
so trusses are denser and more community-like than cores; Cohen 2008).

Spark realization: the kcore.py fixed-round discipline applied to EDGES.
Each round: one oriented wedge enumeration over the shrinking canonical
edge set (the Suri-Vassilvitskii degree-oriented join — each triangle
found once), an explode of each triangle into its three edges, a
per-edge support count, and a semi-join filter; serialized
localCheckpoint per round so round r never replays rounds 0..r−1.
Synchronous peeling is deterministic, so the SQL oracle unrolls
identical rounds AS MATERIALIZED (DuckDB re-evaluates plain CTE chains
referenced downstream — the BPE-oracle lesson). Convergence early-exit:
a round that removes nothing is a fixed point; stopping is bit-identical
to running the remaining identity rounds, so fixed-round oracle parity
holds (the kcore.py argument verbatim).

Scale: per round the wedge join is fan-out-bounded by ordered out-degree
over a monotonically SHRINKING edge set — strictly cheaper each round;
support counting is one map-side-combined groupBy on the edge key. At
100 TB the loop runs with edges partitioned on the wedge key, same as
the one-shot triangle count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bfs import _EDGE_LEVEL


def _canonical(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    return (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )


def _edge_support(e: DataFrame) -> DataFrame:
    """(u, v, support) for every canonical edge in ≥1 triangle.

    Triangle enumeration is the shared (degree, id)-oriented wedge join
    (pagerank._oriented_wedge_triangles) over the CURRENT survivor set —
    degrees are recomputed each peel round, so the fan-out bound tracks
    the shrinking graph. Triangles come back ordered by (deg, id), not
    node id, so each of the three edges is re-canonicalized to (least,
    greatest) by id to match the ``alive`` keys and the SQL oracle.
    """
    from .pagerank import _oriented_wedge_triangles

    tri = _oriented_wedge_triangles(e)

    def _edge(a: str, b: str):
        return F.struct(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )

    tri_edges = tri.select(
        F.explode(
            F.array(_edge("x", "y"), _edge("x", "z"), _edge("y", "z"))
        ).alias("_e")
    ).select("_e.u", "_e.v")
    return tri_edges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )


def ktruss_edges(
    edges: DataFrame,
    k: int,
    rounds: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Surviving canonical (u, v) edges after ``rounds`` synchronous
    support peels at threshold ``k`` (each round keeps edges with
    support ≥ k−2 among CURRENT survivors). Input may be any directed/
    duplicated edge list — canonicalized internally. Callers wanting the
    TRUE k-truss assert convergence with one extra no-op round (the
    kcore.py contract)."""
    if k < 3 or rounds < 1:
        raise ValueError("ktruss_edges: k must be >= 3 and rounds >= 1")
    alive = _canonical(edges, src_col, dst_col).localCheckpoint(
        eager=True, storageLevel=_EDGE_LEVEL
    )
    n_alive = alive.count()
    for _ in range(rounds):
        if n_alive == 0:
            break
        sup = _edge_support(alive)
        nxt = (
            alive.join(
                sup.filter(F.col("support") >= k - 2), ["u", "v"], "left_semi"
            )
            .localCheckpoint(eager=True, storageLevel=_EDGE_LEVEL)
        )
        n_next = nxt.count()
        alive = nxt
        if n_next == n_alive:
            break  # fixed point: every further round is the identity
        n_alive = n_next
    return alive


def sql_ktruss_edges(edges_cte: str, k: int, rounds: int) -> str:
    """DuckDB unrolled mirror of :func:`ktruss_edges`; ``edges_cte`` must
    yield (src, dst) in any orientation."""
    parts = [
        f"raw AS ({edges_cte})",
        """e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src <> dst
)""",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support FROM (
    SELECT x AS u, y AS v FROM (
      SELECT w1.u AS x, w1.v AS y, w2.v AS z
      FROM e{p} w1 JOIN e{p} w2 ON w1.u = w2.u AND w1.v < w2.v
      JOIN e{p} c ON c.u = w1.v AND c.v = w2.v)
    UNION ALL
    SELECT x, z FROM (
      SELECT w1.u AS x, w1.v AS y, w2.v AS z
      FROM e{p} w1 JOIN e{p} w2 ON w1.u = w2.u AND w1.v < w2.v
      JOIN e{p} c ON c.u = w1.v AND c.v = w2.v)
    UNION ALL
    SELECT y, z FROM (
      SELECT w1.u AS x, w1.v AS y, w2.v AS z
      FROM e{p} w1 JOIN e{p} w2 ON w1.u = w2.u AND w1.v < w2.v
      JOIN e{p} c ON c.u = w1.v AND c.v = w2.v)
  ) GROUP BY 1, 2
)""",
        )
        parts.append(
            f"""e{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{p} e
  JOIN s{i} s ON e.u = s.u AND e.v = s.v AND s.support >= {k - 2}
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT u, v FROM e{rounds}"
