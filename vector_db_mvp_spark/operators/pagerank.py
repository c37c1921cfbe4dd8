"""Fixed-iteration PageRank as a pure DataFrame program, exactly
reproducible in SQL (unrolled CTEs) — the iterative-graph companion to
operators/cluster.py's connected components.

Semantics: classic damped PageRank over a symmetrized edge list,
``rank' = (1-d)/N + d * Σ_in rank/out_degree``, run for a fixed number of
rounds from a uniform start. All floating steps are pinned for cross-engine
bit-parity: per-edge contributions are rounded to 12 decimals and summed as
decimal(38,12) (order-independent), the damped update is a fixed-order
double expression rounded to 12.

Scale design (100 TB of edges):
* The edge list is built once; out-degrees are one map-side-combined
  aggregation broadcast-joined back (degree table is |V|-sized; for huge V
  it becomes a shuffle join keyed on src — both sides already partitioned
  by src from the distinct()).
* Each round is exactly one shuffle: contributions aggregate on dst with
  partial aggregation; the rank frame re-partitions on the same key, so
  successive rounds reuse the exchange layout.
* Ranks are ``localCheckpoint``-ed each round — constant-depth lineage, the
  same escape hatch operators/cluster.py uses for label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int,
    *,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Run ``iters`` damped PageRank rounds over the (directed) edge list.
    Returns ``(node, rank)`` for every node that appears in ``edges``.
    Nodes must all have out-degree >= 1 (symmetrize the edge list first if
    needed — dangling-node redistribution is deliberately out of scope)."""
    # Materialize the (usually expensively-derived) edge list ONCE: every
    # round joins against it, and without the barrier each round re-runs
    # the whole upstream plan (e.g. the fact-table join that produced the
    # edges). Eager localCheckpoint, not cache — see operators/semdedup.py
    # (CacheManager leak per invocation).
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("src").alias("node")).distinct()
    n = nodes.count()  # control plane: one int
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("double").alias("out_deg"))
        .localCheckpoint(eager=True)
    )

    base = F.lit((1.0 - damping) / n)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        # deg and ranks are |V|-sized — broadcast them so the (much larger)
        # edge list never shuffles inside a round; the round's one exchange
        # is the contribution aggregation on dst. (At |V| beyond broadcast
        # reach, drop the hints: both sides then co-shuffle on src.)
        contrib = (
            e.join(F.broadcast(deg), "src")
            .join(F.broadcast(ranks.withColumnRenamed("node", "src")), "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("out_deg"), 12)
                .cast("decimal(38,12)")
                .alias("_c"),
            )
        )
        ranks = (
            contrib.groupBy("node")
            .agg(
                F.round(
                    base + F.lit(damping) * F.sum("_c").cast("double"), 12
                ).alias("rank")
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_participation(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list.

    Implementation is the degree-oriented wedge join: orient each edge from
    the lower to the higher endpoint (here by node id — a deterministic
    total order), join oriented edges on their source to form wedges
    (u<v, u<w, v<w by construction when both edges leave u and v<w), and
    close each wedge against the oriented edge set. Orientation means each
    triangle is found exactly once and the wedge join fans out on
    out-degree under the total order, not raw degree — the standard
    shuffle-bounding trick (Suri & Vassilvitskii, WWW'11).

    Returns (node, n_triangles) for every node in >=1 triangle.
    """
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    w1 = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    w2 = e.select(F.col("u").alias("x"), F.col("v").alias("z"))
    wedges = w1.join(w2, "x").filter(F.col("y") < F.col("z"))
    tri = wedges.join(
        e,
        (wedges.y == e.u) & (wedges.z == e.v),
    ).select("x", "y", "z")
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


def sql_triangle_participation(edges_cte: str) -> str:
    """DuckDB mirror of :func:`triangle_participation`; ``edges_cte`` must
    yield (src, dst)."""
    return f"""
WITH raw AS ({edges_cte}),
e AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src <> dst
),
tri AS (
  SELECT w1.u AS x, w1.v AS y, w2.v AS z
  FROM e w1
  JOIN e w2 ON w1.u = w2.u AND w1.v < w2.v
  JOIN e c ON c.u = w1.v AND c.v = w2.v
)
SELECT node, COUNT(*) AS n_triangles
FROM (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
GROUP BY 1
"""


def sql_pagerank(
    edges_cte: str,
    iters: int,
    *,
    damping: float = 0.85,
) -> str:
    """DuckDB unrolled mirror of :func:`pagerank`. ``edges_cte`` must be a
    SELECT yielding (src, dst), already distinct + symmetrized."""
    parts = [
        f"e AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT src AS node FROM e)",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS out_deg FROM e GROUP BY 1)",
        "r0 AS (SELECT node, 1.0 / n.n AS rank FROM nodes CROSS JOIN n)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""r{i} AS (
  SELECT dst AS node,
         ROUND((1.0 - {damping}) / ANY_VALUE(n.n)
               + {damping} * CAST(SUM(c) AS DOUBLE), 12) AS rank
  FROM (
    SELECT e.dst,
           CAST(ROUND(r.rank / d.out_deg, 12) AS DECIMAL(38,12)) AS c
    FROM e JOIN deg d ON e.src = d.src
           JOIN r{i - 1} r ON e.src = r.node
  ) CROSS JOIN n
  GROUP BY dst
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"
