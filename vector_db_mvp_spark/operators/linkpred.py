"""Neighborhood-structure graph operators: local clustering coefficient
and Adamic-Adar link prediction — the per-node / per-pair companions to
the whole-graph statistics already in the family (triangles, k-core,
assortativity, PageRank).

Reference parity: the reference engine exposes only similarity search over
embeddings (app/services/*), but a training-data curation pipeline needs
graph-native recommendation features too; both operators here follow the
house graph discipline established in operators/pagerank.py.

Scale design (100 TB of edges):
* Both operators are WEDGE-BOUNDED, never all-pairs: the clustering
  coefficient reuses the degree-oriented triangle join (each triangle
  found once, fan-out bounded by ordered out-degree — Suri &
  Vassilvitskii, WWW'11); Adamic-Adar enumerates wedges through each
  center z, so total work is Σ_z deg(z)² — the standard hub-bounded
  shape. For web-scale hubs the production knob is ``max_center_degree``
  (drop centers whose degree exceeds the cap: a hub's AA contribution
  1/ln(deg) is already near-zero, so the cap is both a skew guard and an
  accuracy-preserving prune). The registered gate instance runs uncapped
  so the DuckDB oracle stays exact — same pattern as the substring
  family's max_postings cap.
* Float discipline matches pagerank.py: per-center terms are rounded to
  12 decimals and summed as decimal(38,12) (order-independent across
  engines and partitionings); only the final projection casts to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import triangle_participation


def _oriented_distinct(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Distinct (u, v) with u < v — the canonical undirected edge set."""
    return (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )


def degrees(edges: DataFrame, *, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """(node, deg) over the undirected distinct edge set."""
    e = _oriented_distinct(edges, src_col, dst_col)
    return (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )


def clustering_coefficient(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Local clustering coefficient per node: 2·T(v) / (deg(v)·(deg(v)−1))
    for deg ≥ 2, where T(v) is the node's triangle participation. Nodes
    in no triangle get coefficient 0 (they still appear when deg ≥ 2).

    Returns (node, deg, n_triangles, coeff) — coeff rounded to 6 decimals
    (the numerator/denominator are exact integers on both engines, so the
    only float step is one division).

    Physical plan: the canonical edge set is built and checkpointed ONCE
    and feeds both consumers (degree groupBy + wedge join) — without the
    shared build the upstream edge derivation (often a corpus-sized
    self-join) executes twice and dominates at scale (measured at sf10).
    The triangle side is the degree-oriented wedge join (one |E|-keyed
    shuffle, fan-out bounded by ordered out-degree); the degree side is
    one map-side-combined groupBy; the final join is |V|-sized on both
    inputs.
    """
    e = _oriented_distinct(edges, src_col, dst_col).localCheckpoint(eager=True)
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .filter(F.col("deg") >= 2)
    )
    tri = triangle_participation(
        e, src_col="u", dst_col="v", assume_canonical=True
    )
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                2.0
                * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                / (F.col("deg").cast("double") * (F.col("deg").cast("double") - 1.0)),
                6,
            ).alias("coeff"),
        )
    )


def sql_clustering_coefficient(edges_cte: str) -> str:
    """DuckDB mirror of :func:`clustering_coefficient`; ``edges_cte`` must
    yield (src, dst)."""
    return f"""
WITH raw AS ({edges_cte}),
e AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src <> dst
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY 1 HAVING COUNT(*) >= 2
),
tri AS (
  SELECT w1.u AS x, w1.v AS y, w2.v AS z
  FROM e w1
  JOIN e w2 ON w1.u = w2.u AND w1.v < w2.v
  JOIN e c ON c.u = w1.v AND c.v = w2.v
),
pt AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  )
  GROUP BY 1
)
SELECT deg.node, deg.deg,
       CAST(COALESCE(pt.n_triangles, 0) AS BIGINT) AS n_triangles,
       round(2.0 * CAST(COALESCE(pt.n_triangles, 0) AS DOUBLE)
             / (CAST(deg.deg AS DOUBLE) * (CAST(deg.deg AS DOUBLE) - 1.0)),
             6) AS coeff
FROM deg LEFT JOIN pt ON deg.node = pt.node
"""


def adamic_adar(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_center_degree: int | None = None,
) -> DataFrame:
    """Adamic-Adar link-prediction scores for NON-adjacent node pairs:
    score(a, b) = Σ_{z ∈ N(a) ∩ N(b)} 1 / ln(deg(z)).

    Returns (a, b, n_common, score) with a < b, one row per candidate
    pair that shares ≥ 1 common neighbor and is NOT an existing edge.
    ``score`` is rounded to 6 decimals; internally each center's term is
    rounded to 12 decimals and summed as decimal(38,12) so partial-agg
    order cannot perturb the result across engines.

    ``max_center_degree`` (production skew knob, see module docstring)
    drops wedge CENTERS above the cap before the self-join — the gate
    instance runs uncapped so the oracle is exact.

    Physical plan: adjacency (z → nbr) is the symmetrized edge set; the
    wedge self-join is keyed on z (one shuffle, quadratic only within a
    neighborhood); the existing-edge exclusion is a left-anti join on the
    oriented pair; deg(z) rides along from one |V|-sized aggregate.
    """
    e = _oriented_distinct(edges, src_col, dst_col).localCheckpoint(eager=True)
    adj = e.select(F.col("u").alias("z"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("z"), F.col("u").alias("nbr"))
    )
    # deg >= 2: a degree-1 node cannot center a wedge, and ln(1) = 0 would
    # blow up the term under ANSI division anyway.
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("deg")).filter(
        F.col("deg") >= 2
    )
    if max_center_degree is not None:
        deg = deg.filter(F.col("deg") <= max_center_degree)
    # Per-center AA term, pinned to 12 decimals before the exact sum.
    centers = deg.select(
        "z", F.round(1.0 / F.log(F.col("deg").cast("double")), 12).cast("decimal(38,12)").alias("_t")
    )
    a1 = adj.select("z", F.col("nbr").alias("a"))
    a2 = adj.select("z", F.col("nbr").alias("b"))
    wedges = (
        a1.join(a2, "z")
        .filter(F.col("a") < F.col("b"))
        .join(centers, "z")
    )
    scored = (
        wedges.groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("_t").alias("_s"),
        )
        .join(
            e,
            (F.col("a") == F.col("u")) & (F.col("b") == F.col("v")),
            "left_anti",
        )
    )
    return scored.select(
        "a", "b", "n_common", F.round(F.col("_s").cast("double"), 6).alias("score")
    )


def sql_adamic_adar(
    edges_cte: str, *, max_center_degree: int | None = None
) -> str:
    """DuckDB mirror of :func:`adamic_adar`; ``edges_cte`` must yield
    (src, dst). ``max_center_degree`` mirrors the Spark hub cap: centers
    with degree above it are dropped from wedge generation."""
    cap = (
        f" AND COUNT(*) <= {int(max_center_degree)}"
        if max_center_degree is not None
        else ""
    )
    return f"""
WITH raw AS ({edges_cte}),
e AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src <> dst
),
adj AS (
  SELECT u AS z, v AS nbr FROM e
  UNION ALL
  SELECT v AS z, u AS nbr FROM e
),
centers AS (
  SELECT z,
         CAST(round(1.0 / ln(CAST(COUNT(*) AS DOUBLE)), 12) AS DECIMAL(38,12)) AS t
  FROM adj GROUP BY 1 HAVING COUNT(*) >= 2{cap}
),
wedges AS (
  SELECT a1.nbr AS a, a2.nbr AS b, c.t
  FROM adj a1
  JOIN adj a2 ON a1.z = a2.z AND a1.nbr < a2.nbr
  JOIN centers c ON c.z = a1.z
),
scored AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_common, SUM(t) AS s
  FROM wedges GROUP BY 1, 2
)
SELECT a, b, n_common, round(CAST(s AS DOUBLE), 6) AS score
FROM scored
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = scored.a AND e.v = scored.b)
"""
