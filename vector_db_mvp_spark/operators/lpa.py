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
    max_degree: int | None = None,
) -> DataFrame:
    """Run ``rounds`` synchronous LPA iterations over an undirected graph
    given as an edge list (symmetrized internally unless
    ``assume_symmetric``). Returns (node, label) after the final round.
    Labels must be numeric (node ids).

    ``max_degree``: the family skew knob (substring max_postings /
    Adamic-Adar hub-cap pattern). The per-round neighbor join hashes on
    ``src`` — a degree-D super-hub makes one D-row hot key EVERY round.
    With the cap set, hubs propagate their label through a deterministic
    sample of ``max_degree`` out-edges (smallest portable 60-bit hash
    h64("src,dst"), then dst — engine-reproducible, no RNG, and
    DuckDB-replayable so capped instances keep exact oracles); their own
    label update still sees the FULL in-neighborhood (the dst-side
    histogram is a map-side-combined aggregate, skew-safe without help).
    Sampling super-hub adjacency is standard web-scale LPA practice;
    results are exact when the cap doesn't bind (pytest pin) and
    approximate when it does. One-time build cost: TWO-PHASE (r12
    verdict finding #3 — the r12 row_number window materialized a
    super-hub's FULL edge list in one task before cutting it, an
    O(degree) hot task inside the knob built to bound hub cost). Phase 1
    hash-threshold pre-prunes each hub's edges to an expected
    ``8 x max_degree`` survivors (keep ``_h < ceil(2^60 * 8 *
    max_degree / degree)``; h64 is uniform on [0, 2^60)), so the
    row_number window runs over O(max_degree) rows per hub, never
    O(degree). Phase 2 is the exact trim. The sample is PROVABLY
    bit-identical to the one-phase form: every pruned-out edge has
    ``_h >= threshold``, strictly above every survivor, so when a hub
    keeps >= max_degree survivors the max_degree smallest by (_h, dst)
    are all survivors; any hub left short (vanishing probability,
    Chernoff at 8x oversampling) falls back to its full edge list —
    a deterministic safety net, not a probabilistic one. Non-hub edges
    pass through an anti-join untouched either way.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not assume_symmetric:
        e = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    e = e.localCheckpoint(eager=True)
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError("label_propagation: max_degree must be >= 1")
        from pyspark.sql import Window

        from ..functions.text import h64

        hubs = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") > max_degree)
        )
        normal = e.join(hubs.select("src"), "src", "left_anti")
        # Phase 1: per-hub hash-threshold pre-prune. The threshold aims at
        # 8 x max_degree expected survivors; ceil keeps it >= 1 so no hub
        # is pruned to zero by rounding. Strict `<` means every survivor
        # sorts before every pruned edge — the exactness argument in the
        # docstring.
        hub_e = (
            e.join(hubs, "src")
            .withColumn(
                "_h",
                h64(
                    F.concat_ws(
                        ",",
                        F.col("src").cast("string"),
                        F.col("dst").cast("string"),
                    )
                ),
            )
            .withColumn(
                "_thr",
                F.least(
                    F.lit(float(1 << 60)),
                    F.ceil(
                        F.lit(float(1 << 60) * 8.0 * max_degree)
                        / F.col("_d")
                    ).cast("double"),
                ),
            )
        )
        pruned = hub_e.filter(F.col("_h") < F.col("_thr")).drop("_thr", "_d")
        # Safety net: any hub whose survivor count fell below the cap
        # (astronomically unlikely at 8x oversampling, but the sample
        # contract is deterministic, not probabilistic) re-takes its
        # FULL edge list for the exact trim.
        short = hubs.select("src").join(
            pruned.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_k"))
            .filter(F.col("_k") >= max_degree)
            .select("src"),
            "src",
            "left_anti",
        )
        cand = pruned.join(short, "src", "left_anti").unionAll(
            hub_e.drop("_thr", "_d").join(short, "src", "left_semi")
        )
        # Phase 2: exact trim — O(max_degree)-sized partitions per hub.
        w = Window.partitionBy("src").orderBy(F.col("_h"), F.col("dst"))
        sampled = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_degree)
            .drop("_rn", "_h")
        )
        e = normal.unionAll(sampled).localCheckpoint(eager=True)
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


def sql_capped_edges(edges_cte: str, max_degree: int) -> str:
    """DuckDB mirror of the ``max_degree`` hub sampling: ``edges_cte``
    must yield the SYMMETRIZED distinct (src, dst); returns a query for
    the sampled edge set — non-hub edges untouched, hub edges kept in
    (h64("src,dst"), dst) order up to the cap, exactly the Spark
    window's order (functions/text.py h64 is bit-identical on both
    engines). A first-class builder, not string surgery (the
    sql_adamic_adar max_center_degree lesson)."""
    from ..functions.text import sql_h64

    key = sql_h64("CAST(s.src AS VARCHAR) || ',' || CAST(s.dst AS VARCHAR)")
    return f"""
WITH symcap AS ({edges_cte}),
degcap AS (SELECT src, COUNT(*) AS _d FROM symcap GROUP BY 1),
rkcap AS (
  SELECT s.src, s.dst, d._d,
         ROW_NUMBER() OVER (PARTITION BY s.src ORDER BY {key}, s.dst) AS _rn
  FROM symcap s JOIN degcap d ON s.src = d.src)
SELECT src, dst FROM rkcap
WHERE _d <= {int(max_degree)} OR _rn <= {int(max_degree)}
"""


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
