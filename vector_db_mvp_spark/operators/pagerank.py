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
* The edge list is materialized ONCE (eager ``localCheckpoint``); callers
  that can guarantee distinct (src, dst) pairs pass
  ``assume_distinct=True`` and skip the edge-dedup shuffle entirely.
* The per-edge term rank(src)/out_deg(src) is constant across the edges of
  one source, so it is computed ONCE PER NODE in the |V|-sized share
  table (rank frame ⋈ degree frame, both |V|) — the edge scan only maps
  dst and the precomputed share. Rounding per node == rounding per edge,
  so oracle parity is untouched.
* Each round is one shuffle: the contribution aggregation on dst, with
  map-side partial agg collapsing the |E| contribution rows to at most
  |V| per task before the exchange. (Pre-partitioning the edge list by
  dst does NOT remove this exchange in practice: under AQE,
  localCheckpoint materializes via AdaptiveSparkPlanExec, whose output
  partitioning is not propagated into the checkpointed plan — measured,
  not assumed.)
* At |V| beyond broadcast reach the broadcast hint is replaced with a
  co-shuffle on src: ``broadcast_shares="auto"`` (the default) switches
  on a node-count threshold (``broadcast_max_nodes``, default 2M nodes ≈
  tens of MB of share rows); above it the share table is built with a
  shuffle-hash join and streamed into the edge scan keyed on src — no
  |V|-sized broadcast anywhere, so neither the driver nor the executors
  hold the full node set. Both paths are bit-identical (same expressions,
  same 12-decimal pins; pytest-pinned) and the plan pin asserts zero
  BroadcastExchange above the threshold.
* Lineage is truncated with ``localCheckpoint`` every few rounds (not
  every round — for the typical 3-5 fixed iterations the plan tree stays
  shallow and skipping per-round materialization is a measured win).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: "auto" switches to the co-shuffle share path above this many nodes.
BROADCAST_MAX_NODES = 2_000_000


def _resolve_broadcast(broadcast_shares, deg: DataFrame, max_nodes: int) -> bool:
    """Resolve the ``broadcast_shares`` knob to a concrete bool. "auto"
    counts the (already-checkpointed) degree frame — one control-plane
    int, no data movement beyond the agg that built it."""
    if broadcast_shares == "auto":
        return deg.count() <= max_nodes
    return bool(broadcast_shares)


def _edge_frame(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str | None,
    assume_distinct: bool,
) -> DataFrame:
    """Shared edge-list preparation for pagerank/personalized_pagerank:
    select/dedup, ONE eager materialization, and (weighted only) the
    entry guard.

    Materialize the (usually expensively-derived) edge list ONCE: every
    round joins against it, and without the barrier each round re-runs
    the whole upstream plan. Eager localCheckpoint, not cache — see
    operators/semdedup.py (CacheManager leak per invocation). SERIALIZED
    memory+disk: the edge list is corpus-sized, and default deserialized
    on-heap blocks are ~5x the serialized size — the sf10 probe OOM'd a
    48 GiB heap on exactly this pattern in bfs.py before its fix; the
    per-round deserialization cost is noise next to the join shuffle.

    Weighted dedup SUMS duplicate (src, dst) weights (multigraph merge);
    the guard (over the CHECKPOINTED frame — one bounded scan, no
    upstream replay) fails loudly on w <= 0 / fractional / >= 2^53
    instead of silently corrupting ranks (ADVICE r12)."""
    from pyspark import StorageLevel

    if weight_col is None:
        sel = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        if not assume_distinct:
            sel = sel.distinct()
    else:
        # NULL -> NaN BEFORE the multigraph sum: Spark's SUM skips NULLs,
        # so a mixed-NULL duplicate group would otherwise launder the bad
        # weight past the guard; NaN poisons the sum and the guard below
        # rejects it.
        w_raw = F.col(weight_col).cast("double")
        sel = edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.when(w_raw.isNull(), F.lit(float("nan")))
            .otherwise(w_raw)
            .alias("w"),
        )
        if not assume_distinct:
            sel = sel.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    e = sel.localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    if weight_col is not None:
        chk = e.agg(
            F.min("w").alias("mn"),
            F.max("w").alias("mx"),
            F.max((F.col("w") != F.floor("w")).cast("int")).alias("frac"),
            F.max(F.isnan("w").cast("int")).alias("nan"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        # NaN slips every range comparison (nan<=0 and nan>=2^53 are both
        # False, and Spark ranks NaN == floor(NaN)), so it is checked
        # explicitly before the range guards. NULL weights (failed cast /
        # missing weight) cannot reach this aggregate at all: BOTH select
        # paths above poison NULL -> NaN before any sum, so "NaN" here is
        # the single funnel for every bad-weight input (ADVICE r13: the
        # former separate isNull check was unreachable by construction).
        if chk["n"] and chk["nan"]:
            raise ValueError(
                "pagerank: weight_col contains NaN weights — either NaN "
                "input or NULLs (failed cast / missing weight), which are "
                "poisoned to NaN before the duplicate-edge sum; weights "
                "must be positive integral values"
            )
        if chk["mn"] is not None:
            if chk["frac"]:
                raise ValueError(
                    "pagerank: weight_col values must be integral "
                    "(fractional weights would truncate silently)"
                )
            if chk["mn"] <= 0:
                raise ValueError(
                    "pagerank: weight_col values must be > 0 "
                    f"(min weight {chk['mn']})"
                )
            if chk["mx"] >= float(1 << 53):
                raise ValueError(
                    "pagerank: weight_col values must be < 2^53 "
                    "(exact integer-in-double bound)"
                )
    return e


def _out_degrees(e: DataFrame, weighted: bool) -> DataFrame:
    """(node, out_deg) for every source node: edge count, or the exact
    weight sum (per-row DECIMAL(38,0) cast so the sum never overflows or
    float-folds) converted to double once at the end — both engines cast
    the same exact integer, so out_deg is bit-identical."""
    deg_agg = (
        F.sum(F.col("w").cast("decimal(38,0)")).cast("double")
        if weighted
        else F.count(F.lit(1)).cast("double")
    )
    return (
        e.groupBy("src")
        .agg(deg_agg.alias("out_deg"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=True)
    )


def _rank_rounds(
    e: DataFrame,
    deg: DataFrame,
    ranks: DataFrame,
    iters: int,
    restart: Column,
    damping: float,
    use_broadcast: bool,
    weighted: bool = False,
) -> DataFrame:
    """The shared per-round body of pagerank/personalized_pagerank: share
    table (rank/out_deg per source node) into the static edge scan, then
    the dst aggregation. ``use_broadcast`` picks the physical strategy
    for the two |V|-frame joins — broadcast (small graphs: zero per-round
    shuffles) or shuffle-hash co-shuffle on the join key (|V| beyond
    broadcast reach: shares shuffle on node/src, never materialize on one
    machine). Expressions are identical either way, so results are
    bit-identical (pytest-pinned in tests/test_pagerank.py).

    ``weighted``: ``e`` additionally carries an integral weight column
    ``w`` (validated by :func:`pagerank`'s entry guard: 0 < w < 2^53,
    integral) and ``deg.out_deg`` is the per-source WEIGHT sum; each
    edge's contribution is round(rank / out_w * w, 12) — the round
    happens AFTER the multiply so the pin keeps ~12 SIGNIFICANT digits
    at any weight scale (the contribution is <= rank <= 1 by
    construction). r12 rounded the per-source base BEFORE the multiply
    (round(rank/out_w, 12) x w), which underflows the absolute
    12-decimal pin when out_w is large — at w ~ 1e10 the share keeps
    ~2 significant digits and uniform weights no longer cancel
    (measured: 0.339 vs the exact 0.3333 on a 3-clique). The double
    expression rank/out_w*w is one fixed IEEE sequence, identical on
    both engines; the rounded terms still sum as exact
    DECIMAL(38,12)."""
    for i in range(iters):
        rank_deg = (
            ranks.join(F.broadcast(deg), "node")
            if use_broadcast
            else ranks.join(deg.hint("shuffle_hash"), "node")
        )
        base = (
            F.col("rank") / F.col("out_deg")
            if weighted
            else F.round(F.col("rank") / F.col("out_deg"), 12)
        )
        shares = rank_deg.select(
            F.col("node").alias("src"),
            (base if weighted else base.cast("decimal(38,12)"))
            .alias("_b" if weighted else "_c"),
        )
        joined = (
            e.join(F.broadcast(shares), "src")
            if use_broadcast
            else e.join(shares.hint("shuffle_hash"), "src")
        )
        if weighted:
            contrib = joined.select(
                F.col("dst").alias("node"),
                F.round(F.col("_b") * F.col("w"), 12)
                .cast("decimal(38,12)")
                .alias("_c"),
            )
        else:
            contrib = joined.select(F.col("dst").alias("node"), "_c")
        ranks = contrib.groupBy("node").agg(
            F.round(
                restart + F.lit(damping) * F.sum("_c").cast("double"), 12
            ).alias("rank")
        )
        # Truncate lineage periodically; for short fixed runs the nested
        # join-plan tree is shallow and materializing every round costs
        # more than it saves.
        if (i + 1) % 4 == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank(
    edges: DataFrame,
    iters: int,
    *,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_distinct: bool = False,
    broadcast_shares: bool | str = "auto",
    broadcast_max_nodes: int = BROADCAST_MAX_NODES,
    weight_col: str | None = None,
) -> DataFrame:
    """Run ``iters`` damped PageRank rounds over the (directed) edge list.
    Returns ``(node, rank)`` for every node that appears in ``edges``.
    Nodes must all have out-degree >= 1 (symmetrize the edge list first if
    needed — dangling-node redistribution is deliberately out of scope).
    Pass ``assume_distinct=True`` when the caller guarantees no duplicate
    (src, dst) pairs — it skips a full edge-list dedup shuffle.
    ``broadcast_shares``: True/False force the share-table strategy;
    "auto" (default) broadcasts only while |V| <= ``broadcast_max_nodes``
    and otherwise co-shuffles on src (module docstring).

    ``weight_col``: edge-weighted PageRank (the co-purchase recommender
    shape: mass flows in proportion to integral edge weight instead of
    uniformly). Out-degree becomes the per-source weight SUM; everything
    else — damping, round pinning, broadcast/co-shuffle contract — is
    identical, and ``weight_col=None`` leaves the unweighted plan
    byte-for-byte untouched. Weight contract (guarded at entry, the
    hits()/ktruss/logistic_newton discipline): weights must be POSITIVE
    INTEGRAL values < 2^53 — zero/negative weights would make mass flows
    degenerate, fractional weights would truncate, and above 2^53 the
    double weight column and an oracle's exact integer column can
    round-trip differently, so all three raise ``ValueError`` instead
    (r12 silently cast to long / DECIMAL(9,0); ADVICE r12). With
    ``assume_distinct=False``, duplicate (src, dst) pairs are collapsed
    by SUMMING their weights (parallel edges merge, the multigraph
    reading) — the unweighted path's plain dedup would otherwise keep
    two rows that differ only in w and double-count the edge
    (ADVICE r12)."""
    e = _edge_frame(edges, src_col, dst_col, weight_col, assume_distinct)
    # ONE aggregation yields both the node set and the out-degrees (every
    # node has out-degree >= 1 by contract, so the degree frame's key set
    # IS the node set — no separate distinct shuffle). Checkpointed: it is
    # re-read every round for the share table.
    deg = _out_degrees(e, weight_col is not None)
    n = deg.count()  # control plane: one int
    use_broadcast = (
        n <= broadcast_max_nodes
        if broadcast_shares == "auto"
        else bool(broadcast_shares)
    )

    base = F.lit((1.0 - damping) / n)
    ranks = deg.select("node", F.lit(1.0 / n).alias("rank"))
    # rank/out_deg is per-SOURCE-node constant: compute it on the
    # |V|-sized frames once per round and feed it into the static edge
    # scan — broadcast below the threshold (zero per-round shuffles),
    # shuffle-hash co-shuffle on src above it (_rank_rounds).
    return _rank_rounds(
        e, deg, ranks, iters, base, damping, use_broadcast,
        weighted=weight_col is not None,
    )


def triangle_participation(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_canonical: bool = False,
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list.

    Implementation is the degree-oriented wedge join (Suri &
    Vassilvitskii, WWW'11): orient each edge from its LOWER endpoint
    under the (degree, id) lexicographic total order, join oriented edges
    on their source to form wedges, and close each wedge against the
    oriented edge set. Orientation means each triangle is found exactly
    once, and — because every edge leaves its lower-degree endpoint —
    per-node wedge fan-out is bounded by ~O(√m) regardless of hub
    placement: a degree-N hub generates ZERO wedges (all its edges point
    at it), where orientation by bare node id would give a small-id hub
    its full deg² (see ``.claude/probe_r12_wedge_orient.py``).

    Returns (node, n_triangles) for every node in >=1 triangle. The
    triangle SET is orientation-invariant, so results are bit-identical
    to the id-oriented SQL mirror.

    ``assume_canonical``: the input is ALREADY the distinct id-canonical
    (u < v) edge set, materialized by the caller — skip the per-call
    dedup + checkpoint so callers that also need degrees (e.g. the
    clustering coefficient) pay the edge build ONCE, not once per
    consumer (measured 13x -> family-band decade multiple at sf10). The
    (degree, id) re-orientation still happens here: it is two |E|-keyed
    hash joins against the |V|-sized degree frame, linear work that buys
    the fan-out bound.
    """
    if assume_canonical:
        e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    else:
        e = (
            edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
            .filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    per_node = (
        _oriented_wedge_triangles(e)
        .select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


def _oriented_wedge_triangles(e: DataFrame) -> DataFrame:
    """Enumerate each triangle of the distinct undirected edge set ``e``
    (any consistent (u, v) form) exactly once as (x, y, z) ordered by the
    (degree, id) total order — the Suri-Vassilvitskii degree orientation.

    Plan: one map-side-combined degree groupBy over |E|, two hash joins
    to tag endpoints with their degree, a re-orientation select, then the
    wedge self-join on the oriented source and the closure join on the
    oriented (y, z) pair. Struct comparison gives the lexicographic
    (deg, id) order natively (no string concat, no precision games).
    """
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("_d"))
    )
    tagged = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("_d", "_du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("_d", "_dv"), "v")
    )
    ku = F.struct(F.col("_du").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("_dv").alias("d"), F.col("v").alias("n"))
    # orient from the (deg, id)-lower endpoint; carry the head's key so the
    # wedge pair (y, z) can be ordered without re-joining degrees
    o = tagged.select(
        F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(ku < kv, kv).otherwise(ku).alias("_tk"),
    ).localCheckpoint(eager=True)
    w1 = o.select(F.col("s").alias("x"), F.col("t").alias("y"), F.col("_tk").alias("_yk"))
    w2 = o.select(F.col("s").alias("x"), F.col("t").alias("z"), F.col("_tk").alias("_zk"))
    wedges = w1.join(w2, "x").filter(F.col("_yk") < F.col("_zk"))
    closure = o.select(F.col("s").alias("y"), F.col("t").alias("z"))
    return wedges.join(closure, ["y", "z"]).select("x", "y", "z")


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


def personalized_pagerank(
    edges: DataFrame,
    iters: int,
    seed_node: str,
    *,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_distinct: bool = False,
    broadcast_shares: bool | str = "auto",
    broadcast_max_nodes: int = BROADCAST_MAX_NODES,
    weight_col: str | None = None,
) -> DataFrame:
    """Personalized PageRank from one seed: the restart mass (1-d) returns
    to ``seed_node`` instead of spreading uniformly — the graph-proximity
    feature a recommendation pipeline computes per anchor entity ("parts
    relevant to THIS customer"). Identical physical shape to
    :func:`pagerank` (one |V|-share table + static edge scan per round,
    decimal-exact contribution sums, same 12-decimal pins), so the same
    unrolled-CTE oracle discipline applies (:func:`sql_personalized_pagerank`).
    Start vector = 1 at the seed, 0 elsewhere. Nodes whose round rank is
    identically zero still flow through the share table with share 0 —
    correctness over a sparse-frame micro-optimization; at 100 TB the
    frontier-sparse variant is a BFS-masked share join, same plan family.
    """
    e = _edge_frame(edges, src_col, dst_col, weight_col, assume_distinct)
    deg = _out_degrees(e, weight_col is not None)
    ranks = deg.select(
        "node",
        F.when(F.col("node") == seed_node, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("rank"),
    )
    restart = F.when(F.col("node") == seed_node, F.lit(1.0 - damping)).otherwise(
        F.lit(0.0)
    )
    use_broadcast = _resolve_broadcast(broadcast_shares, deg, broadcast_max_nodes)
    return _rank_rounds(
        e, deg, ranks, iters, restart, damping, use_broadcast,
        weighted=weight_col is not None,
    )


def sql_personalized_pagerank(
    edges_cte: str,
    iters: int,
    seed_node: str | None = None,
    *,
    damping: float = 0.85,
    weighted: bool = False,
    seed_sql: str | None = None,
) -> str:
    """DuckDB unrolled mirror of :func:`personalized_pagerank`.
    ``seed_node`` is injected as a SQL string literal (callers pass
    trusted fixed instances); numeric/derived seeds pass ``seed_sql``
    instead — a raw SQL scalar expression (e.g. ``(SELECT MIN(src) FROM
    e)``), compared unquoted. ``weighted``: the CTE additionally yields
    an integral ``w``; out-degree is the weight sum and each edge's
    contribution is ROUND(rank/out_w * w, 12) — the same
    round-after-multiply pin as :func:`sql_pagerank`."""
    if seed_sql is None:
        if seed_node is None:
            raise ValueError("sql_personalized_pagerank: need a seed")
        seed_sql = "'" + str(seed_node).replace("'", "''") + "'"
    deg_expr = (
        "CAST(SUM(w) AS DOUBLE)" if weighted else "CAST(COUNT(*) AS DOUBLE)"
    )
    c_expr = (
        "CAST(ROUND(r.rank / d.out_deg * e.w, 12) AS DECIMAL(38,12))"
        if weighted
        else "CAST(ROUND(r.rank / d.out_deg, 12) AS DECIMAL(38,12))"
    )
    parts = [
        f"e AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT src AS node FROM e)",
        f"deg AS (SELECT src, {deg_expr} AS out_deg FROM e GROUP BY 1)",
        f"r0 AS (SELECT node, CASE WHEN node = {seed_sql} THEN 1.0 ELSE 0.0"
        " END AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""r{i} AS (
  SELECT dst AS node,
         ROUND(CASE WHEN dst = {seed_sql} THEN {1.0 - damping} ELSE 0.0 END
               + {damping} * CAST(SUM(c) AS DOUBLE), 12) AS rank
  FROM (
    SELECT e.dst,
           {c_expr} AS c
    FROM e JOIN deg d ON e.src = d.src
           JOIN r{i - 1} r ON e.src = r.node
  )
  GROUP BY dst
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"


def sql_pagerank(
    edges_cte: str,
    iters: int,
    *,
    damping: float = 0.85,
    weighted: bool = False,
) -> str:
    """DuckDB unrolled mirror of :func:`pagerank`. ``edges_cte`` must be a
    SELECT yielding (src, dst) — plus an integral ``w`` when ``weighted``
    — already distinct + symmetrized."""
    deg_expr = (
        "CAST(SUM(w) AS DOUBLE)" if weighted else "CAST(COUNT(*) AS DOUBLE)"
    )
    # Weighted: round AFTER the multiply (r.rank / d.out_deg * e.w is the
    # same fixed IEEE sequence as the Spark plan) so the 12-decimal pin
    # keeps significant digits at any weight scale — see _rank_rounds.
    c_expr = (
        "CAST(ROUND(r.rank / d.out_deg * e.w, 12) AS DECIMAL(38,12))"
        if weighted
        else "CAST(ROUND(r.rank / d.out_deg, 12) AS DECIMAL(38,12))"
    )
    parts = [
        f"e AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT src AS node FROM e)",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        f"deg AS (SELECT src, {deg_expr} AS out_deg FROM e GROUP BY 1)",
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
           {c_expr} AS c
    FROM e JOIN deg d ON e.src = d.src
           JOIN r{i - 1} r ON e.src = r.node
  ) CROSS JOIN n
  GROUP BY dst
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"


def hits(
    edges: DataFrame,
    iters: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_distinct: bool = False,
    broadcast_shares: bool | str = "auto",
    broadcast_max_nodes: int = BROADCAST_MAX_NODES,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg '99) over a DIRECTED edge list:
    hub scores for sources, authority scores for destinations, L1
    normalization after each half-step (sum-to-one keeps every update a
    rational of exact decimal sums — the same cross-engine pinning
    discipline as :func:`pagerank`: per-edge terms rounded to 12 decimals
    and summed as decimal(38,12), divisions double-rounded to 12).

    Returns (node, role, score) with role ∈ {'hub', 'authority'} — every
    source node gets a hub row, every destination an authority row.

    Physical plan per round: two keyed aggregations (one shuffle each, on
    dst then src) over the static checkpointed edge scan, plus two 1-row
    norm aggregates broadcast back via crossJoin. The score-frame joins
    follow the ``broadcast_shares`` knob: broadcast below
    ``broadcast_max_nodes``, shuffle-hash co-shuffle above it (no
    |V|-sized broadcast at web scale) — same contract, same "auto"
    resolution as pagerank, both paths bit-identical.
    """
    if iters < 1:
        raise ValueError("hits: iters must be >= 1")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    e = e.localCheckpoint(eager=True)
    hub = e.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(1.0).alias("score")
    )
    use_broadcast = _resolve_broadcast(broadcast_shares, hub, broadcast_max_nodes)

    def _join(scores: DataFrame, key: str) -> DataFrame:
        s = scores.select(F.col("node").alias(key), "score")
        return (
            e.join(F.broadcast(s), key)
            if use_broadcast
            else e.join(s.hint("shuffle_hash"), key)
        )

    def _half_step(scores: DataFrame, from_key: str, to_key: str) -> DataFrame:
        raw = (
            _join(scores, from_key)
            .select(
                F.col(to_key).alias("node"),
                F.round("score", 12).cast("decimal(38,12)").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
            .localCheckpoint(eager=True)  # consumed by the norm agg AND the division
        )
        tot = raw.agg(F.sum("_s").alias("_tot"))
        return raw.crossJoin(F.broadcast(tot)).select(
            "node",
            F.round(
                F.col("_s").cast("double") / F.col("_tot").cast("double"), 12
            ).alias("score"),
        )

    auth = None
    for _ in range(iters):
        auth = _half_step(hub, "src", "dst")
        hub = _half_step(auth, "dst", "src")
    return hub.select("node", F.lit("hub").alias("role"), "score").unionAll(
        auth.select("node", F.lit("authority").alias("role"), "score")
    )


def sql_hits(edges_cte: str, iters: int) -> str:
    """DuckDB unrolled mirror of :func:`hits`. ``edges_cte`` must yield a
    distinct directed (src, dst)."""
    parts = [
        f"e AS ({edges_cte})",
        "h0 AS (SELECT DISTINCT src AS node, 1.0 AS score FROM e)",
    ]
    for i in range(1, iters + 1):
        for raw, cur, prev, jk, gk in (
            (f"a{i}_raw", f"a{i}", f"h{i - 1}", "src", "dst"),
            (f"h{i}_raw", f"h{i}", f"a{i}", "dst", "src"),
        ):
            parts.append(
                f"""{raw} AS (
  SELECT e.{gk} AS node,
         SUM(CAST(ROUND(p.score, 12) AS DECIMAL(38,12))) AS s
  FROM e JOIN {prev} p ON e.{jk} = p.node
  GROUP BY 1
)"""
            )
            parts.append(
                f"""{cur} AS (
  SELECT node,
         ROUND(CAST(s AS DOUBLE)
               / CAST((SELECT SUM(s) FROM {raw}) AS DOUBLE), 12) AS score
  FROM {raw}
)"""
            )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node, 'hub' AS role, score FROM h{iters}
UNION ALL
SELECT node, 'authority' AS role, score FROM a{iters}"""
    )
