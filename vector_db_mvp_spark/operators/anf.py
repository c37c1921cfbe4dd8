"""Approximate Neighborhood Function (ANF / HyperANF): per-round
HLL-sketched ball sizes |B(v, t)| and the graph-wide neighborhood
function N(t) = Σ_v |B(v, t)| — the effective-diameter / reachability
profile instrument (Palmer et al. KDD'02; Boldi, Rosa & Vigna WWW'11)
beside the exact BFS family (operators/bfs.py).

Why sketches: the exact N(t) needs per-node reachability sets (O(|V|²)
state); ANF keeps ONE bounded HLL register array per node, and a round
is a single edge join + per-register max — the canonical 100 TB shape:

    sketch_{t}(v) = merge( sketch_{t-1}(v), ⋃_{(u,v)∈E} sketch_{t-1}(u) )

State representation is SPARSE (node, reg, rho) rows — at most
min(|B(v,t)|, 256) rows per node, so early rounds carry far less than
the dense 256-register array; per round: one join keyed on src, one
(node, reg) aggregation with map-side partial max. No windows, no skew
sensitivity (registers are md5-uniform).

Determinism contract: identical md5-derived registers on both engines
and the integer-scaled estimator of operators/hll.py (every 2^(53-rho)
term an exact BIGINT; one floor'd double division per node) — so the
summed N(t) is engine-exact and the oracle replays the rounds as
unrolled CTEs (:func:`sql_anf_rounds`).

Reference parity: the reference exposes corpus-level stats only
(app/routers/stats.py); graph reachability profiles are part of the
north-star pipeline surface, not the reference's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hll import M, TWO53, _ALPHA


def node_sketch(nodes: DataFrame, node_col: str = "node") -> DataFrame:
    """Round-0 sparse sketch rows: each node's own hash — identical
    register derivation to operators/hll.py hll_state_rows."""
    h = nodes.select(
        F.col(node_col).alias("node"),
        F.md5(F.col(node_col).cast("string")).alias("h"),
    )
    v52 = F.conv(F.substring("h", 3, 13), 16, 10).cast("long")
    rho = F.when(v52 == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.conv(F.substring("h", 3, 13), 16, 2))
    )
    return h.select(
        "node",
        F.conv(F.substring("h", 1, 2), 16, 10).cast("int").alias("reg"),
        rho.cast("int").alias("rho"),
    )


def _estimate_sum(state: DataFrame) -> DataFrame:
    """Σ_v |B(v)|-estimate as one row (n_nodes, sum_ball_est).

    Ball sizes live exactly in raw-HLL's weak regime (≪ 2.5m), so unlike
    hll.py's corpus-cardinality instrument this applies the standard
    small-range LinearCounting correction (Flajolet et al. §4): when the
    raw estimate ≤ 2.5m and empty registers remain, est = m·ln(m/V).
    Determinism: the corrected value is rounded to 6 decimals per node
    and summed as exact decimal(38,6) (ln of the exact double m/V is
    engine-identical; the ROUND-then-decimal-sum kills partition-order
    drift — never a float fold, and no floor() sitting on an ln
    boundary)."""
    from .hll import hll_estimate_from_state

    est = hll_estimate_from_state(state, "node")
    v_empty = F.lit(M) - F.col("registers_hit")
    corrected = F.when(
        (v_empty > 0) & (F.col("distinct_estimate") <= F.lit(int(2.5 * M))),
        F.round(
            F.lit(float(M)) * F.log(F.lit(float(M)) / v_empty.cast("double")), 6
        ),
    ).otherwise(F.col("distinct_estimate").cast("double"))
    return est.select(corrected.cast("decimal(38,6)").alias("_e")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("_e").cast("decimal(38,6)").alias("sum_ball_est"),
    )


def anf_rounds(
    edges: DataFrame,
    rounds: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_distinct: bool = False,
) -> DataFrame:
    """Run ``rounds`` ANF iterations over a DIRECTED edge list (callers
    symmetrize for undirected semantics). Returns one row per round t =
    0..rounds: (t, n_nodes, sum_ball_est, avg_ball) where sum_ball_est =
    Σ_v |B(v, t)|-estimate — the neighborhood function N(t); the
    effective diameter is the first t with N(t) ≥ 0.9·N(t_max)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = node_sketch(nodes).localCheckpoint(eager=True)
    out = [
        _estimate_sum(state).select(
            F.lit(0).cast("int").alias("t"), "n_nodes", "sum_ball_est"
        )
    ]
    for t in range(1, rounds + 1):
        nbr = e.join(
            state.select(F.col("node").alias("src"), "reg", "rho"), "src"
        ).select(F.col("dst").alias("node"), "reg", "rho")
        state = (
            state.unionAll(nbr)
            .groupBy("node", "reg")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True)  # round barrier: next round + estimate
        )
        out.append(
            _estimate_sum(state).select(
                F.lit(t).cast("int").alias("t"), "n_nodes", "sum_ball_est"
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionAll(df)
    return res.select(
        "t",
        "n_nodes",
        F.round(F.col("sum_ball_est").cast("double"), 6).alias("sum_ball_est"),
        F.round(
            F.col("sum_ball_est").cast("double") / F.col("n_nodes").cast("double"),
            6,
        ).alias("avg_ball"),
    ).orderBy("t")


def sql_anf_rounds(edges_cte: str, rounds: int) -> str:
    """DuckDB unrolled mirror of :func:`anf_rounds`; ``edges_cte`` must
    yield a distinct directed (src, dst)."""
    est = """
  SELECT {t} AS t,
         CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(e) AS DECIMAL(38,6)) AS sum_ball_est
  FROM (
    SELECT node,
           CASE WHEN ({m} - hit) > 0 AND raw <= {smallmax}
                THEN CAST(round({m}.0 * ln({m}.0 / CAST({m} - hit AS DOUBLE)),
                          6) AS DECIMAL(38,6))
                ELSE CAST(raw AS DECIMAL(38,6)) END AS e
    FROM (
      SELECT node, COUNT(*) AS hit,
             CAST(FLOOR(CAST({alpha!r} AS DOUBLE) * 65536.0 * {two53} /
                  CAST(({m} - COUNT(*)) * CAST({two53_i} AS HUGEINT)
                       + SUM(CAST(1 AS HUGEINT) << (53 - rho)) AS DOUBLE))
                  AS BIGINT) AS raw
      FROM s{t} GROUP BY node
    )
  )"""
    parts = [
        f"e AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        """s0 AS (
  SELECT node,
         CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 2)) AS INTEGER) AS reg,
         CASE WHEN CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 3, 13)) AS BIGINT) = 0
              THEN 53
              ELSE 53 - length(format('{:b}',
                   CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 3, 13)) AS BIGINT)))
         END AS rho
  FROM nodes
)""",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""s{t} AS (
  SELECT node, reg, MAX(rho) AS rho FROM (
    SELECT node, reg, rho FROM s{t - 1}
    UNION ALL
    SELECT e.dst AS node, p.reg, p.rho
    FROM e JOIN s{t - 1} p ON e.src = p.node
  ) GROUP BY 1, 2
)"""
        )
    selects = [
        est.format(
            t=t,
            alpha=_ALPHA,
            two53=float(TWO53),
            two53_i=TWO53,
            m=M,
            smallmax=int(2.5 * M),
        )
        for t in range(rounds + 1)
    ]
    body = "\nUNION ALL\n".join(f"({s})" for s in selects)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT t, n_nodes,
       round(CAST(sum_ball_est AS DOUBLE), 6) AS sum_ball_est,
       round(CAST(sum_ball_est AS DOUBLE) / CAST(n_nodes AS DOUBLE), 6)
         AS avg_ball
FROM ({body})
ORDER BY t
"""
    )


def _per_node_estimate(state: DataFrame) -> DataFrame:
    """(node, est) — the LinearCounting-corrected ball-size estimate as
    decimal(38,6), the per-node form of :func:`_estimate_sum`'s body."""
    from .hll import hll_estimate_from_state

    est = hll_estimate_from_state(state, "node")
    v_empty = F.lit(M) - F.col("registers_hit")
    corrected = F.when(
        (v_empty > 0) & (F.col("distinct_estimate") <= F.lit(int(2.5 * M))),
        F.round(
            F.lit(float(M)) * F.log(F.lit(float(M)) / v_empty.cast("double")), 6
        ),
    ).otherwise(F.col("distinct_estimate").cast("double"))
    return est.select("node", corrected.cast("decimal(38,6)").alias("est"))


def hyperball_harmonic(
    edges: DataFrame,
    rounds: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_distinct: bool = False,
) -> DataFrame:
    """HyperBall harmonic centrality (Boldi & Vigna, WWW'14): per node,
    H(v) = Σ_{t=1..rounds} (|B(v,t)| − |B(v,t−1)|) / t — the number of
    nodes first reached at distance t, harmonically discounted. The
    centrality that, unlike closeness, is well-defined on disconnected
    graphs, computed from the SAME per-round HLL sketches as
    :func:`anf_rounds` (one edge join + register max per round).

    Determinism: per-round ball estimates are the decimal(38,6) pinned
    values; each increment (est_t − est_{t−1})/t is ONE double division
    rounded to 6 and accumulated as exact decimals — no float folds.

    Returns (node, harmonic) for every node, harmonic as double
    (round 6)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = node_sketch(nodes).localCheckpoint(eager=True)
    prev = _per_node_estimate(state)
    harm = prev.select(
        "node", F.lit(0).cast("decimal(38,6)").alias("h"), F.col("est").alias("_p")
    )
    for t in range(1, rounds + 1):
        nbr = e.join(
            state.select(F.col("node").alias("src"), "reg", "rho"), "src"
        ).select(F.col("dst").alias("node"), "reg", "rho")
        state = (
            state.unionAll(nbr)
            .groupBy("node", "reg")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True)
        )
        cur = _per_node_estimate(state)
        harm = (
            harm.join(cur, "node")
            .select(
                "node",
                (
                    F.col("h")
                    + F.round(
                        (F.col("est") - F.col("_p")).cast("double") / F.lit(float(t)),
                        6,
                    ).cast("decimal(38,6)")
                ).alias("h"),
                F.col("est").alias("_p"),
            )
            .localCheckpoint(eager=True)
        )
    return harm.select("node", F.round(F.col("h").cast("double"), 6).alias("harmonic"))


def sql_hyperball_harmonic(edges_cte: str, rounds: int) -> str:
    """DuckDB unrolled mirror of :func:`hyperball_harmonic`."""
    est_cte = """
est{t} AS MATERIALIZED (
  SELECT node,
         CASE WHEN ({m} - hit) > 0 AND raw <= {smallmax}
              THEN CAST(round({m}.0 * ln({m}.0 / CAST({m} - hit AS DOUBLE)),
                        6) AS DECIMAL(38,6))
              ELSE CAST(raw AS DECIMAL(38,6)) END AS est
  FROM (
    SELECT node, COUNT(*) AS hit,
           CAST(FLOOR(CAST({alpha!r} AS DOUBLE) * 65536.0 * {two53} /
                CAST(({m} - COUNT(*)) * CAST({two53_i} AS HUGEINT)
                     + SUM(CAST(1 AS HUGEINT) << (53 - rho)) AS DOUBLE))
                AS BIGINT) AS raw
    FROM s{t} GROUP BY node
  )
)"""
    parts = [
        f"e AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        """s0 AS MATERIALIZED (
  SELECT node,
         CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 2)) AS INTEGER) AS reg,
         CASE WHEN CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 3, 13)) AS BIGINT) = 0
              THEN 53
              ELSE 53 - length(format('{:b}',
                   CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 3, 13)) AS BIGINT)))
         END AS rho
  FROM nodes
)""",
    ]
    kw = dict(alpha=_ALPHA, two53=float(TWO53), two53_i=TWO53, m=M,
              smallmax=int(2.5 * M))
    parts.append(est_cte.format(t=0, **kw).strip())
    for t in range(1, rounds + 1):
        parts.append(
            f"""s{t} AS MATERIALIZED (
  SELECT node, reg, MAX(rho) AS rho FROM (
    SELECT node, reg, rho FROM s{t - 1}
    UNION ALL
    SELECT e.dst AS node, p.reg, p.rho
    FROM e JOIN s{t - 1} p ON e.src = p.node
  ) GROUP BY 1, 2
)"""
        )
        parts.append(est_cte.format(t=t, **kw).strip())
    incr = " + ".join(
        f"CAST(round(CAST(est{t}.est - est{t - 1}.est AS DOUBLE) / {float(t)!r}, 6)"
        f" AS DECIMAL(38,6))"
        for t in range(1, rounds + 1)
    )
    joins = "\n".join(
        f"JOIN est{t} ON est0.node = est{t}.node" for t in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT est0.node, round(CAST({incr} AS DOUBLE), 6) AS harmonic
FROM est0
{joins}
"""
    )
