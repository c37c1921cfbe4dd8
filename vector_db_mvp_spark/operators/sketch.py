"""KMV (K-minimum-values) distinct-count sketch over a grouped column.

Part of the LLM-data-pipeline surface (cardinality estimation for corpus
stats at 100 TB — e.g. distinct users/domains/shingles per shard without a
full COUNT(DISTINCT) state per group). The reference engine
(bmallikanti/vector_db_mvp) has no sketch module; this extends the engine
the way its `/stats` endpoint (app/routers/stats.py) reports corpus-level
counts, but with bounded memory per group.

Why KMV and not HyperLogLog: Spark's `approx_count_distinct` (HLL++) is not
reproducible against an external oracle, so it cannot be hash-verified. KMV
with a fixed hash (md5) is fully deterministic — DuckDB computes the exact
same sketch from the exact same rows, so the driver's value-hash comparison
works while the operator still demonstrates bounded-state estimation.

Estimator: with h_(k) the k-th smallest of the (practically collision-free)
md5 hashes of the group's distinct values, uniformly distributed in [0, 1),
E[|group|] ~= (k-1) / h_(k). We normalize by the first 8 hex chars
(32-bit prefix) and use floor() — floor, not round, because IEEE-754
floor is bitwise-identical across engines while round's half-case tie
rules differ.

Scale design (100 TB): the only full-width shuffle is the distinct on
(group, value) — unavoidable for set semantics and a plain hash
aggregation. The per-group k-th order statistic is computed in TWO phases
so a skewed group never funnels all its rows through one window partition:
phase 1 keeps the k smallest hashes per (group, salt-bucket) — bounded
k rows out per bucket; phase 2 ranks the <= k*BUCKETS survivors per
group. The exact per-group count (needed for the |group| < k case and
reported for comparison) is a separate two-phase hash aggregation with
map-side partial combine, not a window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Salt-bucket fan-out for the phase-1 prune. 32 buckets bounds the phase-2
# window input at 32*k rows per group regardless of group skew.
BUCKETS = 32


def _hash32(h: Column) -> Column:
    """Numeric value of the first 8 hex chars of an md5 string, as double
    (exact: < 2^32 < 2^53). Matches DuckDB's CAST('0x'||substr(h,1,8) AS
    UBIGINT) bit-for-bit."""
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double")


def kmv_distinct(df: DataFrame, group_col: str, value_col: str, k: int = 64) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns DataFrame[group_col, k_used, distinct_estimate, n_exact],
    one row per group, ordered by group. Groups with fewer than ``k``
    distinct values report the exact count as the estimate.
    """
    d = df.select(group_col, value_col).distinct()
    h = d.select(group_col, F.md5(F.col(value_col).cast("string")).alias("h"))
    counts = h.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))

    # Phase 1: k smallest hashes per (group, salt bucket).
    b = h.withColumn("_b", F.pmod(F.xxhash64("h"), F.lit(BUCKETS)))
    w1 = Window.partitionBy(group_col, "_b").orderBy("h")
    pruned = (
        b.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_b", "_rn")
    )

    # Phase 2: global k-th smallest per group over the bounded survivors.
    w2 = Window.partitionBy(group_col).orderBy("h")
    ranked = pruned.withColumn("rn", F.row_number().over(w2))
    kth = ranked.join(F.broadcast(counts), group_col).filter(
        F.col("rn") == F.least(F.col("n"), F.lit(k))
    )

    v = F.greatest(_hash32(F.col("h")), F.lit(1.0))
    est = F.when(F.col("n") < k, F.col("n")).otherwise(
        F.floor(F.lit(float(k - 1) * 4294967296.0) / v)
    )
    return kth.select(
        group_col,
        F.least(F.col("n"), F.lit(k)).cast("long").alias("k_used"),
        est.cast("long").alias("distinct_estimate"),
        F.col("n").cast("long").alias("n_exact"),
    ).orderBy(group_col)


def kmv_state_rows(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Bounded KMV state: the <= k smallest distinct md5 hashes per group,
    as (group_col, h) rows — the min-k monoid the streaming maintainer
    (streaming/sketch_stream.py KmvIngest) merges across batches. Same
    two-phase salted prune as :func:`kmv_distinct`."""
    d = df.select(group_col, value_col).distinct()
    h = d.select(group_col, F.md5(F.col(value_col).cast("string")).alias("h"))
    b = h.withColumn("_b", F.pmod(F.xxhash64("h"), F.lit(BUCKETS)))
    w1 = Window.partitionBy(group_col, "_b").orderBy("h")
    pruned = (
        b.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_b", "_rn")
    )
    w2 = Window.partitionBy(group_col).orderBy("h")
    return (
        pruned.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(a: DataFrame, b: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """Min-k monoid merge: k smallest of the DEDUPLICATED union — values
    seen in several batches hash identically, so (group, h) dedup keeps
    set semantics exact across batch boundaries."""
    u = a.unionByName(b).dropDuplicates([group_col, "h"])
    w = Window.partitionBy(group_col).orderBy("h")
    return u.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def kmv_estimate_from_state(
    state: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """(group, k_used, distinct_estimate) from bounded min-k state. A
    group with fewer than k state rows holds ALL its distinct hashes, so
    the count is exact; at k rows the k-th smallest hash (= max of the
    state) feeds the same estimator as :func:`kmv_distinct` — the
    maintained estimate equals the one-shot batch estimate bit-for-bit."""
    agg = state.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("_kth")
    )
    v = F.greatest(_hash32(F.col("_kth")), F.lit(1.0))
    est = F.when(F.col("_n") < k, F.col("_n")).otherwise(
        F.floor(F.lit(float(k - 1) * 4294967296.0) / v)
    )
    return agg.select(
        group_col,
        F.col("_n").cast("long").alias("k_used"),
        est.cast("long").alias("distinct_estimate"),
    ).orderBy(group_col)


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    k: int = 20,
) -> DataFrame:
    """Count-Min-sketch frequency estimates (Cormode & Muthukrishnan '05):
    top-``k`` values of ``value_col`` by estimated occurrence count.

    Like :func:`kmv_distinct`, the sketch is built from a fixed md5 hash
    family so it is fully deterministic — the DuckDB oracle constructs the
    IDENTICAL ``depth × width`` counter array and reads the same minima,
    so the driver's value-hash comparison verifies the estimator itself
    (estimates over-count collisions by construction; the oracle agrees on
    every collision).

    Scale design (100 TB): the counter build is ``depth`` hash-aggregations
    over the exploded value stream, map-side combined — the shuffle carries
    at most depth×width partial rows per task, never the stream. The
    counter array (depth×width rows) broadcasts to estimate the distinct
    values; per-value estimate = min over rows of its counter. Top-k is
    TakeOrderedAndProject. The value stream is scanned twice (counters,
    distinct probe) — at 100 TB both scans are the same column-pruned
    parquet pass.

    Returns DataFrame[value, est_count] ordered by (est_count desc, value).
    """
    vals = cms_values(df, value_col)
    counters = cms_counters(vals, depth=depth, width=width)
    return cms_topk_from_counters(
        counters, vals, depth=depth, width=width, k=k
    )


def cms_values(df: DataFrame, value_col: str) -> DataFrame:
    """Normalize the value stream: one string row ``v`` per occurrence,
    NULLs excluded (identical to the oracle's ``vals`` CTE)."""
    return df.select(F.col(value_col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )


def cms_hash(v: Column, r: int, width: int) -> Column:
    """Sketch-row hash h_r(v) = md5('r:'||v)[:8] % width — the fixed md5
    family both engines (and the streaming maintainer) share."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(str(r)), v)), 1, 8), 16, 10
        ).cast("long"),
        F.lit(width),
    )


def cms_counter_delta(vals: DataFrame, *, depth: int, width: int) -> DataFrame:
    """Exploded (r, h) rows, one per (occurrence, sketch row) — the raw
    increment stream a counter aggregation (batch or incremental
    monoid-state merge) counts."""
    rows = None
    for r in range(depth):
        p = vals.select(F.lit(r).alias("r"), cms_hash(F.col("v"), r, width).alias("h"))
        rows = p if rows is None else rows.unionByName(p)
    return rows


def cms_counters(vals: DataFrame, *, depth: int, width: int) -> DataFrame:
    """depth x width counter array (r, h, c) from a value stream."""
    return (
        cms_counter_delta(vals, depth=depth, width=width)
        .groupBy("r", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_topk_from_counters(
    counters: DataFrame,
    vals: DataFrame,
    *,
    depth: int,
    width: int,
    k: int,
) -> DataFrame:
    """Top-k estimates given a counter array and the candidate value
    stream: per-value estimate = min over sketch rows of its counter.
    ``counters`` may come from a one-shot aggregation or from persisted
    incrementally-maintained state (streaming/sketch_stream.py) — the
    estimate is identical because counting is a commutative monoid."""
    probes = None
    d = vals.distinct()
    for r in range(depth):
        p = d.select("v", F.lit(r).alias("r"), cms_hash(F.col("v"), r, width).alias("h"))
        probes = p if probes is None else probes.unionByName(p)
    est = (
        probes.join(F.broadcast(counters), ["r", "h"])
        .groupBy("v")
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.select(F.col("v").alias("value"), "est_count")
        .orderBy(F.col("est_count").desc(), F.col("value").asc())
        .limit(k)
    )


def cms_inner_product_counters(ca: DataFrame, cb: DataFrame) -> DataFrame:
    """One-row (est) sketch inner product: min over sketch rows of the
    per-row counter dot product — the Count-Min join-size / F2 estimator
    (Cormode & Muthukrishnan '05, §4.2): an UPPER bound on Σ_k a_k·b_k
    with error ≤ ||a||₁·||b||₁ / width per row (min over depth rows
    tightens it). Products/sums accumulate as DECIMAL(38,0): per-row
    counters reach N/width and the dot product N²/width — int64 wraps
    near N ≈ 2.5e11 at width 65536, inside a 100 TB key stream.

    Pass the SAME counters frame twice for the self-join size (F2, the
    'surprise number'). Counter arrays are depth×width bounded state with
    map-side-combined builds — the sketch algebra runs on O(depth·width)
    rows however large the streams."""
    d18 = "decimal(18,0)"
    b = cb.select(
        F.col("r").alias("r2"), F.col("h").alias("h2"), F.col("c").alias("c2")
    )
    ip = (
        ca.join(b, (ca["r"] == b["r2"]) & (ca["h"] == b["h2"]))
        .groupBy("r")
        .agg(
            F.sum(F.col("c").cast(d18) * F.col("c2").cast(d18))
            .cast("decimal(38,0)")
            .alias("s")
        )
    )
    return ip.agg(F.min("s").alias("est"))


def sql_cms_heavy_hitters(
    values_cte: str,
    *,
    depth: int = 4,
    width: int = 1024,
    k: int = 20,
) -> str:
    """DuckDB oracle building the identical CM sketch. ``values_cte`` must
    be a complete CTE body yielding one column ``v`` (one row per
    occurrence, NULLs excluded)."""
    return f"""
WITH vals AS ({values_cte}),
rows_r AS (SELECT r FROM (VALUES {", ".join(f"({r})" for r in range(depth))}) t(r)),
hashed AS (
  SELECT r, CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || v), 1, 8)) AS BIGINT)
            % {width} AS h
  FROM vals CROSS JOIN rows_r
),
counters AS (SELECT r, h, COUNT(*) AS c FROM hashed GROUP BY 1, 2),
probes AS (
  SELECT v, r,
         CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || v), 1, 8)) AS BIGINT)
         % {width} AS h
  FROM (SELECT DISTINCT v FROM vals) CROSS JOIN rows_r
),
est AS (
  SELECT p.v, MIN(c.c) AS est_count
  FROM probes p JOIN counters c ON p.r = c.r AND p.h = c.h
  GROUP BY 1
)
SELECT v AS value, est_count FROM est
ORDER BY est_count DESC, value ASC LIMIT {k}
"""


def sql_kmv_distinct(table: str, group_col: str, value_col: str, k: int = 64) -> str:
    """DuckDB oracle computing the identical sketch (same hash, same
    estimator, same floor) — exact value parity, not a tolerance check."""
    return f"""
WITH d AS (SELECT DISTINCT {group_col}, {value_col} FROM {table}),
h AS (SELECT {group_col}, md5(CAST({value_col} AS VARCHAR)) AS h FROM d),
r AS (SELECT {group_col}, h,
             ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY h) AS rn,
             COUNT(*) OVER (PARTITION BY {group_col}) AS n
      FROM h)
SELECT {group_col},
       CAST(LEAST(n, {k}) AS BIGINT) AS k_used,
       CAST(CASE WHEN n < {k} THEN n
            ELSE CAST(FLOOR({float(k - 1)} * 4294967296.0 /
                 GREATEST(CAST(('0x' || substr(h, 1, 8)) AS UBIGINT), 1)) AS BIGINT)
            END AS BIGINT) AS distinct_estimate,
       CAST(n AS BIGINT) AS n_exact
FROM r WHERE rn = LEAST(n, {k})
ORDER BY {group_col}
"""


# ---------------------------------------------------------------------------
# KMV set similarity: Jaccard between per-group value sets from their
# sketches. est = |S_k(A u B)  ∩  S(A)  ∩  S(B)| / k — the standard KMV
# Jaccard estimator (Beyer et al., SIGMOD'07): the k smallest hashes of the
# union are a uniform sample of A u B, and membership in both sketches
# marks the intersection. Deterministic given md5, so the oracle computes
# the IDENTICAL estimate; when |A u B| <= k the sketch holds the whole
# union and the estimate is exact.
#
# Scale design: the only corpus-sized work is kmv_state_rows' salted
# prune; everything after runs on <= k rows per group (state) and
# <= k rows per group PAIR (union sketches). The pair frame is
# #groups^2 / 2 — group cardinality here is a handful of categories
# (event types, languages, sources), so the crossJoin is control-plane
# sized by construction; for large group counts, pair selection (not the
# sketch math) is the thing to bound first.
# ---------------------------------------------------------------------------

def kmv_jaccard(
    df: DataFrame, group_col: str, value_col: str, k: int = 128
) -> DataFrame:
    """Pairwise Jaccard similarity between per-group value SETS.

    Returns (group_a, group_b, k_used, n_both, jaccard_est,
    jaccard_exact) for every unordered group pair, ordered. The exact
    value rides along for calibration (same pattern as kmv_distinct's
    n_exact) — at deployment scale only the estimate is computed."""
    state = kmv_state_rows(df, group_col, value_col, k=k)
    ga = state.select(F.col(group_col).alias("group_a"), "h")
    gb = state.select(F.col(group_col).alias("group_b"), "h")
    pairs = (
        ga.select("group_a").distinct()
        .crossJoin(gb.select("group_b").distinct())
        .filter(F.col("group_a") < F.col("group_b"))
    )
    # union-of-sketches per pair, k smallest
    u = (
        pairs.join(ga, "group_a")
        .unionByName(pairs.join(gb, "group_b").select("group_a", "group_b", "h"))
        .select("group_a", "group_b", "h")
        .distinct()
    )
    w = Window.partitionBy("group_a", "group_b").orderBy("h")
    uk = u.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    flagged = (
        uk.join(
            ga.withColumn("_in_a", F.lit(1)), ["group_a", "h"], "left"
        )
        .join(gb.withColumn("_in_b", F.lit(1)), ["group_b", "h"], "left")
    )
    est_frame = flagged.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.sum(
            F.when(F.col("_in_a").isNotNull() & F.col("_in_b").isNotNull(), 1).otherwise(0)
        ).alias("n_both"),
    )
    # exact companion over the distinct sets
    d = df.select(group_col, value_col).distinct()
    da = d.select(F.col(group_col).alias("group_a"), F.col(value_col).alias("v"))
    db = d.select(F.col(group_col).alias("group_b"), F.col(value_col).alias("v"))
    inter = (
        da.join(db, "v")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    sizes = d.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    exact = (
        pairs.join(sizes.withColumnRenamed(group_col, "group_a"), "group_a")
        .withColumnRenamed("_n", "_na")
        .join(sizes.withColumnRenamed(group_col, "group_b"), "group_b")
        .withColumnRenamed("_n", "_nb")
        .join(inter, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            (
                F.coalesce(F.col("_ni"), F.lit(0)).cast("double")
                / (F.col("_na") + F.col("_nb") - F.coalesce(F.col("_ni"), F.lit(0)))
            ).alias("_jx"),
        )
    )
    return (
        est_frame.join(exact, ["group_a", "group_b"])
        .select(
            "group_a",
            "group_b",
            F.col("k_used").cast("long").alias("k_used"),
            F.col("n_both").cast("long").alias("n_both"),
            F.round(F.col("n_both") / F.col("k_used"), 6).alias("jaccard_est"),
            F.round(F.col("_jx"), 6).alias("jaccard_exact"),
        )
        .orderBy("group_a", "group_b")
    )


def sql_kmv_jaccard(
    table: str, group_col: str, value_col: str, k: int = 128
) -> str:
    """DuckDB oracle: the identical sketch, union-k, and memberships."""
    return f"""
WITH d AS (SELECT DISTINCT {group_col} AS g, {value_col} AS v FROM {table}),
h AS (SELECT g, md5(CAST(v AS VARCHAR)) AS h FROM d),
state AS (
  SELECT g, h FROM (
    SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn FROM h
  ) WHERE rn <= {k}
),
pairs AS (
  SELECT a.g AS group_a, b.g AS group_b
  FROM (SELECT DISTINCT g FROM state) a, (SELECT DISTINCT g FROM state) b
  WHERE a.g < b.g
),
u AS (
  SELECT DISTINCT group_a, group_b, h FROM (
    SELECT p.group_a, p.group_b, s.h FROM pairs p JOIN state s ON s.g = p.group_a
    UNION ALL
    SELECT p.group_a, p.group_b, s.h FROM pairs p JOIN state s ON s.g = p.group_b
  )
),
uk AS (
  SELECT group_a, group_b, h FROM (
    SELECT group_a, group_b, h,
           ROW_NUMBER() OVER (PARTITION BY group_a, group_b ORDER BY h) AS rn
    FROM u
  ) WHERE rn <= {k}
),
est AS (
  SELECT uk.group_a, uk.group_b,
         COUNT(*) AS k_used,
         SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL THEN 1 ELSE 0 END)
           AS n_both
  FROM uk
  LEFT JOIN state sa ON sa.g = uk.group_a AND sa.h = uk.h
  LEFT JOIN state sb ON sb.g = uk.group_b AND sb.h = uk.h
  GROUP BY 1, 2
),
sizes AS (SELECT g, COUNT(*) AS n FROM d GROUP BY 1),
inter AS (
  SELECT a.g AS group_a, b.g AS group_b, COUNT(*) AS ni
  FROM d a JOIN d b ON a.v = b.v AND a.g < b.g
  GROUP BY 1, 2
)
SELECT e.group_a, e.group_b,
       CAST(e.k_used AS BIGINT) AS k_used,
       CAST(e.n_both AS BIGINT) AS n_both,
       round(CAST(e.n_both AS DOUBLE) / e.k_used, 6) AS jaccard_est,
       round(CAST(COALESCE(i.ni, 0) AS DOUBLE)
             / (sa.n + sb.n - COALESCE(i.ni, 0)), 6) AS jaccard_exact
FROM est e
JOIN sizes sa ON sa.g = e.group_a
JOIN sizes sb ON sb.g = e.group_b
LEFT JOIN inter i ON i.group_a = e.group_a AND i.group_b = e.group_b
ORDER BY e.group_a, e.group_b
"""
