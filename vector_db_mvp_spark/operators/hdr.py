"""HDR-style mergeable quantile sketch: integer log-linear binning.

Completes the sketch family (KMV distinct / Count-Min frequency / HLL
cardinality / Misra-Gries heavy hitters — operators/sketch.py, hll.py,
mg.py) with the one missing sketch type: QUANTILES over a bounded-state
monoid. The exact global machinery (operators/rank.py: range-bucketed
median/deciles/equidepth) answers the same questions with a full shuffle
of the corpus; this sketch answers them from per-partition summaries a
coordinator can merge — the per-shard rollup shape for 100 TB telemetry.

Design — HdrHistogram's log-linear binning (Gray & Tene), reduced to pure
integer arithmetic so Spark and the DuckDB oracle compute IDENTICAL bins
(no log()/pow() floats anywhere — libm implementations differ by ulps at
bin boundaries, which would break oracle parity):

    value v >= 1 (integer, e.g. cents)
    m      = bit_length(v)
    shift  = max(m - 5, 0)
    bucket = v                            (v < 16: exact)
           = shift * 16 + (v >> shift)    (v >= 16: 16 sub-bins/octave)

Bucket index is monotone in v; each bucket spans a <= 6.25% relative range
(4 significant bits), so any quantile is answered with <= 6.25% relative
value error, with EXACT bounds reported:

    k    = bucket div 16 - 1,  mant = bucket - 16 * k     (bucket >= 16)
    lo   = mant << k,          hi = ((mant + 1) << k) - 1

State is (group, bucket, count): bounded at ~16 * 64 rows per group
regardless of data (realistically ~300 for money-sized values), merge is
count addition — associative, commutative, partitioning-independent, and
map-side combinable (the groupBy computes partial sums next to the scan).
Quantile targets use percentile_disc rank semantics: the chosen bucket is
the first whose cumulative count reaches ceil(q * n).

Zero/negative values are rejected (assert-filtered) rather than binned:
money/latency/size domains are positive; a signed variant would mirror the
bins around zero like HdrHistogram does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUB_BITS = 4          # significant bits per bucket -> 16 sub-bins/octave
_SUB = 1 << SUB_BITS  # 16


def bucket_expr(v: str) -> str:
    """Spark SQL fragment: HDR bucket of positive BIGINT expression ``v``.
    Pure integer ops (bit length via conv-to-binary, column-shift
    shiftright) — identical in the DuckDB twin."""
    m = f"length(conv(CAST(({v}) AS STRING), 10, 2))"
    shift = f"greatest({m} - 5, 0)"
    return (
        f"CASE WHEN ({v}) < {_SUB} THEN CAST(({v}) AS BIGINT) "
        f"ELSE CAST({shift} AS BIGINT) * {_SUB} + shiftright(({v}), {shift}) END"
    )


def sql_bucket_expr(v: str) -> str:
    """DuckDB twin of :func:`bucket_expr` (format('{{:b}}') bit length,
    ``>>`` column shift) — same integers, same buckets."""
    m = f"length(format('{{:b}}', CAST(({v}) AS BIGINT)))"
    shift = f"greatest({m} - 5, 0)"
    return (
        f"CASE WHEN ({v}) < {_SUB} THEN CAST(({v}) AS BIGINT) "
        f"ELSE CAST({shift} AS BIGINT) * {_SUB} + (CAST(({v}) AS BIGINT) >> {shift}) END"
    )


def bounds_exprs(bucket: str) -> tuple[str, str]:
    """(lo, hi) Spark SQL fragments for a bucket index's exact value range.
    The only dialect split in this module: Spark spells the column-amount
    left shift ``shiftleft(x, k)`` while DuckDB spells it ``x << k``
    (:func:`sql_bounds_exprs`); the integer arithmetic is otherwise
    identical, so the computed bounds are."""
    k = f"greatest(CAST(({bucket}) DIV {_SUB} AS INT) - 1, 0)"
    mant = f"(({bucket}) - CAST(({bucket}) DIV {_SUB} AS BIGINT) * {_SUB} + CASE WHEN ({bucket}) >= {_SUB} THEN {_SUB} ELSE 0 END)"
    lo = f"CASE WHEN ({bucket}) < {_SUB} THEN ({bucket}) ELSE shiftleft({mant}, {k}) END"
    hi = (
        f"CASE WHEN ({bucket}) < {_SUB} THEN ({bucket}) "
        f"ELSE shiftleft({mant} + 1, {k}) - 1 END"
    )
    return lo, hi


def sql_bounds_exprs(bucket: str) -> tuple[str, str]:
    k = f"greatest(CAST(({bucket}) // {_SUB} AS INT) - 1, 0)"
    mant = f"(({bucket}) - CAST(({bucket}) // {_SUB} AS BIGINT) * {_SUB} + CASE WHEN ({bucket}) >= {_SUB} THEN {_SUB} ELSE 0 END)"
    lo = f"CASE WHEN ({bucket}) < {_SUB} THEN ({bucket}) ELSE ({mant}) << ({k}) END"
    hi = (
        f"CASE WHEN ({bucket}) < {_SUB} THEN ({bucket}) "
        f"ELSE ((({mant}) + 1) << ({k})) - 1 END"
    )
    return lo, hi


def hdr_state(df: DataFrame, group_col: str, value_sql: str) -> DataFrame:
    """The mergeable monoid: (group, bucket, cnt), bounded per group.
    ``value_sql`` must be a positive-BIGINT SQL fragment."""
    return (
        df.withColumn("_v", F.expr(f"CAST(({value_sql}) AS BIGINT)"))
        .filter(F.col("_v") >= 1)
        .withColumn("bucket", F.expr(bucket_expr("_v")))
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(a: DataFrame, b: DataFrame, group_col: str) -> DataFrame:
    """Monoid merge: bucket-count addition over the union."""
    return (
        a.unionByName(b)
        .groupBy(group_col, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hdr_quantiles_from_state(
    state: DataFrame, group_col: str, quantiles: list[float]
) -> DataFrame:
    """(group, q, bucket, lo, hi, cum_count, n) — the first bucket whose
    cumulative count reaches ceil(q * n), percentile_disc semantics. The
    windows here run over the BOUNDED state frame (~300 rows/group), not
    the corpus."""
    w = Window.partitionBy(group_col).orderBy("bucket")
    cum = state.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(group_col))
    )
    qs = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("q")
    hit = (
        cum.select(group_col, "bucket", "cum", "n", qs)
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy(group_col, "q")
        .agg(
            F.min("bucket").alias("bucket"),
            F.max("n").alias("n"),
        )
    )
    lo, hi = bounds_exprs("bucket")
    out = hit.join(
        cum.select(group_col, "bucket", F.col("cum").alias("cum_count")),
        [group_col, "bucket"],
    )
    return out.select(
        group_col,
        "q",
        "bucket",
        F.expr(lo).cast("long").alias("lo"),
        F.expr(hi).cast("long").alias("hi"),
        F.col("cum_count").cast("long").alias("cum_count"),
        F.col("n").cast("long").alias("n"),
    ).orderBy(group_col, "q")


def hdr_quantiles(
    df: DataFrame, group_col: str, value_sql: str, quantiles: list[float]
) -> DataFrame:
    """One-shot: state + quantile extraction."""
    return hdr_quantiles_from_state(
        hdr_state(df, group_col, value_sql), group_col, quantiles
    )


def sql_hdr_quantiles(
    table: str, group_col: str, value_sql: str, quantiles: list[float]
) -> str:
    """DuckDB oracle: identical integer bins, identical rank semantics."""
    qlist = ", ".join(f"({float(q)!r})" for q in quantiles)
    lo, hi = sql_bounds_exprs("bucket")
    return f"""
WITH vals AS (
  SELECT {group_col}, CAST(({value_sql}) AS BIGINT) AS v FROM {table}
  WHERE CAST(({value_sql}) AS BIGINT) >= 1
),
state AS (
  SELECT {group_col}, {sql_bucket_expr('v')} AS bucket, COUNT(*) AS cnt
  FROM vals GROUP BY 1, 2
),
cum AS (
  SELECT {group_col}, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY {group_col} ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY {group_col}) AS n
  FROM state
),
targets(q) AS (VALUES {qlist}),
hit AS (
  SELECT {group_col}, q, MIN(bucket) AS bucket, MAX(n) AS n
  FROM cum CROSS JOIN targets
  WHERE cum >= CEIL(q * n)
  GROUP BY 1, 2
)
SELECT h.{group_col}, h.q, h.bucket,
       CAST({lo.replace('bucket', 'h.bucket')} AS BIGINT) AS lo,
       CAST({hi.replace('bucket', 'h.bucket')} AS BIGINT) AS hi,
       CAST(c.cum AS BIGINT) AS cum_count,
       CAST(h.n AS BIGINT) AS n
FROM hit h
JOIN cum c ON c.{group_col} = h.{group_col} AND c.bucket = h.bucket
ORDER BY h.{group_col}, h.q
"""
