"""Fixed-round Newton (IRLS) logistic regression on a saturating value
domain — the "distributed exact statistics" discipline (chi2, K-S, OLS,
WOE/IV, Welch) applied to an ITERATIVE ML fit: one corpus pass collapses
the data to (x, n_pos, n_neg) per distinct regressor value, then every
Newton round runs on that bounded domain frame — cost after the first
pass is independent of corpus size, the canonical 100 TB shape for a
low-dimensional GLM.

Determinism / oracle parity: betas start at (0, 0); each round computes
the per-x sigmoid in double from round-12 betas and pins it to 12
decimals, forms the five gradient/Hessian terms in double, rounds each
TERM to 6 decimals and sums them as DECIMAL(38,6) (exact,
partition-order-independent — the zipf_fit/km_conversion_curve rule:
never float-fold across partitions), converts the five sums once to
double, and applies the closed-form 2x2 Newton solve (the OLS pattern:
one correctly-rounded IEEE arithmetic sequence, identical on both
engines). New betas round to 12. The SQL oracle unrolls identical
rounds.

Reference parity note: the reference has no GLM; this extends the
workload axis the same way the sketch/statistics family does
(SURVEY.md north-star operators), with the house exactness contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

D386 = "decimal(38,6)"


def logistic_newton(grouped: DataFrame, rounds: int) -> DataFrame:
    """``grouped`` is the saturated domain: one row per distinct x with
    columns (x double, n_pos long, n_neg long). Returns one row per
    Newton round: (round, b0, b1) with betas rounded to 6 (12 kept
    internally between rounds).

    Per round: broadcast the 1-row beta frame into the domain frame,
    five exact term sums, one closed-form 2x2 solve — zero corpus-sized
    work, zero collect (betas stay a DataFrame, the hits()/pagerank
    norm-broadcast pattern)."""
    if rounds < 1:
        raise ValueError("logistic_newton: rounds must be >= 1")
    spark = grouped.sparkSession
    g = grouped.select(
        F.col("x").cast("double").alias("x"),
        F.col("n_pos").cast("double").alias("n1"),
        (F.col("n_pos") + F.col("n_neg")).cast("double").alias("n"),
    ).localCheckpoint(eager=True)  # bounded domain, feeds every round
    # A single distinct x makes the Hessian singular (det = 0) and every
    # beta NaN from round 1 — fail loudly instead (the hits()/ktruss
    # entry-guard discipline). One scalar off the checkpointed bounded
    # frame: control-plane, not a corpus pass.
    if g.count() < 2:
        raise ValueError(
            "logistic_newton: need >= 2 distinct x values (singular Hessian)"
        )

    beta = spark.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1")
    )
    out = None
    for r in range(1, rounds + 1):
        t = g.crossJoin(F.broadcast(beta))
        p = F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("b0") + F.col("b1") * F.col("x")))),
            12,
        )
        t = t.withColumn("p", p)
        w = F.col("n") * F.col("p") * (F.lit(1.0) - F.col("p"))
        resid = F.col("n1") - F.col("n") * F.col("p")
        sums = t.agg(
            F.sum(F.round(resid, 6).cast(D386)).alias("g0"),
            F.sum(F.round(F.col("x") * resid, 6).cast(D386)).alias("g1"),
            F.sum(F.round(w, 6).cast(D386)).alias("h00"),
            F.sum(F.round(w * F.col("x"), 6).cast(D386)).alias("h01"),
            F.sum(F.round(w * F.col("x") * F.col("x"), 6).cast(D386)).alias(
                "h11"
            ),
        )
        g0, g1 = F.col("g0").cast("double"), F.col("g1").cast("double")
        h00, h01 = F.col("h00").cast("double"), F.col("h01").cast("double")
        h11 = F.col("h11").cast("double")
        det = h00 * h11 - h01 * h01
        # Late-round singular-Hessian freeze (ADVICE r12): the entry guard
        # catches a 1-point domain, but saturated sigmoids (p rounds to 0
        # or 1 at 12 decimals for every x) zero all three 6-decimal w-term
        # sums in a LATER round, making det exactly 0 — there Spark's
        # non-ANSI /0 yields NULL betas while DuckDB yields inf/NaN. The
        # det==0.0 comparison is on a double computed from identical
        # decimal sums on both engines, so the freeze branches the same
        # way everywhere; a saturated fit keeps its converged betas
        # (Newton step is 0/0 — "no information" — not a real step).
        frozen = F.col("det_") == F.lit(0.0)
        nb = (
            sums.crossJoin(F.broadcast(beta))
            .withColumn("det_", det)
            .select(
                F.when(frozen, F.col("b0"))
                .otherwise(
                    F.round(
                        F.col("b0") + (h11 * g0 - h01 * g1) / F.col("det_"),
                        12,
                    )
                )
                .alias("b0"),
                F.when(frozen, F.col("b1"))
                .otherwise(
                    F.round(
                        F.col("b1") + (h00 * g1 - h01 * g0) / F.col("det_"),
                        12,
                    )
                )
                .alias("b1"),
            )
        )
        # serialize the round (the pagerank discipline): round r's plan
        # must not replay rounds 1..r-1
        beta = nb.localCheckpoint(eager=True)
        step = beta.select(
            F.lit(r).cast("int").alias("round"),
            F.round("b0", 6).alias("b0"),
            F.round("b1", 6).alias("b1"),
        )
        out = step if out is None else out.unionAll(step)
    return out


def sql_logistic_newton(grouped_cte: str, rounds: int) -> str:
    """DuckDB unrolled mirror of :func:`logistic_newton`;
    ``grouped_cte`` must yield (x, n_pos, n_neg)."""
    parts = [
        f"""gd AS MATERIALIZED (
  SELECT CAST(x AS DOUBLE) AS x, CAST(n_pos AS DOUBLE) AS n1,
         CAST(n_pos + n_neg AS DOUBLE) AS n
  FROM ({grouped_cte}))""",
        "b0_ AS (SELECT 0.0::DOUBLE AS b0, 0.0::DOUBLE AS b1)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""s{r} AS MATERIALIZED (
  SELECT SUM(CAST(round(n1 - n * p, 6) AS DECIMAL(38,6))) AS g0,
         SUM(CAST(round(x * (n1 - n * p), 6) AS DECIMAL(38,6))) AS g1,
         SUM(CAST(round(n * p * (1 - p), 6) AS DECIMAL(38,6))) AS h00,
         SUM(CAST(round(n * p * (1 - p) * x, 6) AS DECIMAL(38,6))) AS h01,
         SUM(CAST(round(n * p * (1 - p) * x * x, 6) AS DECIMAL(38,6))) AS h11
  FROM (SELECT g.*, round(1.0 / (1.0 + exp(-(b.b0 + b.b1 * g.x))), 12) AS p
        FROM gd g CROSS JOIN b{p}_ b))""",
        )
        parts.append(
            f"""d{r}_ AS (
  SELECT CAST(s.g0 AS DOUBLE) AS g0, CAST(s.g1 AS DOUBLE) AS g1,
         CAST(s.h00 AS DOUBLE) AS h00, CAST(s.h01 AS DOUBLE) AS h01,
         CAST(s.h11 AS DOUBLE) AS h11, b.b0, b.b1,
         CAST(s.h00 AS DOUBLE) * CAST(s.h11 AS DOUBLE)
           - CAST(s.h01 AS DOUBLE) * CAST(s.h01 AS DOUBLE) AS det
  FROM s{r} s CROSS JOIN b{p}_ b)""",
        )
        # det = 0 freezes the betas — the saturated-domain branch, same
        # double comparison as the Spark plan (see logistic_newton).
        parts.append(
            f"""b{r}_ AS MATERIALIZED (
  SELECT CASE WHEN det = 0.0 THEN b0
         ELSE round(b0 + (h11 * g0 - h01 * g1) / det, 12) END AS b0,
         CASE WHEN det = 0.0 THEN b1
         ELSE round(b1 + (h00 * g1 - h01 * g0) / det, 12) END AS b1
  FROM d{r}_)""",
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, round(b0, 6) AS b0, round(b1, 6) AS b1 FROM b{r}_"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects
