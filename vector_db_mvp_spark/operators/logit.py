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


def logistic_newton2(grouped: DataFrame, rounds: int) -> DataFrame:
    """Two-regressor fixed-round Newton logistic regression — the multi-x
    leg of the same saturating-domain discipline. ``grouped`` is one row
    per distinct (x1, x2) pair with columns (x1 double, x2 double,
    n_pos long, n_neg long). Returns one row per round:
    (round, b0, b1, b2), betas rounded to 6 (12 kept between rounds).

    Per round: broadcast the 1-row beta frame into the domain frame,
    TWELVE exact DECIMAL(38,6) term sums (3 gradient + 6 Hessian — the
    symmetric 3x3), then the closed-form Cramer solve as one fixed-order
    IEEE double sequence, identical on both engines
    (:func:`sql_logistic_newton2` unrolls the same expressions).
    Singular-Hessian handling mirrors :func:`logistic_newton`: a
    saturated round (all w-term sums round to 0 at 6 decimals) makes
    det EXACTLY 0 and freezes the betas; perfectly collinear features
    with a non-degenerate domain are NOT entry-guarded (their det is a
    near-zero rounded sum, deterministic and engine-identical — the fit
    walks, it doesn't NULL), which the docstring records as the
    documented limitation. Entry guard: >= 3 distinct (x1, x2) points
    and >= 2 distinct values PER feature, else the Hessian is singular
    from round 1."""
    if rounds < 1:
        raise ValueError("logistic_newton2: rounds must be >= 1")
    spark = grouped.sparkSession
    g = grouped.select(
        F.col("x1").cast("double").alias("x1"),
        F.col("x2").cast("double").alias("x2"),
        F.col("n_pos").cast("double").alias("n1"),
        (F.col("n_pos") + F.col("n_neg")).cast("double").alias("n"),
    ).localCheckpoint(eager=True)
    chk = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("x1").alias("k1"),
        F.countDistinct("x2").alias("k2"),
    ).first()
    if chk["k"] < 3 or chk["k1"] < 2 or chk["k2"] < 2:
        raise ValueError(
            "logistic_newton2: need >= 3 distinct (x1, x2) points and "
            ">= 2 distinct values per feature (singular Hessian)"
        )

    beta = spark.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2")
    )
    out = None
    for r in range(1, rounds + 1):
        t = g.crossJoin(F.broadcast(beta))
        p = F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.col("b0")
                        + F.col("b1") * F.col("x1")
                        + F.col("b2") * F.col("x2")
                    )
                )
            ),
            12,
        )
        t = t.withColumn("p", p)
        w = F.col("n") * F.col("p") * (F.lit(1.0) - F.col("p"))
        resid = F.col("n1") - F.col("n") * F.col("p")

        def s(expr):
            return F.sum(F.round(expr, 6).cast(D386))

        sums = t.agg(
            s(resid).alias("g0"),
            s(F.col("x1") * resid).alias("g1"),
            s(F.col("x2") * resid).alias("g2"),
            s(w).alias("h00"),
            s(w * F.col("x1")).alias("h01"),
            s(w * F.col("x2")).alias("h02"),
            s(w * F.col("x1") * F.col("x1")).alias("h11"),
            s(w * F.col("x1") * F.col("x2")).alias("h12"),
            s(w * F.col("x2") * F.col("x2")).alias("h22"),
        )
        c = {
            k: F.col(k).cast("double")
            for k in ("g0", "g1", "g2", "h00", "h01", "h02", "h11", "h12", "h22")
        }
        # 3x3 Cramer over the symmetric Hessian, fixed-order doubles —
        # parenthesization matches sql_logistic_newton2 token for token.
        det = (
            c["h00"] * (c["h11"] * c["h22"] - c["h12"] * c["h12"])
            - c["h01"] * (c["h01"] * c["h22"] - c["h12"] * c["h02"])
            + c["h02"] * (c["h01"] * c["h12"] - c["h11"] * c["h02"])
        )
        d0 = (
            c["g0"] * (c["h11"] * c["h22"] - c["h12"] * c["h12"])
            - c["h01"] * (c["g1"] * c["h22"] - c["h12"] * c["g2"])
            + c["h02"] * (c["g1"] * c["h12"] - c["h11"] * c["g2"])
        )
        d1 = (
            c["h00"] * (c["g1"] * c["h22"] - c["h12"] * c["g2"])
            - c["g0"] * (c["h01"] * c["h22"] - c["h12"] * c["h02"])
            + c["h02"] * (c["h01"] * c["g2"] - c["g1"] * c["h02"])
        )
        d2 = (
            c["h00"] * (c["h11"] * c["g2"] - c["g1"] * c["h12"])
            - c["h01"] * (c["h01"] * c["g2"] - c["g1"] * c["h02"])
            + c["g0"] * (c["h01"] * c["h12"] - c["h11"] * c["h02"])
        )
        frozen = F.col("det_") == F.lit(0.0)
        nb = (
            sums.crossJoin(F.broadcast(beta))
            .withColumn("det_", det)
            .select(
                F.when(frozen, F.col("b0"))
                .otherwise(F.round(F.col("b0") + d0 / F.col("det_"), 12))
                .alias("b0"),
                F.when(frozen, F.col("b1"))
                .otherwise(F.round(F.col("b1") + d1 / F.col("det_"), 12))
                .alias("b1"),
                F.when(frozen, F.col("b2"))
                .otherwise(F.round(F.col("b2") + d2 / F.col("det_"), 12))
                .alias("b2"),
            )
        )
        beta = nb.localCheckpoint(eager=True)
        step = beta.select(
            F.lit(r).cast("int").alias("round"),
            F.round("b0", 6).alias("b0"),
            F.round("b1", 6).alias("b1"),
            F.round("b2", 6).alias("b2"),
        )
        out = step if out is None else out.unionAll(step)
    return out


def sql_logistic_newton2(grouped_cte: str, rounds: int) -> str:
    """DuckDB unrolled mirror of :func:`logistic_newton2`;
    ``grouped_cte`` must yield (x1, x2, n_pos, n_neg)."""
    parts = [
        f"""gd AS MATERIALIZED (
  SELECT CAST(x1 AS DOUBLE) AS x1, CAST(x2 AS DOUBLE) AS x2,
         CAST(n_pos AS DOUBLE) AS n1,
         CAST(n_pos + n_neg AS DOUBLE) AS n
  FROM ({grouped_cte}))""",
        "b0_ AS (SELECT 0.0::DOUBLE AS b0, 0.0::DOUBLE AS b1,"
        " 0.0::DOUBLE AS b2)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""s{r} AS MATERIALIZED (
  SELECT SUM(CAST(round(n1 - n * p, 6) AS DECIMAL(38,6))) AS g0,
         SUM(CAST(round(x1 * (n1 - n * p), 6) AS DECIMAL(38,6))) AS g1,
         SUM(CAST(round(x2 * (n1 - n * p), 6) AS DECIMAL(38,6))) AS g2,
         SUM(CAST(round(n * p * (1 - p), 6) AS DECIMAL(38,6))) AS h00,
         SUM(CAST(round(n * p * (1 - p) * x1, 6) AS DECIMAL(38,6))) AS h01,
         SUM(CAST(round(n * p * (1 - p) * x2, 6) AS DECIMAL(38,6))) AS h02,
         SUM(CAST(round(n * p * (1 - p) * x1 * x1, 6) AS DECIMAL(38,6))) AS h11,
         SUM(CAST(round(n * p * (1 - p) * x1 * x2, 6) AS DECIMAL(38,6))) AS h12,
         SUM(CAST(round(n * p * (1 - p) * x2 * x2, 6) AS DECIMAL(38,6))) AS h22
  FROM (SELECT g.*,
               round(1.0 / (1.0 + exp(-(b.b0 + b.b1 * g.x1 + b.b2 * g.x2))), 12) AS p
        FROM gd g CROSS JOIN b{p}_ b))""",
        )
        parts.append(
            f"""d{r}_ AS (
  SELECT CAST(s.g0 AS DOUBLE) AS g0, CAST(s.g1 AS DOUBLE) AS g1,
         CAST(s.g2 AS DOUBLE) AS g2,
         CAST(s.h00 AS DOUBLE) AS h00, CAST(s.h01 AS DOUBLE) AS h01,
         CAST(s.h02 AS DOUBLE) AS h02, CAST(s.h11 AS DOUBLE) AS h11,
         CAST(s.h12 AS DOUBLE) AS h12, CAST(s.h22 AS DOUBLE) AS h22,
         b.b0, b.b1, b.b2
  FROM s{r} s CROSS JOIN b{p}_ b)""",
        )
        parts.append(
            f"""e{r}_ AS (
  SELECT *,
         h00 * (h11 * h22 - h12 * h12)
           - h01 * (h01 * h22 - h12 * h02)
           + h02 * (h01 * h12 - h11 * h02) AS det,
         g0 * (h11 * h22 - h12 * h12)
           - h01 * (g1 * h22 - h12 * g2)
           + h02 * (g1 * h12 - h11 * g2) AS d0,
         h00 * (g1 * h22 - h12 * g2)
           - g0 * (h01 * h22 - h12 * h02)
           + h02 * (h01 * g2 - g1 * h02) AS d1,
         h00 * (h11 * g2 - g1 * h12)
           - h01 * (h01 * g2 - g1 * h02)
           + g0 * (h01 * h12 - h11 * h02) AS d2
  FROM d{r}_)""",
        )
        parts.append(
            f"""b{r}_ AS MATERIALIZED (
  SELECT CASE WHEN det = 0.0 THEN b0
         ELSE round(b0 + d0 / det, 12) END AS b0,
         CASE WHEN det = 0.0 THEN b1
         ELSE round(b1 + d1 / det, 12) END AS b1,
         CASE WHEN det = 0.0 THEN b2
         ELSE round(b2 + d2 / det, 12) END AS b2
  FROM e{r}_)""",
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, round(b0, 6) AS b0, round(b1, 6) AS b1,"
        f" round(b2, 6) AS b2 FROM b{r}_"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


def poisson_newton(grouped: DataFrame, rounds: int) -> DataFrame:
    """Fixed-round Newton Poisson regression (log link) — the count-GLM
    member of the family: y ~ Poisson(mu), mu = exp(b0 + b1*x). ``grouped``
    is the saturated domain: one row per distinct x with columns
    (x double, n long [rows at x], y_sum long [sum of counts at x]).
    Returns one row per round: (round, b0, b1), betas rounded to 6
    (12 kept internally).

    Same exactness contract as :func:`logistic_newton`: mu pins to 12
    decimals from round-12 betas, the five gradient/Hessian terms round
    to 6 and sum as DECIMAL(38,6) (partition-order-independent), the 2x2
    solve is one fixed-order IEEE double sequence, det == 0.0 freezes
    (Poisson's Hessian sums n*mu — it degenerates only if every mu pins
    to 0, i.e. the fit diverged to -inf; freezing keeps the last finite
    betas instead of NULL-vs-inf engine divergence). Entry guard: >= 2
    distinct x, like the logistic leg (1-point domain -> singular).

    Initialization is b0 = round(ln(mean y), 12), b1 = 0 — NOT (0, 0):
    a cold start puts mu = 1 against a mean of ~25, and the first Newton
    step overshoots b0 by ~ln-scale 20+, after which recovery is ~1 unit
    per round (exp overshoot). The mean is an exact integer-in-double
    ratio of domain-frame sums, so the init is engine-identical."""
    if rounds < 1:
        raise ValueError("poisson_newton: rounds must be >= 1")
    g = grouped.select(
        F.col("x").cast("double").alias("x"),
        F.col("n").cast("double").alias("n"),
        F.col("y_sum").cast("double").alias("y1"),
    ).localCheckpoint(eager=True)
    # Distinct-x count, not row count: the contract says grouped input,
    # but a duplicated-x frame would silently produce a singular Hessian
    # too — guard on the real condition (domain-sized scan either way).
    if g.select("x").distinct().count() < 2:
        raise ValueError(
            "poisson_newton: need >= 2 distinct x values (singular Hessian)"
        )

    beta = g.agg(
        F.round(F.log(F.sum("y1") / F.sum("n")), 12).alias("b0"),
        F.lit(0.0).alias("b1"),
    )
    out = None
    for r in range(1, rounds + 1):
        t = g.crossJoin(F.broadcast(beta))
        mu = F.round(F.exp(F.col("b0") + F.col("b1") * F.col("x")), 12)
        t = t.withColumn("mu", mu)
        w = F.col("n") * F.col("mu")  # Var = mean: the IRLS weight IS mu
        resid = F.col("y1") - F.col("n") * F.col("mu")
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
        beta = nb.localCheckpoint(eager=True)
        step = beta.select(
            F.lit(r).cast("int").alias("round"),
            F.round("b0", 6).alias("b0"),
            F.round("b1", 6).alias("b1"),
        )
        out = step if out is None else out.unionAll(step)
    return out


def sql_poisson_newton(grouped_cte: str, rounds: int) -> str:
    """DuckDB unrolled mirror of :func:`poisson_newton`;
    ``grouped_cte`` must yield (x, n, y_sum)."""
    parts = [
        f"""gd AS MATERIALIZED (
  SELECT CAST(x AS DOUBLE) AS x, CAST(n AS DOUBLE) AS n,
         CAST(y_sum AS DOUBLE) AS y1
  FROM ({grouped_cte}))""",
        "b0_ AS (SELECT round(ln(SUM(y1) / SUM(n)), 12) AS b0,"
        " 0.0::DOUBLE AS b1 FROM gd)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""s{r} AS MATERIALIZED (
  SELECT SUM(CAST(round(y1 - n * mu, 6) AS DECIMAL(38,6))) AS g0,
         SUM(CAST(round(x * (y1 - n * mu), 6) AS DECIMAL(38,6))) AS g1,
         SUM(CAST(round(n * mu, 6) AS DECIMAL(38,6))) AS h00,
         SUM(CAST(round(n * mu * x, 6) AS DECIMAL(38,6))) AS h01,
         SUM(CAST(round(n * mu * x * x, 6) AS DECIMAL(38,6))) AS h11
  FROM (SELECT g.*, round(exp(b.b0 + b.b1 * g.x), 12) AS mu
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
