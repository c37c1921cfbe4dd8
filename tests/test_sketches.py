"""Native approximate-sketch aggregates (HLL++ distinct counts, GK
quantiles): accuracy bounds + partial-aggregation plan shape. These are
deliberately pytest-only — sketch outputs are engine-specific, so there is
no DuckDB oracle row; the exact twins (`distinct_agg`, `price_quantiles`)
carry the oracle coverage for the same semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_mvp_spark.sources.testdata import load_table


def test_hll_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    approx = li.select(
        F.approx_count_distinct("l_orderkey", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) <= max(3, 0.06 * exact), (approx, exact)


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.selectExpr(
        "percentile(l_extendedprice, 0.5) AS m"
    ).collect()[0]["m"]
    approx = li.approxQuantile("l_extendedprice", [0.5], 0.01)[0]
    assert abs(approx - exact) / exact < 0.05


def test_hll_agg_is_partial_then_final(spark, sf_dir):
    # sketches must combine map-side (the point of using them at scale):
    # the plan shows partial_approx_count_distinct below the exchange
    li = load_table(spark, sf_dir, "lineitem")
    df = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("nd")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_approx_count_distinct" in plan


def test_kmv_jaccard_exact_when_union_fits(spark):
    """|A u B| <= k -> the union sketch holds every hash and the estimate
    IS the exact Jaccard."""
    from vector_db_mvp_spark.operators.sketch import kmv_jaccard

    rows = [("a", v) for v in range(40)] + [("b", v) for v in range(20, 60)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = kmv_jaccard(df, "g", "v", k=128).collect()
    assert len(out) == 1
    r = out[0]
    assert r["k_used"] == 60  # |A u B|
    assert r["n_both"] == 20  # |A n B|
    assert r["jaccard_est"] == r["jaccard_exact"] == round(20 / 60, 6)


def test_kmv_jaccard_estimates_within_tolerance(spark):
    """k=256 over 3 groups of 2000 values with known overlaps: estimates
    land within ~4 standard errors (sigma ~ sqrt(J(1-J)/k))."""
    from vector_db_mvp_spark.operators.sketch import kmv_jaccard

    rows = (
        [("a", v) for v in range(2000)]
        + [("b", v) for v in range(1000, 3000)]   # J(a,b) = 1000/3000
        + [("c", v) for v in range(10000, 12000)] # disjoint from both
    )
    df = spark.createDataFrame(rows, "g string, v long")
    out = {(r["group_a"], r["group_b"]): r for r in kmv_jaccard(df, "g", "v", k=256).collect()}
    ab = out[("a", "b")]
    assert abs(ab["jaccard_est"] - ab["jaccard_exact"]) < 4 * (0.333 * 0.667 / 256) ** 0.5
    assert out[("a", "c")]["jaccard_est"] == 0.0
    assert out[("b", "c")]["jaccard_est"] == 0.0
