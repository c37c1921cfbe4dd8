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
