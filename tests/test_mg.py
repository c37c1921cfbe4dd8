"""Misra-Gries frequent items (operators/mg.py) — the summary guarantee
and the exact-recount contract, beyond the oracle parity the registered
query (frequent_tokens_guaranteed) pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.mg import frequent_items_exact, mg_candidates


def _zipf_df(spark):
    """0 appears 512x, 1 256x, ... 8 2x, 9 1x, plus 300 singletons."""
    rows = []
    for v in range(10):
        rows += [str(v)] * (512 >> v)
    rows += [f"rare{i}" for i in range(300)]
    return spark.createDataFrame([(v,) for v in rows], "v string")


def test_exact_result_matches_plain_groupby(spark):
    df = _zipf_df(spark).repartition(16)  # adversarial: values scattered
    m = 20
    got = {
        (r["value"], r["n_occurrences"])
        for r in frequent_items_exact(df, "v", m=m).collect()
    }
    n = df.count()
    want = {
        (r["v"], r["cnt"])
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * m > n)
        .collect()
    }
    assert got == want and got  # non-degenerate


def test_result_independent_of_partitioning(spark):
    base = _zipf_df(spark)
    m = 15
    a = frequent_items_exact(base.coalesce(1), "v", m=m).collect()
    b = frequent_items_exact(base.repartition(32), "v", m=m).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_candidate_summaries_are_bounded(spark):
    df = spark.range(0, 20_000).select(F.col("id").cast("string").alias("v"))
    df = df.repartition(8)
    m = 50
    # <= m survivors per partition, so <= m * 8 candidates despite 20k
    # distinct values
    assert mg_candidates(df, m=m).count() <= m * 8


def test_recount_join_broadcasts_candidates(spark):
    df = _zipf_df(spark)
    plan = frequent_items_exact(df, "v", m=10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the value stream never shuffles for the recount
