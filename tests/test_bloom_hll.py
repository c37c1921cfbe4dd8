"""Bloom join pruning (operators/bloom.py) and HyperLogLog sketch
(operators/hll.py) — machinery tests beyond the oracle parity the
registered queries (bloom_filtered_part_revenue, hll_distinct_users)
already pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.bloom import (
    bloom_bitset,
    bloom_might_contain,
    bloom_semi_join,
)
from vector_db_mvp_spark.operators.hll import (
    hll_distinct,
    hll_estimate_from_state,
    hll_merge,
    hll_state_rows,
)


def test_bloom_no_false_negatives(spark):
    """Every build key must pass its own filter — a Bloom filter never
    drops a true member."""
    build = spark.range(0, 500).select(F.col("id").alias("k"))
    bits = bloom_bitset(build, "k", bits=4096, hashes=3)
    passed = build.filter(
        bloom_might_contain("k", bits, bits=4096, hashes=3)
    ).count()
    assert passed == 500


def test_bloom_bitset_is_control_plane_sized(spark):
    build = spark.range(0, 100_000).select(F.col("id").alias("k"))
    bits = bloom_bitset(build, "k", bits=1024, hashes=2)
    assert len(bits) == 1024 // 64  # independent of build cardinality


def test_bloom_semi_join_exact_under_saturation(spark):
    """With a deliberately tiny filter (64 bits, 200 keys) almost every
    probe row is a false positive — the verify join must still produce
    EXACTLY the semi-join."""
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    build = spark.range(0, 1000).select((F.col("id") * 2).alias("b"))  # evens < 2000
    got = bloom_semi_join(probe, "k", build, "b", bits=64, hashes=2)
    rows = sorted(r["k"] for r in got.collect())
    assert rows == list(range(0, 2000, 2))


def test_bloom_prune_runs_before_join(spark):
    """The bitset literal test must sit in a Filter on the probe scan —
    visible in the plan BEFORE the join, i.e. it prunes the exchange
    input rather than post-filtering join output."""
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    build = spark.range(0, 10).select(F.col("id").alias("b"))
    out = bloom_semi_join(probe, "k", build, "b")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    join_at = plan.find("Join")
    filter_at = plan.find("Filter")
    assert join_at != -1 and filter_at != -1
    # optimized plans print top-down: the Filter is UNDER the join (after it
    # in the string) and references the xxhash64 probe positions
    assert filter_at > join_at
    assert "xxhash64" in plan


def test_hll_merge_is_the_batch_sketch(spark):
    """Register-max merge of two halves == one-shot sketch of the union
    (the monoid law the per-shard rollup depends on)."""
    df = spark.range(0, 3000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v")
    )
    a = df.filter(F.col("v") < 1500)
    b = df.filter(F.col("v") >= 1000)  # overlap: idempotency exercised
    merged = hll_merge(
        hll_state_rows(a, "g", "v"), hll_state_rows(b, "g", "v"), "g"
    )
    got = hll_estimate_from_state(merged, "g").orderBy("g").collect()
    want = (
        hll_estimate_from_state(hll_state_rows(df, "g", "v"), "g")
        .orderBy("g")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_hll_estimate_accuracy(spark):
    """Raw HLL with m=256 has ~6.5% standard error; assert the estimate
    for 5000 distinct values lands within 20%."""
    df = spark.range(0, 5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    row = hll_distinct(df, "g", "v").collect()[0]
    assert row["n_exact"] == 5000
    assert abs(row["distinct_estimate"] - 5000) / 5000 < 0.20
