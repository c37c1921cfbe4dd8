"""Skew mitigation (operators/skew.py): salted join/agg equivalence and the
spread property that justifies them."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vector_db_mvp_spark.operators.skew import (
    SALT_COL,
    _with_salt,
    salted_join,
    salted_two_phase_agg,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (k=0) carrying ~90% of rows, plus a uniform tail
    hot = spark.range(0, 9000).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    )
    tail = spark.range(0, 1000).select(
        (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.union(tail)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(0, 51).select(
        F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("name")
    )


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_inner_join_equals_plain(skewed, dim):
    got = salted_join(skewed, dim, "k", salt_buckets=8)
    want = skewed.join(dim, "k")
    assert _sorted_rows(got.select("k", "v", "name")) == _sorted_rows(
        want.select("k", "v", "name")
    )


def test_salted_left_joins_equal_plain(spark, skewed, dim):
    # dim missing some keys -> exercise null-extension and anti semantics
    dim_partial = dim.filter(F.col("k") < 40)
    for how in ("left", "left_semi", "left_anti"):
        got = salted_join(skewed, dim_partial, "k", salt_buckets=8, how=how)
        want = skewed.join(dim_partial, "k", how)
        assert _sorted_rows(got) == _sorted_rows(want), how


def test_right_joins_rejected(skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="right")


def test_salt_actually_spreads_hot_key(skewed):
    buckets = (
        _with_salt(skewed.filter(F.col("k") == 0), 8)
        .groupBy(SALT_COL)
        .count()
        .collect()
    )
    assert len(buckets) == 8  # hot key occupies every salt bucket
    counts = [r["count"] for r in buckets]
    assert max(counts) < sum(counts) * 0.5  # no bucket re-concentrates it


def test_salted_two_phase_agg_equals_plain(skewed):
    got = salted_two_phase_agg(
        skewed,
        ["k"],
        partial_aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.collect_set("v").alias("vs"),
        ],
        final_aggs=[
            F.sum("n").alias("n_rows"),
            F.sum("s").alias("sum_v"),
            F.size(F.array_distinct(F.flatten(F.collect_list("vs")))).alias("n_distinct"),
        ],
        salt_buckets=8,
    )
    want = skewed.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("v").alias("sum_v"),
        F.count_distinct("v").alias("n_distinct"),
    )
    assert _sorted_rows(got) == _sorted_rows(want)
