"""Distributed global-window primitives (operators/rank.py): equivalence
with the single-partition window on hand data + plan hazard checks; the
query-level oracle parity runs in test_queries_oracle (deciles, skyline)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.rank import (
    global_row_number,
    ntile_from_rn,
    running_min_before,
)


def _no_data_funnel(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, l in enumerate(lines):
        if "Exchange SinglePartition" in l:
            if "HashAggregate(keys=[]" not in (lines[i - 1] if i else ""):
                return False
    return True


def test_global_row_number_matches_window(spark):
    df = spark.createDataFrame(
        [(i % 17, i) for i in range(500)], "v long, id long"
    )
    ranked, n = global_row_number(df, "v", ["id"], buckets=8)
    assert n == 500
    got = {r["id"]: r["rn"] for r in ranked.collect()}
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want
    assert _no_data_funnel(ranked)


def test_ntile_from_rn_matches_ntile(spark):
    for n in (7, 100, 103):
        df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
        w = Window.orderBy("id")
        want = {
            r["id"]: r["t"]
            for r in df.withColumn("t", F.ntile(10).over(w)).collect()
        }
        ranked, total = global_row_number(df, "id", [], buckets=4)
        got = {
            r["id"]: r["t"]
            for r in ranked.withColumn(
                "t", ntile_from_rn(F.col("rn"), total, 10)
            ).collect()
        }
        assert got == want, n


def test_running_min_before_matches_window(spark):
    rows = [(float(i), (i * 7919) % 100) for i in range(300)]
    df = spark.createDataFrame(rows, "o double, v long")
    got = {
        r["o"]: r["_prev_min"]
        for r in running_min_before(df, "o", "v", buckets=8).collect()
    }
    w = Window.orderBy("o").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["o"]: r["m"]
        for r in df.withColumn("m", F.min("v").over(w)).collect()
    }
    assert got == want
    assert got[0.0] is None


def test_single_bucket_degenerates_gracefully(spark):
    df = spark.createDataFrame([(1, 10), (2, 5), (3, 7)], "v long, id long")
    ranked, n = global_row_number(df, "v", ["id"], buckets=1)
    assert n == 3
    assert [r["rn"] for r in ranked.orderBy("v").collect()] == [1, 2, 3]


def test_equal_values_share_bucket_and_rank_by_tiebreak(spark):
    df = spark.createDataFrame(
        [(5, i) for i in range(50)] + [(1, 99), (9, 100)], "v long, id long"
    )
    ranked, n = global_row_number(df, "v", ["id"], buckets=8)
    rows = {r["id"]: r["rn"] for r in ranked.collect()}
    assert rows[99] == 1 and rows[100] == n
    assert sorted(rows[i] for i in range(50)) == list(range(2, 52))


def test_global_prefix_sums_exact_and_partition_invariant(spark):
    import random

    from vector_db_mvp_spark.operators.rank import global_prefix_sums

    rng = random.Random(7)
    vals = rng.sample(range(10_000), 500)
    rows = [(float(v), v % 5, (v * 7) % 3) for v in vals]
    df = spark.createDataFrame(rows, "v double, a long, b long")

    expected = {}
    ca = cb = 0
    for v, a, b in sorted(rows):
        ca += a
        cb += b
        expected[v] = (ca, cb)

    for parts, buckets in ((3, 8), (17, 64)):
        got = {
            r["v"]: (r["cum_a"], r["cum_b"])
            for r in global_prefix_sums(
                df.repartition(parts), "v", ["a", "b"], buckets=buckets
            ).collect()
        }
        assert got == expected


def test_bucket_expr_string_form_matches_column_form(spark):
    """r14: the string-name fast path of _bucket_expr (one F.expr parse)
    must bucket identically to the Column-algebra form, including values
    exactly on a boundary (strict > on both sides)."""
    from vector_db_mvp_spark.operators.rank import _bucket_expr

    df = spark.createDataFrame(
        [(float(v),) for v in (-3.0, -1.5, -1.5, 0.0, 0.25, 2.0, 7.5, 99.0)],
        "v double",
    )
    bounds = [-1.5, 0.25, 7.5]
    got = df.select(
        _bucket_expr("v", bounds).alias("s"),
        _bucket_expr(F.col("v"), bounds).alias("c"),
    ).collect()
    assert all(r["s"] == r["c"] for r in got)
    # no boundaries -> everything in bucket 0, both forms
    got0 = df.select(
        _bucket_expr("v", []).alias("s"), _bucket_expr(F.col("v"), []).alias("c")
    ).collect()
    assert all(r["s"] == 0 and r["c"] == 0 for r in got0)


def test_offset_lookup_matches_dict(spark):
    """r14: the dense-array offset lookup (one F.expr parse) must return
    exactly the dict value for every realized bucket id, including sparse
    bucket-id sets with gaps."""
    from vector_db_mvp_spark.operators.rank import _offset_lookup

    offsets = {0: 0, 1: 10, 3: 25, 6: 111}  # gaps at 2, 4, 5
    df = spark.createDataFrame([(b,) for b in offsets], "_gb int")
    got = {r["_gb"]: r["off"] for r in df.select(
        "_gb", _offset_lookup(offsets).alias("off")
    ).collect()}
    assert got == offsets
    # empty offsets -> constant 0
    z = df.select(_offset_lookup({}).alias("off")).collect()
    assert all(r["off"] == 0 for r in z)
