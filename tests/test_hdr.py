"""HDR mergeable quantile sketch (operators/hdr.py): Spark/DuckDB bin
parity against a pure-python reference, merge==batch monoid law, rank
semantics, and the error bound the docstring promises. The driver-gate
oracle leg lives in test_queries_oracle.py."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.hdr import (
    bucket_expr,
    bounds_exprs,
    hdr_merge,
    hdr_quantiles,
    hdr_state,
    sql_bucket_expr,
)


def _ref_bucket(v: int) -> int:
    if v < 16:
        return v
    s = max(v.bit_length() - 5, 0)
    return s * 16 + (v >> s)


def _ref_bounds(b: int) -> tuple[int, int]:
    if b < 16:
        return b, b
    k = b // 16 - 1
    mant = b - 16 * (b // 16) + 16
    return mant << k, ((mant + 1) << k) - 1


VALS = (
    list(range(1, 70))
    + [127, 128, 129, 255, 256, 1023, 1024, 12345, 999_999, 10**9, 10**12, (1 << 40) + 7]
)


def test_spark_buckets_and_bounds_match_reference(spark):
    df = spark.createDataFrame([(v,) for v in VALS], "v long")
    got = {
        r["v"]: (r["b"], r["lo"], r["hi"])
        for r in df.selectExpr(
            "v",
            f"{bucket_expr('v')} AS b",
            f"{bounds_exprs(bucket_expr('v'))[0]} AS lo",
            f"{bounds_exprs(bucket_expr('v'))[1]} AS hi",
        ).collect()
    }
    for v in VALS:
        b = _ref_bucket(v)
        lo, hi = _ref_bounds(b)
        assert got[v] == (b, lo, hi), (v, got[v], (b, lo, hi))
        assert lo <= v <= hi  # containment
        if v >= 16:
            assert (hi - lo) <= lo / 8  # <= 6.25% relative half-width x2


def test_duckdb_buckets_match_spark(spark):
    con = duckdb.connect()
    du = dict(
        con.execute(
            f"SELECT v, {sql_bucket_expr('v')} FROM (SELECT UNNEST({VALS}) AS v)"
        ).fetchall()
    )
    con.close()
    for v in VALS:
        assert du[v] == _ref_bucket(v)


def test_merge_equals_batch(spark):
    df = spark.createDataFrame(
        [(i % 3, (i * 37) % 5000 + 1) for i in range(2000)], "g int, v long"
    )
    full = hdr_state(df, "g", "v")
    a = hdr_state(df.filter("v % 2 = 0"), "g", "v")
    b = hdr_state(df.filter("v % 2 = 1"), "g", "v")
    merged = hdr_merge(a, b, "g")
    key = lambda rows: sorted((r["g"], r["bucket"], r["cnt"]) for r in rows)
    assert key(merged.collect()) == key(full.collect())


def test_quantile_rank_semantics_and_error_bound(spark):
    import random

    rng = random.Random(7)
    vals = [rng.randrange(1, 1_000_000) for _ in range(5000)]
    df = spark.createDataFrame([(1, v) for v in vals], "g int, v long")
    out = {
        r["q"]: r
        for r in hdr_quantiles(df, "g", "v", [0.5, 0.9, 0.99]).collect()
    }
    import math

    s = sorted(vals)
    for q, row in out.items():
        # percentile_disc target: value at rank ceil(q*n)
        exact = s[math.ceil(q * len(s)) - 1]
        assert row["lo"] <= exact <= row["hi"], (q, exact, row)
        assert row["cum_count"] >= math.ceil(q * row["n"])
        # relative error bound on the reported range
        assert (row["hi"] - row["lo"]) <= max(1, row["lo"] / 8)


def test_state_is_bounded(spark):
    df = spark.createDataFrame(
        [(1, v) for v in range(1, 50001)], "g int, v long"
    )
    n_buckets = hdr_state(df, "g", "v").count()
    # 50k distinct values -> bit lengths 1..16 -> at most ~16*12 buckets
    assert n_buckets <= 16 * 16
