"""range_join_binned: inclusive boundaries, intervals spanning multiple bins,
no duplicate matches, and empty results when nothing overlaps."""

from __future__ import annotations

import datetime as dt

from vector_db_mvp_spark.operators.rangejoin import range_join_binned


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=sec)


def _frames(spark, points, intervals):
    p = spark.createDataFrame(points, "pt_id long, pt_ts timestamp")
    i = spark.createDataFrame(intervals, "iv_id long, lo timestamp, hi timestamp")
    return p, i


def test_inclusive_bounds_and_exclusion(spark):
    p, i = _frames(
        spark,
        [(1, _ts(100)), (2, _ts(200)), (3, _ts(201))],
        [(10, _ts(100), _ts(200))],  # [100, 200] inclusive both ends
    )
    got = sorted(
        r["pt_id"]
        for r in range_join_binned(
            p, i, point_col="pt_ts", lo_col="lo", hi_col="hi", bin_width_seconds=60
        ).collect()
    )
    assert got == [1, 2]  # 201 excluded, bounds included


def test_interval_spanning_many_bins_no_duplicates(spark):
    """An interval covering many bins matches each point exactly once (a
    point lives in one bin, so no dedup pass is needed)."""
    p, i = _frames(
        spark,
        [(n, _ts(n * 50)) for n in range(10)],        # points at 0..450s
        [(99, _ts(0), _ts(450))],                      # one interval, 8 bins
    )
    rows = range_join_binned(
        p, i, point_col="pt_ts", lo_col="lo", hi_col="hi", bin_width_seconds=60
    ).collect()
    assert sorted(r["pt_id"] for r in rows) == list(range(10))  # once each


def test_disjoint_is_empty(spark):
    p, i = _frames(spark, [(1, _ts(0))], [(10, _ts(1000), _ts(2000))])
    assert (
        range_join_binned(
            p, i, point_col="pt_ts", lo_col="lo", hi_col="hi", bin_width_seconds=600
        ).count()
        == 0
    )


def test_plan_is_equi_join_not_nested_loop(spark):
    """The whole point: the physical plan must hash-join on the bin key, not
    BroadcastNestedLoopJoin the inequality."""
    p, i = _frames(spark, [(1, _ts(0))], [(10, _ts(0), _ts(100))])
    df = range_join_binned(
        p, i, point_col="pt_ts", lo_col="lo", hi_col="hi", bin_width_seconds=60
    )
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
