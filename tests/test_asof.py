"""asof_join operator semantics: backward inclusive match, per-key isolation,
left-join NULLs vs inner, and determinism on equal-timestamp right rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.asof import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L1"), (1, _ts(20), "L2"), (2, _ts(15), "L3")],
        "user_id long, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100), (1, _ts(20), 200), (2, _ts(16), 300)],
        "user_id long, ts timestamp, rid long",
    )
    out = {
        r["lbl"]: (r["rid_right"], r["ts_right"])
        for r in asof_join(left, right, on="ts", by="user_id", right_cols=["rid"]).collect()
    }
    assert out["L1"] == (100, _ts(5))     # strictly before
    assert out["L2"] == (200, _ts(20))    # equal ts matches (inclusive)
    assert out["L3"] == (None, None)      # right row is AFTER left -> no match


def test_asof_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        [(1, _ts(1), "early"), (1, _ts(30), "late")],
        "user_id long, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 7)], "user_id long, ts timestamp, rid long"
    )
    rows = asof_join(
        left, right, on="ts", by="user_id", right_cols=["rid"], inner=True
    ).collect()
    assert [r["lbl"] for r in rows] == ["late"]


def test_asof_keys_isolated(spark):
    """A right row never leaks across `by` groups."""
    left = spark.createDataFrame(
        [(1, _ts(20), "a"), (2, _ts(20), "b")], "user_id long, ts timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 1)], "user_id long, ts timestamp, rid long"
    )
    out = {
        r["lbl"]: r["rid_right"]
        for r in asof_join(left, right, on="ts", by="user_id", right_cols=["rid"]).collect()
    }
    assert out == {"a": 1, "b": None}


def test_asof_equal_right_ts_deterministic(spark):
    """Two right rows at the identical (key, ts): the carried columns break
    the tie — the max payload wins, every run."""
    left = spark.createDataFrame(
        [(1, _ts(20), "x")], "user_id long, ts timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 5), (1, _ts(10), 9)], "user_id long, ts timestamp, rid long"
    )
    for _ in range(3):
        got = asof_join(
            left, right, on="ts", by="user_id", right_cols=["rid"]
        ).collect()[0]["rid_right"]
        assert got == 9


def test_asof_matches_duckdb_on_fixture(spark, sf_dir):
    """Cross-check the operator against DuckDB's native ASOF JOIN on the
    events fixture (the oracle the driver uses at sf0.01)."""
    import duckdb

    from vector_db_mvp_spark.workload.relational import (
        SQL_ASOF_PURCHASE_VIEW,
        q_asof_purchase_view,
    )

    got = {
        r["purchase_id"]: (r["view_id"], r["gap_sec"])
        for r in q_asof_purchase_view(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = {
        row[0]: (row[3], row[5])
        for row in con.execute(SQL_ASOF_PURCHASE_VIEW).fetchall()
    }
    assert got == want
