"""Kaplan-Meier conversion curve semantics pins (workload/relational.py
q_km_conversion_curve): hand-computed survival values on constructed
users, INCLUDING the right-censoring leg the synthetic corpus cannot
exercise (every corpus user purchases — the r10 realism-audit note)."""

from __future__ import annotations

import datetime as dt

from vector_db_mvp_spark.workload.relational import q_km_conversion_curve

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, tmp_path, rows):
    out = tmp_path / "km-events"
    spark.createDataFrame(
        [(u, e, BASE + dt.timedelta(hours=h)) for u, e, h in rows],
        "user_id long, event_type string, ts timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(out / "events.parquet")
    )
    return str(out)


def test_km_with_censored_user(spark, tmp_path):
    # A converts at +1h, B at +3.5h (floor 3), D at +3h, C NEVER converts
    # (views only; corpus horizon = C's last view at +10h -> censored).
    rows = [
        (1, "view", 0), (1, "purchase", 1),
        (2, "view", 0), (2, "purchase", 3.5),
        (3, "view", 0), (3, "view", 10),          # censored at t=10
        (4, "view", 0), (4, "purchase", 3),
    ]
    got = [tuple(r) for r in q_km_conversion_curve(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()]
    # t=1: n=4, d=1 -> S=0.75 ; t=3: n=3, d=2 -> S=0.75*(1/3)=0.25.
    # The censored user holds the at-risk count at 4 for t=1 and is NOT
    # an output row (d=0 at t=10).
    assert got == [(1, 4, 1, 0, 0.75), (3, 3, 2, 0, 0.25)]


def test_km_everyone_converts_hits_zero(spark, tmp_path):
    # Last event time has d = n_at_risk: survival must be EXACTLY 0.0
    # (the flag prefix, not ln(0)).
    rows = [
        (1, "view", 0), (1, "purchase", 1),
        (2, "view", 0), (2, "purchase", 2),
    ]
    got = [tuple(r) for r in q_km_conversion_curve(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()]
    assert got == [(1, 2, 1, 0, 0.5), (2, 1, 1, 0, 0.0)]
