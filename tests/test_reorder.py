"""Watermark reorder buffer (streaming/reorder.py): an out-of-order stream
through ReorderBuffer(CepIngest) must equal the one-shot batch CEP run, for
any arrival order with displacement bounded by the delay."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.cep import chain_matches
from vector_db_mvp_spark.streaming.cep_stream import CepIngest
from vector_db_mvp_spark.streaming.reorder import ReorderBuffer

BASE = dt.datetime(2024, 1, 1)
SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)

TAPE = [
    (1, 0, "click"), (1, 5, "view"), (1, 10, "click"), (2, 12, "view"),
    (1, 20, "purchase"), (1, 30, "view"), (2, 35, "click"), (1, 40, "click"),
    (2, 45, "purchase"), (1, 50, "purchase"), (1, 55, "purchase"),
    (2, 60, "view"), (2, 70, "click"), (2, 80, "purchase"),
]


def _rows(events):
    return [
        (i, BASE + dt.timedelta(minutes=m), u, t, 0.0, "{}")
        for i, (u, m, t) in enumerate(events)
    ]


def _expected(spark):
    ev = spark.createDataFrame(_rows(TAPE), SCHEMA)
    return sorted(
        map(tuple, chain_matches(
            ev, stages=("view", "click", "purchase"), hop="INTERVAL 1 HOUR"
        ).collect())
    )


def _run_scrambled(spark, tmp_path, tag, seed, n_batches, max_disp_minutes):
    rows = _rows(TAPE)
    rng = random.Random(seed)
    # Bounded scramble: sort by ts + a displacement < max_disp; then split.
    scrambled = sorted(
        rows, key=lambda r: (r[1] + dt.timedelta(
            minutes=rng.uniform(0, max_disp_minutes)), r[0])
    )
    cuts = sorted(rng.sample(range(1, len(rows)), n_batches - 1))
    bounds = [0, *cuts, len(rows)]
    inner = CepIngest(
        spark,
        str(tmp_path / f"state_{tag}"),
        str(tmp_path / f"matches_{tag}"),
        stages=("view", "click", "purchase"),
        hop="INTERVAL 1 HOUR",
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
    )
    buf = ReorderBuffer(
        spark,
        str(tmp_path / f"buffer_{tag}"),
        inner,
        delay=f"INTERVAL {max_disp_minutes} MINUTES",
        late_path=str(tmp_path / f"late_{tag}"),
    )
    for bid, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        buf(spark.createDataFrame(scrambled[lo:hi], SCHEMA), bid)
    buf.flush(10_000)
    return sorted(map(tuple, inner.matches().collect()))


def test_out_of_order_stream_equals_batch(spark, tmp_path):
    expected = _expected(spark)
    assert len(expected) >= 5
    for tag, (seed, n_batches, disp) in enumerate(
        [(3, 4, 15), (11, 3, 25), (42, 5, 8)]
    ):
        got = _run_scrambled(spark, tmp_path, tag, seed, n_batches, disp)
        assert got == expected, (seed, n_batches, disp)


def test_replay_is_noop(spark, tmp_path):
    rows = _rows(TAPE)
    inner = CepIngest(
        spark, str(tmp_path / "st"), str(tmp_path / "ma"),
        stages=("view", "click", "purchase"), hop="INTERVAL 1 HOUR",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    buf = ReorderBuffer(
        spark, str(tmp_path / "bu"), inner, delay="INTERVAL 10 MINUTES"
    )
    buf(spark.createDataFrame(rows[:8], SCHEMA), 0)
    buf(spark.createDataFrame(rows[8:], SCHEMA), 1)
    buf.flush(99)
    once = sorted(map(tuple, inner.matches().collect()))
    buf(spark.createDataFrame(rows[8:], SCHEMA), 1)  # re-delivery
    assert sorted(map(tuple, inner.matches().collect())) == once


def test_beyond_delay_events_go_to_late_sink(spark, tmp_path):
    rows = _rows(TAPE)
    inner = CepIngest(
        spark, str(tmp_path / "st2"), str(tmp_path / "ma2"),
        stages=("view", "click", "purchase"), hop="INTERVAL 1 HOUR",
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    late_path = str(tmp_path / "late2")
    buf = ReorderBuffer(
        spark, str(tmp_path / "bu2"), inner,
        delay="INTERVAL 5 MINUTES", late_path=late_path,
    )
    buf(spark.createDataFrame(rows[8:], SCHEMA), 0)  # advances wm far
    buf(spark.createDataFrame(rows[:3], SCHEMA), 1)  # hopelessly late
    late = spark.read.parquet(late_path)
    assert late.count() == 3
    assert late.filter(F.col("event_id").isin(0, 1, 2)).count() == 3
