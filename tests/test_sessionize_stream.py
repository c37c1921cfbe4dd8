"""Streaming session assembly (streaming/sessionize_stream.py,
transformWithStateInPandas): completed sessions match the batch
gap-sessionization, closed either by in-batch gap-split or by event-time
timer."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_db_mvp_spark.sources.testdata import load_table
from vector_db_mvp_spark.streaming.sessionize_stream import sessionize_stream

GAP_MIN = 30
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _run_stream(spark, tmp_path, file_batches, gap="30 minutes", watermark="1 minute"):
    """Write each batch of (user_id, ts) rows as its own file; stream with
    maxFilesPerTrigger=1 so batches process in order (timers fire as the
    watermark advances batch-over-batch)."""
    src = tmp_path / "events_in"
    src.mkdir()
    for i, rows in enumerate(file_batches):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    q = (
        sessionize_stream(stream, gap=gap, watermark=watermark)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }


def _ms(t: dt.datetime) -> int:
    return int(t.timestamp() * 1000)


def test_gap_split_and_timer_close(spark, tmp_path):
    # user 1: two events 10 min apart (one session), then an event 10 h
    # later in a second file -> session 1 closes by GAP-SPLIT when the
    # late event arrives. user 2: one event, never seen again -> that
    # session can only close by TIMER once the watermark (driven by the
    # 10-h-later file) passes its gap.
    batch1 = [(1, _mins(0)), (1, _mins(10)), (2, _mins(5))]
    batch2 = [(1, _mins(600))]
    got = _run_stream(spark, tmp_path, [batch1, batch2])
    assert (1, _ms(_mins(0)), _ms(_mins(10)), 2) in got  # gap-split
    assert (2, _ms(_mins(5)), _ms(_mins(5)), 1) in got  # timer
    # the open tail session (user 1 @ +600min) must NOT be emitted
    assert not any(u == 1 and s == _ms(_mins(600)) for u, s, _, _ in got)


def test_session_extension_rearms_timer(spark, tmp_path):
    # events 20 min apart (< gap) across two files: ONE session; the timer
    # from file 1 must not close it mid-extension. A third file far in the
    # future advances the watermark so the merged session closes by timer.
    got = _run_stream(
        spark,
        tmp_path,
        [[(7, _mins(0))], [(7, _mins(20))], [(9, _mins(2000))]],
    )
    assert (7, _ms(_mins(0)), _ms(_mins(20)), 2) in got
    # no split single-event sessions for user 7
    assert not any(u == 7 and n == 1 for u, _, _, n in got)


def test_matches_batch_sessionization_on_fixture(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    rows = [(r["user_id"], r["ts"]) for r in events.collect()]
    got = _run_stream(spark, tmp_path, [rows], watermark="0 seconds")

    # batch twin: same gap rule via lag + cumulative sum, one row per session
    w = Window.partitionBy("user_id").orderBy("ts")
    batch = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_millis("ts") - F.unix_millis("prev_ts")
                    > GAP_MIN * 60 * 1000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "seq",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "seq")
        .agg(
            F.unix_millis(F.min("ts")).alias("session_start_ms"),
            F.unix_millis(F.max("ts")).alias("session_end_ms"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    expected_all = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in batch.collect()
    }
    # every emitted session is a real batch session (boundaries + count
    # exact); sessions still open at the final watermark may be withheld
    assert got <= expected_all
    # tail sessions (each user's last) are the only ones allowed missing
    last_per_user = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in batch.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("session_end_ms"))
            ),
        )
        .filter("rk = 1")
        .collect()
    }
    assert expected_all - got <= last_per_user
    assert len(got) > 0
