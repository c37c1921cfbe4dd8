"""A REAL processing-time trigger stream, end to end: start a live
rate-source rollup stream, let it commit micro-batches, stop it (the
in-process analog of a crash), restart from the SAME checkpoint, and
prove the resumed state is exactly-once correct.

Every other streaming test drives availableNow/manual foreachBatch for
determinism; this one covers the trigger/restart path itself (the
reference's always-on Temporal worker semantics, ST4/ST6 — VERDICT r5
task 7). The assertion is timing-independent: the rate source emits the
contiguous value sequence 0..N-1 (offsets checkpointed across restart),
so for WHATEVER N the run reached, the per-residue-class counts and sums
must equal their closed forms — any dropped batch, double-applied epoch,
or restart gap breaks the arithmetic identity.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.streaming.rollup_stream import (
    RollupIngest,
    start_rollup_stream,
)

K = 10  # residue classes


def _rate_stream(spark, rows_per_second: int = 2000):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            (F.col("value") % K).cast("string").alias("k"),
            F.col("value").cast("double").alias("v"),
        )
    )


def _await_batches(query, handler, min_rows: int, timeout: float = 180.0) -> None:
    # 180 s: a rate-stream micro-batch normally lands in seconds, but this
    # test shares the machine with whatever else CI runs — under full-core
    # contention 60 s produced rare spurious timeouts.
    """Wait until the persisted state covers at least ``min_rows`` source
    rows (i.e. some micro-batches actually committed)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if handler.state.exists():
            try:
                total = sum(r.n_events for r in handler.metrics().collect())
            except Exception:
                # Reader lagged past the one-version GC retention window
                # (state commits every 500 ms here) — re-resolve and retry;
                # the FINAL read below runs after stop() with no writer racing.
                time.sleep(0.2)
                continue
            if total >= min_rows:
                return
        time.sleep(0.5)
    pytest.fail(f"stream never committed {min_rows} rows within {timeout}s")


def _assert_exactly_once(handler) -> int:
    """State must equal the closed form for the contiguous range [0, N):
    residue class k holds count_k = |{v in [0,N) : v % K == k}| values whose
    sum is count_k*k + K*count_k*(count_k-1)/2."""
    rows = {r.k: (r.n_events, r.sum_value) for r in handler.metrics().collect()}
    n = sum(c for c, _ in rows.values())
    assert n > 0
    for k_str, (cnt, s) in rows.items():
        k = int(k_str)
        want_cnt = (n - 1 - k) // K + 1 if k < n else 0
        assert cnt == want_cnt, f"class {k}: count {cnt} != {want_cnt} (N={n})"
        want_sum = cnt * k + K * cnt * (cnt - 1) // 2
        assert float(s) == float(want_sum), f"class {k}: sum {s} != {want_sum}"
    return n


def test_processing_time_trigger_stop_and_resume(spark, tmp_path):
    state = str(tmp_path / "state")
    chk = str(tmp_path / "chk")

    # Phase 1: live stream on a processing-time trigger.
    h1 = RollupIngest(spark, state, ["k"], "v")
    q1 = start_rollup_stream(
        _rate_stream(spark), h1, checkpoint_dir=chk,
        processing_time="500 milliseconds",
    )
    try:
        assert q1.isActive
        _await_batches(q1, h1, min_rows=1000)
    finally:
        q1.stop()  # the kill
    q1.awaitTermination(30)
    n1 = _assert_exactly_once(h1)

    # Phase 2: resume from the SAME checkpoint — offsets continue from the
    # committed position (no gap, no re-count) and the persistent query id
    # keeps the replay markers of any re-delivered epoch effective.
    h2 = RollupIngest(spark, state, ["k"], "v")
    q2 = start_rollup_stream(
        _rate_stream(spark), h2, checkpoint_dir=chk,
        processing_time="500 milliseconds",
    )
    try:
        _await_batches(q2, h2, min_rows=n1 + 1000)
    finally:
        q2.stop()
    q2.awaitTermination(30)
    n2 = _assert_exactly_once(h2)
    assert n2 > n1, "resumed stream made no progress"
