"""Streaming rollup maintenance (streaming/rollup_stream.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.rollup_state import aggregate_partial, finalize
from vector_db_mvp_spark.streaming.rollup_stream import (
    RollupIngest,
    start_rollup_stream,
)


@pytest.fixture()
def source_dir(spark, tmp_path):
    """Three parquet files -> three micro-batches (maxFilesPerTrigger=1)."""
    src = tmp_path / "src"
    rows = [
        [("a", 1.0), ("b", 2.0)],
        [("a", 3.0), ("c", 4.0)],
        [("b", 5.0)],
    ]
    for i, batch in enumerate(rows):
        spark.createDataFrame(batch, "k string, value double").coalesce(
            1
        ).write.parquet(str(src / f"f{i}"))
    return src


def _run(spark, tmp_path, source_dir, state_name="state", chk="chk"):
    stream = (
        spark.readStream.schema("k string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(source_dir) + "/*")
    )
    handler = RollupIngest(spark, str(tmp_path / state_name), ["k"], "value")
    q = start_rollup_stream(stream, handler, checkpoint_dir=str(tmp_path / chk))
    q.awaitTermination(120)
    return handler


def test_streamed_state_equals_batch_recompute(spark, tmp_path, source_dir):
    handler = _run(spark, tmp_path, source_dir)
    got = {r.k: (r.n_events, r.sum_value) for r in handler.metrics().collect()}
    full = spark.read.parquet(str(source_dir) + "/*")
    want = {
        r.k: (r.n_events, r.sum_value)
        for r in finalize(aggregate_partial(full, ["k"], "value"), ["k"]).collect()
    }
    assert got == want


def test_restart_with_same_checkpoint_is_noop(spark, tmp_path, source_dir):
    h1 = _run(spark, tmp_path, source_dir)
    before = sorted(map(tuple, h1.metrics().collect()))
    # Same checkpoint: no new files -> no batches -> state unchanged.
    h2 = _run(spark, tmp_path, source_dir)
    assert sorted(map(tuple, h2.metrics().collect())) == before


def test_same_run_epoch_replay_is_noop(spark, tmp_path, source_dir):
    """foreachBatch's at-least-once: re-delivering an epoch of the SAME
    checkpointed run hits its (run id, epoch) marker and is a no-op."""
    handler = _run(spark, tmp_path, source_dir)
    before = sorted(map(tuple, handler.metrics().collect()))
    replay = spark.read.parquet(str(source_dir) + "/f0")
    handler(replay, 0)  # same handler -> same run key -> marker blocks
    assert sorted(map(tuple, handler.metrics().collect())) == before


def test_fresh_checkpoint_is_a_new_run_not_a_collision(spark, tmp_path, source_dir):
    """A FRESH checkpoint is a new stream identity: its epochs 0..2 must
    NOT collide with the old run's markers (epoch-only keys silently
    dropped the new run's first batches — data loss). Re-streaming the
    same source into the same state therefore counts again, by request;
    gating re-ingestion of old data belongs at the source, not to marker
    collisions."""
    h1 = _run(spark, tmp_path, source_dir, chk="chk1")
    first = {r.k: (r.n_events, r.sum_value) for r in h1.metrics().collect()}
    h2 = _run(spark, tmp_path, source_dir, chk="chk2")  # same state dir
    doubled = {r.k: (r.n_events, r.sum_value) for r in h2.metrics().collect()}
    assert doubled == {
        k: (2 * n, 2 * s) for k, (n, s) in first.items()
    }
