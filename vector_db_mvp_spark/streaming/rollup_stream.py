"""Streaming incremental rollup: continuously-maintained aggregate metrics.

The streaming twin of ``operators/rollup_state.py``: a ``foreachBatch``
handler folds each micro-batch's partial aggregate into the persisted
monoid state. Compared to a watermarked streaming aggregation
(streaming/windows.py), this keeps COMPLETE history (no state eviction —
the state is |groups|-sized, not |events|-sized) and the state table is
directly readable by the batch engine — the classic "streaming ingest,
batch serve" metrics architecture.

Exactly-once on top of foreachBatch's at-least-once: the handler keys the
RollupState marker by (stream run id, epoch id) — see
``streaming/replay.py``. Epoch ids alone are NOT a safe key: they restart
at 0 under a fresh checkpoint, so a new run over new source data would
collide with old markers and silently drop its first batches. With
run-scoped keys, a re-delivered epoch of the same checkpointed stream is a
no-op, while a genuinely new stream (fresh checkpoint = new query id)
applies all its batches — reprocessing the same source into the same state
under a fresh checkpoint is double-counting BY REQUEST, gated at the
source, not by marker collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.rollup_state import RollupState
from .replay import batch_key


class RollupIngest:
    """foreachBatch handler maintaining a rollup state table.

    ``checkpoint_dir`` scopes replay markers to the stream run; it is
    wired automatically by :func:`start_rollup_stream`.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        keys: list[str],
        value_col: str,
        checkpoint_dir: str | None = None,
    ):
        self.state = RollupState(spark, state_path, keys, value_col)
        self.keys = keys
        self.value_col = value_col
        self.checkpoint_dir = checkpoint_dir

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        key = batch_key(self.checkpoint_dir, batch_id)
        if not self.state.exists():
            # First batch initializes state; the batch id commits in the
            # same atomic pointer flip, so replays of epoch 0 are no-ops
            # even if the process dies right after init.
            self.state.init(batch.select(*self.keys, self.value_col), batch_id=key)
            return
        self.state.apply_batch(batch.select(*self.keys, self.value_col), key)

    def metrics(self) -> DataFrame:
        return self.state.metrics()


def start_rollup_stream(
    stream_df: DataFrame,
    handler: RollupIngest,
    *,
    checkpoint_dir: str,
    processing_time: str | None = None,
):
    """Wire a streaming DataFrame into the rollup state via foreachBatch.

    Default trigger is ``availableNow`` (drain-what-exists, deterministic —
    what the batch-equivalence tests use). Pass ``processing_time`` (e.g.
    ``"1 second"``) for a LIVE continuously-running stream; restarting from
    the same ``checkpoint_dir`` resumes exactly-once (the replay markers
    are keyed by the checkpoint's persistent query id — streaming/replay.py
    — so a re-delivered epoch after a crash/stop is a no-op while progress
    continues from the committed offsets)."""
    handler.checkpoint_dir = checkpoint_dir
    writer = (
        stream_df.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
