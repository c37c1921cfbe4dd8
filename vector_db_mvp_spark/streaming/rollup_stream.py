"""Streaming incremental rollup: continuously-maintained aggregate metrics.

The streaming twin of ``operators/rollup_state.py``: a ``foreachBatch``
handler folds each micro-batch's partial aggregate into the persisted
monoid state. Compared to a watermarked streaming aggregation
(streaming/windows.py), this keeps COMPLETE history (no state eviction —
the state is |groups|-sized, not |events|-sized) and the state table is
directly readable by the batch engine — the classic "streaming ingest,
batch serve" metrics architecture.

Exactly-once on top of foreachBatch's at-least-once: the handler keys the
RollupState marker by ``batch_id`` (the epoch id Spark passes to
foreachBatch, stable across replays of the same epoch), so a replayed
micro-batch is a no-op — the same pattern streaming/neardup_stream.py uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.rollup_state import RollupState


class RollupIngest:
    """foreachBatch handler maintaining a rollup state table."""

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        keys: list[str],
        value_col: str,
    ):
        self.state = RollupState(spark, state_path, keys, value_col)
        self.keys = keys
        self.value_col = value_col

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if not self.state.exists():
            # First batch initializes state; later replays of epoch 0 must
            # still be no-ops, so mark it applied like any other batch.
            if self.state.apply_marker_exists(str(batch_id)):
                return
            self.state.init(batch.select(*self.keys, self.value_col))
            self.state.mark_applied(str(batch_id))
            return
        self.state.apply_batch(
            batch.select(*self.keys, self.value_col), str(batch_id)
        )

    def metrics(self) -> DataFrame:
        return self.state.metrics()


def start_rollup_stream(
    stream_df: DataFrame,
    handler: RollupIngest,
    *,
    checkpoint_dir: str,
):
    """Wire a streaming DataFrame into the rollup state via foreachBatch."""
    return (
        stream_df.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
