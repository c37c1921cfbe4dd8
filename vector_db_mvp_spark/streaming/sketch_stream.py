"""Streaming Count-Min-sketch maintenance: a frequency sketch kept current
over an unbounded stream, served by the batch engine.

The streaming member of the sketch family (operators/sketch.py): each
micro-batch's (r, h) increment rows fold into a persisted depth x width
counter table via the same versioned-pointer monoid state as the metrics
rollup (operators/rollup_state.py — counters are counts, a commutative
monoid, so merge order cannot change estimates). State is bounded at
depth x width rows FOREVER, regardless of stream volume or vocabulary —
the property that makes a frequency sketch the right shape for "what are
the hot tokens/URLs/users right now" over a 100 TB/day stream, where an
exact per-value count table grows without bound.

Exactly-once on top of foreachBatch's at-least-once: markers are keyed by
(stream run id, epoch id) — see streaming/replay.py; a re-delivered epoch
of the same checkpointed run is a no-op, while a genuinely new run (fresh
checkpoint = new query id) applies all its batches.

Estimates read the SAME code path as the one-shot batch sketch
(cms_topk_from_counters), so a maintained sketch and a from-scratch batch
sketch over the same rows are bit-identical — pinned by
tests/test_sketch_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rollup_state import RollupState
from ..operators.sketch import cms_counter_delta, cms_topk_from_counters, cms_values
from .replay import batch_key


class CmsIngest:
    """foreachBatch handler maintaining a persisted CM-sketch counter table.

    ``checkpoint_dir`` scopes replay markers to the stream run; wired
    automatically by :func:`start_cms_stream`.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        value_col: str,
        *,
        depth: int = 4,
        width: int = 1024,
        checkpoint_dir: str | None = None,
    ):
        # Counter = the state's per-key count; the value column is a
        # constant the sum monoid ignores semantically (kept because the
        # rollup state schema carries (n, s)).
        self.state = RollupState(spark, state_path, ["r", "h"], "_one")
        self.value_col = value_col
        self.depth = depth
        self.width = width
        self.checkpoint_dir = checkpoint_dir

    def _delta(self, batch: DataFrame) -> DataFrame:
        vals = cms_values(batch, self.value_col)
        return cms_counter_delta(vals, depth=self.depth, width=self.width).withColumn(
            "_one", F.lit(1.0)
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        key = batch_key(self.checkpoint_dir, batch_id)
        delta = self._delta(batch)
        if not self.state.exists():
            self.state.init(delta, batch_id=key)
            return
        self.state.apply_batch(delta, key)

    def counters(self) -> DataFrame:
        """(r, h, c) counter table from the committed state."""
        return self.state.read().select("r", "h", F.col("n").alias("c"))

    def estimate_topk(self, candidates: DataFrame, value_col: str, k: int) -> DataFrame:
        """Top-k frequency estimates for the candidate values against the
        maintained counters — same code path as the batch sketch."""
        return cms_topk_from_counters(
            self.counters(),
            cms_values(candidates, value_col),
            depth=self.depth,
            width=self.width,
            k=k,
        )


class KmvIngest:
    """foreachBatch handler maintaining per-group KMV distinct-count state.

    The min-k monoid twin of :class:`CmsIngest`: state is the <= k
    smallest distinct hashes per group (bounded at k rows per group
    forever), merged across batches with set semantics, committed through
    the same versioned-pointer protocol with run-scoped replay markers.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        group_col: str,
        value_col: str,
        *,
        k: int = 64,
        checkpoint_dir: str | None = None,
    ):
        from ..operators.sketch import kmv_merge, kmv_state_rows

        self.group_col = group_col
        self.value_col = value_col
        self.k = k
        self.checkpoint_dir = checkpoint_dir
        self.state = RollupState(
            spark,
            state_path,
            [group_col, "h"],
            None,
            partial_fn=lambda df: kmv_state_rows(df, group_col, value_col, k),
            merge_fn=lambda a, b: kmv_merge(a, b, group_col, k),
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        key = batch_key(self.checkpoint_dir, batch_id)
        if not self.state.exists():
            self.state.init(batch, batch_id=key)
            return
        self.state.apply_batch(batch, key)

    def estimates(self) -> DataFrame:
        """(group, k_used, distinct_estimate) from the committed state —
        bit-identical to the one-shot batch sketch over the same rows."""
        from ..operators.sketch import kmv_estimate_from_state

        return kmv_estimate_from_state(self.state.read(), self.group_col, self.k)


def start_cms_stream(
    stream_df: DataFrame,
    handler: CmsIngest,
    *,
    checkpoint_dir: str,
):
    """Wire a streaming DataFrame into the sketch state via foreachBatch."""
    handler.checkpoint_dir = checkpoint_dir
    return (
        stream_df.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


class HllIngest:
    """foreachBatch handler maintaining per-group HyperLogLog register
    state (operators/hll.py).

    The register-max monoid member of the sketch family: state is the
    per-(group, register) max rho — at most 256 rows per group forever —
    merged across batches with MAX (associative, commutative, idempotent,
    so at-least-once redelivery cannot inflate it even WITHOUT the replay
    markers; they are kept for protocol uniformity). Estimates read the
    committed state through the same integer-scaled estimator as the
    one-shot batch sketch, so maintained and from-scratch sketches are
    bit-identical.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        group_col: str,
        value_col: str,
        *,
        checkpoint_dir: str | None = None,
    ):
        from ..operators.hll import hll_merge, hll_state_rows

        self.group_col = group_col
        self.value_col = value_col
        self.checkpoint_dir = checkpoint_dir
        self.state = RollupState(
            spark,
            state_path,
            [group_col, "reg"],
            None,
            partial_fn=lambda df: hll_state_rows(df, group_col, value_col),
            merge_fn=lambda a, b: hll_merge(a, b, group_col),
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        key = batch_key(self.checkpoint_dir, batch_id)
        if not self.state.exists():
            self.state.init(batch, batch_id=key)
            return
        self.state.apply_batch(batch, key)

    def estimates(self) -> DataFrame:
        """(group, registers_hit, distinct_estimate) from committed state."""
        from ..operators.hll import hll_estimate_from_state

        return hll_estimate_from_state(self.state.read(), self.group_col).orderBy(
            self.group_col
        )


class HdrIngest:
    """foreachBatch handler maintaining per-group HDR quantile-sketch
    state (operators/hdr.py).

    The bucket-count-sum member of the sketch family: state is
    (group, bucket, cnt) — bounded at ~16 * 64 rows per group forever —
    merged across batches with SUM (associative and commutative; NOT
    idempotent, so the run-scoped replay markers carry exactly-once here,
    as with CmsIngest). Quantile reads walk the committed state's
    cumulative counts through the same extraction as the one-shot batch
    sketch, so maintained and from-scratch sketches are bit-identical.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        group_col: str,
        value_sql: str,
        *,
        checkpoint_dir: str | None = None,
    ):
        from ..operators.hdr import hdr_merge, hdr_state

        self.group_col = group_col
        self.value_sql = value_sql
        self.checkpoint_dir = checkpoint_dir
        self.state = RollupState(
            spark,
            state_path,
            [group_col, "bucket"],
            None,
            partial_fn=lambda df: hdr_state(df, group_col, value_sql),
            merge_fn=lambda a, b: hdr_merge(a, b, group_col),
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        key = batch_key(self.checkpoint_dir, batch_id)
        if not self.state.exists():
            self.state.init(batch, batch_id=key)
            return
        self.state.apply_batch(batch, key)

    def quantiles(self, quantiles: list[float]) -> DataFrame:
        """(group, q, bucket, lo, hi, cum_count, n) from committed state."""
        from ..operators.hdr import hdr_quantiles_from_state

        return hdr_quantiles_from_state(
            self.state.read(), self.group_col, quantiles
        )
