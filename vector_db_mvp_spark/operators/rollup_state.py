"""Incremental aggregate maintenance: a persisted, merge-able rollup state
that absorbs new data in O(delta + |state|) — never by rescanning the
corpus.

The pattern behind every 100 TB "daily metrics" pipeline: keep the
aggregate's PARTIAL state (per-group count + exact decimal sum — both
commutative monoids), fold each arriving batch into it, and derive the
final metrics (count / sum / mean) from state at read time. A full
recompute over N days of history costs O(N·corpus); maintaining state
costs O(delta) per batch plus a |groups|-sized merge — and |groups| is
orders of magnitude smaller than the corpus.

Parity/robustness contract:
* state carries only order-independent partials (bigint count,
  decimal(28,2) sum), so merge order cannot change results and Spark ==
  DuckDB bit-for-bit;
* ``apply_batch`` is idempotent by batch id: each applied batch writes a
  ``_applied_<id>`` marker next to the state parquet (the
  streaming/neardup_stream.py replay-guard pattern) and replays become
  no-ops — exactly-once state folding on top of at-least-once delivery;
* state swaps are publish-then-rename (write to ``_tmp``, atomic rename),
  so a crashed apply never leaves a torn state table.

Scale: both sides of the merge are pre-aggregated before the union, so the
single shuffle moves |groups(delta)| + |groups(state)| rows, not raw data.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def aggregate_partial(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Collapse raw rows to merge-able partial state: (keys, n, s)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("s"),
    )


def merge_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Monoid merge of two partial states — one shuffle over group rows."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").cast("decimal(28,2)").alias("s"),
        )
    )


def finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Derive the user-facing metrics from partial state."""
    return state.select(
        *keys,
        F.col("n").alias("n_events"),
        F.col("s").cast("double").alias("sum_value"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("avg_value"),
    )


class RollupState:
    """Parquet-persisted rollup state with idempotent batch application."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str], value_col: str):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.value_col = value_col

    def _state_dir(self) -> str:
        return os.path.join(self.path, "state")

    def _marker(self, batch_id: str) -> str:
        return os.path.join(self.path, f"_applied_{batch_id}")

    def exists(self) -> bool:
        return os.path.exists(self._state_dir())

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self._state_dir())

    def init(self, df: DataFrame) -> None:
        os.makedirs(self.path, exist_ok=True)
        aggregate_partial(df, self.keys, self.value_col).write.mode(
            "overwrite"
        ).parquet(self._state_dir())

    def apply_marker_exists(self, batch_id: str) -> bool:
        return os.path.exists(self._marker(batch_id))

    def mark_applied(self, batch_id: str) -> None:
        with open(self._marker(batch_id), "w", encoding="utf-8") as f:
            f.write(batch_id)

    def apply_batch(self, batch: DataFrame, batch_id: str) -> bool:
        """Fold ``batch`` into state; returns False if ``batch_id`` was
        already applied (replay no-op)."""
        if self.apply_marker_exists(batch_id):
            return False
        delta = aggregate_partial(batch, self.keys, self.value_col)
        merged = merge_states(self.read(), delta, self.keys)
        tmp = self._state_dir() + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        old = self._state_dir() + "_old"
        os.rename(self._state_dir(), old)
        os.rename(tmp, self._state_dir())
        shutil.rmtree(old)
        self.mark_applied(batch_id)
        return True

    def metrics(self) -> DataFrame:
        return finalize(self.read(), self.keys)
