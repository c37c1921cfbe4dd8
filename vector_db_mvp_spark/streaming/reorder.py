"""Watermark reorder buffer: bounded out-of-order tolerance for in-order
streaming handlers.

Several ingest handlers here have an IN-ORDER contract across micro-batches
(streaming/cep_stream.py's automaton most prominently: a chain's validity
depends on what arrived before it). Real streams are not in-order — they
are *almost* in-order, with displacement bounded by network/partition lag.
The standard fix is the watermark reorder buffer (the same late-data model
as Structured Streaming's ``withWatermark``): hold events until the
watermark ``max(event_ts seen) − delay`` passes them, then release them
as a sorted prefix. Releases are monotone ts-prefixes by construction, so
the inner handler observes a fully in-order stream; any event displaced
by MORE than ``delay`` is released late (counted, not silently dropped —
it goes to a side sink for reconciliation, the same contract as
watermarked window aggregation discarding late rows).

Commit protocol mirrors RollupState: the buffer lives in versioned
directories with a single atomic pointer file carrying the watermark and
applied batch ids; the wrapper is idempotent on re-delivered epochs, and
the inner handler's own replay markers make the nested call a no-op if it
already ran.

State size: |events inside the delay window| — bounded by delay × arrival
rate, independent of stream lifetime.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .replay import batch_key


class ReorderBuffer:
    """Wrap an in-order foreachBatch handler with watermark reordering.

    ``inner`` is any callable ``(batch_df, batch_id) -> None`` with its own
    idempotent replay handling. ``late_path`` (optional) receives events
    that arrive below an already-advanced watermark (displacement > delay).
    """

    def __init__(
        self,
        spark: SparkSession,
        buffer_path: str,
        inner,
        *,
        delay: str = "INTERVAL 1 HOUR",
        ts_col: str = "ts",
        late_path: str | None = None,
        checkpoint_dir: str | None = None,
    ) -> None:
        self.spark = spark
        self.path = buffer_path
        self.inner = inner
        self.delay = delay
        self.ts = ts_col
        self.late_path = late_path
        self.checkpoint_dir = checkpoint_dir

    # -- pointer protocol (see operators/rollup_state.py) -----------------
    def _pointer(self) -> str:
        return os.path.join(self.path, "_current.json")

    def _read_pointer(self) -> dict | None:
        try:
            with open(self._pointer(), encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _commit(self, df: DataFrame, version: int, wm: str | None,
                applied: list[str]) -> None:
        dirname = f"buffer_v{version}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, dirname))
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {"dir": dirname, "wm": wm, "applied": sorted(set(applied))}, f
            )
        os.replace(tmp, self._pointer())
        keep = {dirname, f"buffer_v{version - 1}"}
        for name in os.listdir(self.path):
            if name.startswith("buffer_v") and name not in keep:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        key = batch_key(self.checkpoint_dir, batch_id)
        ptr = self._read_pointer()
        if ptr is not None and key in ptr["applied"]:
            return
        if batch.isEmpty() and ptr is None:
            return
        batch = batch.localCheckpoint(eager=True)

        if ptr is None:
            held = batch.limit(0)
            prev_wm, version, applied = None, -1, []
        else:
            held = self.spark.read.parquet(os.path.join(self.path, ptr["dir"]))
            prev_wm = ptr["wm"]
            version = int(ptr["dir"].rsplit("_v", 1)[1])
            applied = ptr["applied"]

        # Displacement beyond the delay: below the ALREADY-advanced
        # watermark — cannot be reordered anymore. Side-sink, don't drop.
        if prev_wm is not None:
            late = batch.filter(F.col(self.ts) <= F.lit(prev_wm))
            batch = batch.filter(F.col(self.ts) > F.lit(prev_wm))
            if self.late_path is not None:
                late.write.mode("append").parquet(self.late_path)

        pool = held.unionByName(batch)
        # Watermark monotone: max event ts seen (pool suffices — released
        # events are <= prev_wm <= any later watermark) minus delay.
        hi = pool.agg(
            F.max(F.col(self.ts) - F.expr(self.delay)).alias("w")
        ).collect()[0]["w"]
        new_wm = str(hi) if hi is not None else prev_wm
        if prev_wm is not None and (new_wm is None or new_wm < prev_wm):
            new_wm = prev_wm

        if new_wm is not None:
            release = pool.filter(F.col(self.ts) <= F.lit(new_wm))
            keep = pool.filter(F.col(self.ts) > F.lit(new_wm))
        else:
            release, keep = pool.limit(0), pool
        keep = keep.localCheckpoint(eager=True)  # pre-overwrite barrier

        # Inner first (its replay marker covers a crash between the two
        # commits: on re-delivery the release set recomputes identically
        # from the unflipped buffer pointer, and the inner run is a no-op).
        if not release.isEmpty():
            self.inner(release, batch_id)
        os.makedirs(self.path, exist_ok=True)
        self._commit(keep, version + 1, new_wm, [*applied, key])

    def flush(self, batch_id: int) -> None:
        """End-of-stream: release everything still held (watermark -> ∞)."""
        ptr = self._read_pointer()
        if ptr is None:
            return
        held = self.spark.read.parquet(os.path.join(self.path, ptr["dir"]))
        if not held.isEmpty():
            self.inner(held, batch_id)
        version = int(ptr["dir"].rsplit("_v", 1)[1])
        self._commit(held.limit(0), version + 1, ptr["wm"], ptr["applied"])
