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
* ``apply_batch`` is idempotent by batch id, and the marker set COMMITS
  ATOMICALLY WITH THE STATE: each apply writes the merged state to a fresh
  versioned directory (``state_v<n>``), then flips a single pointer file
  (``_current.json`` — carrying both the live directory name and the full
  applied-batch-id set) with one atomic ``os.replace`` (the
  storage/store.py EntityStore pattern). A crash at ANY point leaves
  either the old (state, markers) pair or the new one — never a missing
  state dir, never a state without its marker (which would double-apply on
  retry), never a marker without its state (which would drop the batch);
* superseded version directories are garbage-collected best-effort after
  the flip; leftovers from a crash are unreferenced and reclaimed by the
  next successful commit.

Scale: both sides of the merge are pre-aggregated before the union, so the
single shuffle moves |groups(delta)| + |groups(state)| rows, not raw data.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def source_fingerprint(path: str) -> str:
    """Content fingerprint of a source table directory (or single file):
    md5 over the sorted (relative name, size, mtime_ns) of every data file.

    Persisted monoid state is keyed by source path + a version tag; if the
    fixture data at that path is ever REGENERATED, a path-only key would
    silently merge rows from the old generation into the new state and
    break oracle parity. Folding the data files' identity into the key
    makes regeneration start a fresh state lineage instead.
    """
    import hashlib

    entries = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for name in sorted(files):
                if name.startswith(("_", ".")):
                    continue
                p = os.path.join(root, name)
                st = os.stat(p)
                entries.append(
                    (os.path.relpath(p, path), st.st_size, st.st_mtime_ns)
                )
    elif os.path.exists(path):
        st = os.stat(path)
        entries.append((os.path.basename(path), st.st_size, st.st_mtime_ns))
    entries.sort()
    return hashlib.md5(repr(entries).encode()).hexdigest()[:12]


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
    """Parquet-persisted rollup state with idempotent batch application.

    Commit protocol: state lives in versioned directories
    ``<path>/state_v<n>``; ``<path>/_current.json`` holds
    ``{"dir": "state_v<n>", "applied": [batch ids...]}`` and is the ONLY
    commit point — flipped with a single atomic ``os.replace``, so the
    live state and its applied-marker set change together or not at all.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        value_col: str | None,
        *,
        partial_fn=None,
        merge_fn=None,
    ):
        """Default monoid is the (count, decimal-sum) rollup. Any other
        commutative monoid plugs in via ``partial_fn(raw_df) -> state_df``
        and ``merge_fn(state_df, state_df) -> state_df`` (e.g. the KMV
        min-k state in streaming/sketch_stream.py) — the versioned-pointer
        commit protocol, idempotent batch markers, and GC are monoid-
        independent."""
        self.spark = spark
        self.path = path
        self.keys = keys
        self.value_col = value_col
        if partial_fn is None and value_col is None:
            raise ValueError(
                "RollupState: value_col is required when partial_fn is omitted "
                "(the default monoid aggregates value_col)"
            )
        self._partial = partial_fn or (
            lambda df: aggregate_partial(df, keys, value_col)
        )
        self._merge = merge_fn or (lambda a, b: merge_states(a, b, keys))

    def _pointer(self) -> str:
        return os.path.join(self.path, "_current.json")

    def _read_pointer(self) -> dict | None:
        try:
            with open(self._pointer(), encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _commit(self, df: DataFrame, version: int, applied: list[str]) -> None:
        """Write ``df`` as ``state_v<version>`` then atomically flip the
        pointer to (that dir, ``applied``). Crash before the flip leaves
        the previous commit fully intact and the new dir unreferenced."""
        dirname = f"state_v{version}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, dirname))
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"dir": dirname, "applied": sorted(set(applied))}, f)
        os.replace(tmp, self._pointer())  # atomic state+marker commit
        # Best-effort GC of superseded versions and any pre-pointer-era
        # layout ("state"/"state_old"/"state_tmp" dirs, _applied_* files).
        # RETENTION: keep the immediately-preceding version too. A concurrent
        # reader (streaming-ingest/batch-serve) that resolved the pointer
        # just before this flip may still be scanning v<N-1>'s files;
        # deleting them mid-read fails that read (caught live by
        # tests/test_live_trigger.py). One retained version covers any
        # reader that started within the last commit interval — the same
        # reader-vs-GC contract as a table format's retention period.
        keep = {dirname, f"state_v{version - 1}"}
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if name not in keep and (
                name == "state" or name.startswith(("state_v", "state_old", "state_tmp"))
            ):
                shutil.rmtree(full, ignore_errors=True)
            elif name.startswith("_applied_"):
                try:
                    os.remove(full)
                except OSError:
                    pass

    def exists(self) -> bool:
        return self._read_pointer() is not None

    def read(self) -> DataFrame:
        ptr = self._read_pointer()
        if ptr is None:
            raise FileNotFoundError(f"no committed rollup state at {self.path}")
        return self.spark.read.parquet(os.path.join(self.path, ptr["dir"]))

    def init(self, df: DataFrame, batch_id: str | None = None) -> None:
        """Initialize state from ``df``; when ``batch_id`` is given it is
        recorded in the same atomic commit, so a replay of the initializing
        batch is a no-op even if the process dies right after init."""
        os.makedirs(self.path, exist_ok=True)
        self._commit(
            self._partial(df),
            0,
            [batch_id] if batch_id is not None else [],
        )

    def apply_marker_exists(self, batch_id: str) -> bool:
        ptr = self._read_pointer()
        return ptr is not None and batch_id in ptr["applied"]

    def mark_applied(self, batch_id: str) -> None:
        """Record ``batch_id`` as applied against the CURRENT state (atomic
        pointer rewrite). Prefer passing ``batch_id`` to :meth:`init` /
        :meth:`apply_batch`, which commit marker and state together."""
        ptr = self._read_pointer()
        if ptr is None:
            raise FileNotFoundError(f"no committed rollup state at {self.path}")
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {"dir": ptr["dir"], "applied": sorted(set(ptr["applied"]) | {batch_id})},
                f,
            )
        os.replace(tmp, self._pointer())

    def apply_batch(self, batch: DataFrame, batch_id: str) -> bool:
        """Fold ``batch`` into state; returns False if ``batch_id`` was
        already applied (replay no-op)."""
        ptr = self._read_pointer()
        if ptr is None:
            raise FileNotFoundError(f"no committed rollup state at {self.path}")
        if batch_id in ptr["applied"]:
            return False
        delta = self._partial(batch)
        merged = self._merge(self.read(), delta)
        version = int(ptr["dir"].rsplit("_v", 1)[1]) + 1
        self._commit(merged, version, [*ptr["applied"], batch_id])
        return True

    def metrics(self) -> DataFrame:
        return finalize(self.read(), self.keys)
