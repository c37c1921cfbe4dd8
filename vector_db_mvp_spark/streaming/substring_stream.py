"""Streaming EXACT-SUBSTRING ingestion gate: per-micro-batch incremental
verbatim-span dedup — the ExactSubstr (Lee et al. ACL'22) member of the
streaming gate family, beside the byte-identical gate
(``dedup_stream.dedup_stream_exact``) and the MinHash near-dup gate
(``neardup_stream.NearDupIngest``): it stops documents sharing a verbatim
token span of >= L tokens with anything already stored — templated
boilerplate with long copied passages that is neither byte-identical nor
necessarily high-Jaccard.

Same architecture as the near-dup gate (see neardup_stream's module
docstring for the full rationale): the proven batch-vs-state pipeline
(``operators/substring.py incremental_substring_pairs``) runs inside
``foreachBatch``; per micro-batch:

  1. detect: span pairs touching the batch at O(batch postings + matched
     occurrences);
  2. route: batch docs pairing with a stored doc (or a lower-id batch
     sibling) go to ``dupes``, the rest to ``accepted``;
  3. ingest: append ONLY accepted docs' positional postings to the state.

Exactly-once via the same (run id, epoch id) replay markers
(``streaming/replay.py``) — a redelivered batch is a no-op. State grows
by accepted docs' postings only; per-batch cost tracks the batch, not the
corpus (the incremental path's asymptotics).

Idempotent state appends: unlike the near-dup gate, where a double-
appended state row is harmless (minhash candidate generation dedups),
duplicate (doc, pos, hash) postings CORRUPT the diagonal row_number
island arithmetic (max_span_tokens underestimated, n_spans inflated) for
every future batch. So each batch's postings land in their OWN
subdirectory keyed by the replay batch key, written with overwrite mode —
a redelivery after a crash between the state append and the marker write
rewrites the same subdirectory instead of appending a second copy, and
the handler removes any crash remnant of its own subdirectory BEFORE
detection so routing reruns against the exact pre-batch state.
``incremental_substring_pairs`` reads the postings tree with
``recursiveFileLookup`` (operators/substring.py), so flat batch-built
layouts and the stream's per-batch subdirectories read identically.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.substring import (
    _postings,
    exact_substring_pairs,
    incremental_substring_pairs,
)
from .replay import batch_key


class SubstringIngest:
    """foreachBatch handler: exact-substring gate + postings-state
    maintenance. ``min_tokens`` is the verbatim-span threshold L."""

    def __init__(
        self,
        state_path: str,
        accepted_path: str,
        dupes_path: str,
        *,
        min_tokens: int = 12,
        id_col: str = "doc_id",
        text_col: str = "text",
        checkpoint_dir: str | None = None,
        compact_every: int | None = None,
    ) -> None:
        self.state_path = state_path
        self.accepted_path = accepted_path
        self.dupes_path = dupes_path
        self.min_tokens = min_tokens
        self.id_col = id_col
        self.text_col = text_col
        self.checkpoint_dir = checkpoint_dir
        # Every N committed epochs, fold the per-epoch postings
        # subdirectories into flat files (operators/substring.py
        # compact_substring_state — listing costs grow with stream
        # lifetime, ~40% of warm per-batch latency at 200 epochs,
        # BENCH_stream.md r11). Safe mid-stream: handlers run
        # sequentially and this epoch's marker is already written, so
        # the quiescence guard sees a fully-committed state.
        self.compact_every = compact_every
        self._batches_since_compact = 0

    def _state_exists(self) -> bool:
        return os.path.exists(os.path.join(self.state_path, "_STATE_OK"))

    def _batch_marker(self, batch_id: int) -> str:
        key = batch_key(self.checkpoint_dir, batch_id)
        return os.path.join(self.state_path, f"_BATCH_{key}_OK")

    def _batch_postings_dir(self, batch_id: int) -> str:
        key = batch_key(self.checkpoint_dir, batch_id)
        return os.path.join(self.state_path, "postings", f"batch_{key}")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._batch_marker(batch_id)):
            return
        # Crash remnant: a prior delivery of THIS epoch appended its
        # postings subdirectory but died before the marker write. Remove
        # it so detection reruns against the exact pre-batch state —
        # otherwise the batch's own stored postings would duplicate the
        # vs_batch matches and corrupt the island arithmetic.
        shutil.rmtree(self._batch_postings_dir(batch_id), ignore_errors=True)
        spark = batch.sparkSession
        idc = self.id_col
        batch = batch.localCheckpoint(eager=True)  # micro-batches are small

        if self._state_exists():
            pairs = incremental_substring_pairs(
                spark,
                self.state_path,
                batch,
                min_tokens=self.min_tokens,
                id_col=idc,
                text_col=self.text_col,
            ).select(F.col("doc1").alias("id1"), F.col("doc2").alias("id2"))
            # Same routing rule as the near-dup gate: a batch doc is a dupe
            # if it pairs with a stored doc, or with a lower-id batch
            # sibling. Membership by JOIN, never isin(collect()).
            b1 = batch.select(F.col(idc).alias("id1"), F.lit(True).alias("_in1"))
            b2 = batch.select(F.col(idc).alias("id2"), F.lit(True).alias("_in2"))
            marked = (
                pairs.join(b1, "id1", "left")
                .join(b2, "id2", "left")
                .select(
                    "id1",
                    "id2",
                    F.coalesce("_in1", F.lit(False)).alias("_in1"),
                    F.coalesce("_in2", F.lit(False)).alias("_in2"),
                )
            )
            dupe_ids = marked.select(
                F.when(F.col("_in1") & F.col("_in2"), F.col("id2"))
                .when(F.col("_in1"), F.col("id1"))
                .otherwise(F.col("id2"))
                .alias(idc)
            ).distinct()
        else:
            # first batch: no state yet — siblings gate among themselves
            pairs = exact_substring_pairs(
                batch,
                min_tokens=self.min_tokens,
                id_col=idc,
                text_col=self.text_col,
            )
            dupe_ids = pairs.select(F.col("doc2").alias(idc)).distinct()

        dupes = batch.join(dupe_ids, idc, "left_semi")
        accepted = batch.join(dupe_ids, idc, "left_anti").localCheckpoint(
            eager=True
        )

        dupes.write.mode("append").parquet(self.dupes_path)
        accepted.write.mode("append").parquet(self.accepted_path)
        had_state = self._state_exists()
        # Idempotent state append: this batch's postings live in their own
        # deterministic subdirectory (overwrite mode), so a replayed epoch
        # rewrites rather than duplicates — see module docstring.
        _postings(accepted, self.min_tokens, self.text_col, idc).write.mode(
            "overwrite"
        ).parquet(self._batch_postings_dir(batch_id))
        if not had_state:
            with open(os.path.join(self.state_path, "_STATE_OK"), "w") as f:
                f.write("ok")
        with open(self._batch_marker(batch_id), "w") as f:
            f.write("ok")
        if self.compact_every:
            self._batches_since_compact += 1
            if self._batches_since_compact >= self.compact_every:
                from ..operators.substring import compact_substring_state

                compact_substring_state(spark, self.state_path)
                self._batches_since_compact = 0


def substring_ingest_stream(
    stream: DataFrame,
    handler: SubstringIngest,
    *,
    checkpoint: str,
):
    """Wire a streaming DataFrame of documents through the substring gate."""
    handler.checkpoint_dir = checkpoint
    return (
        stream.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
