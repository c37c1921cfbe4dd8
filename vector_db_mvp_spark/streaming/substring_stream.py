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
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.substring import (
    build_substring_state,
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
    ) -> None:
        self.state_path = state_path
        self.accepted_path = accepted_path
        self.dupes_path = dupes_path
        self.min_tokens = min_tokens
        self.id_col = id_col
        self.text_col = text_col
        self.checkpoint_dir = checkpoint_dir

    def _state_exists(self) -> bool:
        return os.path.exists(os.path.join(self.state_path, "_STATE_OK"))

    def _batch_marker(self, batch_id: int) -> str:
        key = batch_key(self.checkpoint_dir, batch_id)
        return os.path.join(self.state_path, f"_BATCH_{key}_OK")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._batch_marker(batch_id)):
            return
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
        build_substring_state(
            accepted,
            self.state_path,
            min_tokens=self.min_tokens,
            mode="append" if had_state else "overwrite",
            force=True,
            id_col=idc,
            text_col=self.text_col,
        )
        with open(self._batch_marker(batch_id), "w") as f:
            f.write("ok")


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
