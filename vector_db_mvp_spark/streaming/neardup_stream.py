"""Streaming NEAR-dup ingestion: per-micro-batch incremental MinHash.

``dedup_stream.dedup_stream_exact`` stops byte-identical copies at the
door; near-duplicates (boilerplate variants, templated rewrites) need the
MinHash machinery. Keeping banded-signature state inside a Spark state
store would mean re-implementing the band join as a stateful operator —
instead this module runs the already-proven batch-vs-state pipeline
(``operators/incremental.py``) inside ``foreachBatch``:

for each micro-batch:
  1. detect: ``incremental_minhash_pairs(state, batch)`` — near-dup pairs
     touching the batch, at O(batch + candidates);
  2. route: batch docs that match an already-stored document (or a
     lower-id batch sibling) go to the ``dupes`` sink, the rest to
     ``accepted``;
  3. ingest: append ONLY accepted docs' band/posting rows to the state
     (append-only parquet — the same state the batch pipeline reads).

Exactly-once: foreachBatch is at-least-once, so the handler writes a
per-batch marker into the state directory AFTER sinks + state append
succeed and skips any batch whose marker exists — replayed batches become
no-ops instead of double-writes. Markers are keyed by (stream run id,
epoch id) via ``streaming/replay.py``: epoch ids restart at 0 under a
fresh checkpoint, so an epoch-only key would silently drop the first
batches of a legitimate new run. At 100 TB/day the state grows by the
accepted docs only, and each micro-batch's cost is driven by the batch
size, not the corpus — the same asymptotics as the batch incremental path.

Idempotent state appends (the substring-gate fix, r11, applied here for
the same crash window): a crash AFTER the state append but BEFORE the
marker write redelivers the epoch, and a second append is NOT harmless —
``_jaccard_verify`` counts postings ROWS, so a double-appended doc's
Jaccard inflates (c=2,n1=4,n2=4 gives 0.333; doubling doc1's rows gives
0.5 — a false positive can cross tau). Worse, the state is TWO sequential
writes (bands, then postings); a crash between them leaves a doc with
band rows but no postings — candidates that silently verify to nothing.
Both hazards close the same way: each epoch's band/posting rows land in
their OWN batch-keyed subdirectories (overwrite mode) and the handler
removes its crash remnants BEFORE detection, so a redelivery is
bit-identical. State reads use recursiveFileLookup
(operators/incremental.py), accepting flat batch-built layouts and the
stream's per-epoch subdirectories alike.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import _band_rows, _shingle_digests, _spread_tokens
from ..operators.incremental import incremental_minhash_pairs
from .replay import batch_key


class NearDupIngest:
    """foreachBatch handler: near-dup gate + state maintenance.

    ``accepted_path`` / ``dupes_path`` receive parquet appends; the dedup
    state lives at ``state_path`` (created on first batch).
    ``checkpoint_dir`` scopes replay markers to the stream run; it is
    wired automatically by :func:`neardup_ingest_stream`.
    """

    def __init__(
        self,
        state_path: str,
        accepted_path: str,
        dupes_path: str,
        *,
        n: int = 5,
        num_hashes: int = 16,
        bands: int = 4,
        tau: float = 0.4,
        id_col: str = "doc_id",
        text_col: str = "text",
        checkpoint_dir: str | None = None,
    ) -> None:
        self.state_path = state_path
        self.accepted_path = accepted_path
        self.dupes_path = dupes_path
        self.cfg = dict(n=n, num_hashes=num_hashes, bands=bands)
        self.tau = tau
        self.id_col = id_col
        self.text_col = text_col
        self.checkpoint_dir = checkpoint_dir

    def _state_exists(self) -> bool:
        return os.path.exists(os.path.join(self.state_path, "_STATE_OK"))

    def _batch_marker(self, batch_id: int) -> str:
        key = batch_key(self.checkpoint_dir, batch_id)
        return os.path.join(self.state_path, f"_BATCH_{key}_OK")

    def _batch_state_dirs(self, batch_id: int) -> tuple[str, str]:
        key = batch_key(self.checkpoint_dir, batch_id)
        return (
            os.path.join(self.state_path, "bands", f"batch_{key}"),
            os.path.join(self.state_path, "postings", f"batch_{key}"),
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        # foreachBatch re-delivers a batch after failures; the marker makes
        # the whole handler idempotent — a replayed batch is skipped before
        # any sink or state append can double-write.
        if os.path.exists(self._batch_marker(batch_id)):
            return
        # Crash remnants: a prior delivery of THIS epoch appended some or
        # all of its state subdirectories but died before the marker.
        # Remove them so detection reruns against the exact pre-batch
        # state (module docstring: a double-append inflates Jaccard).
        for d in self._batch_state_dirs(batch_id):
            shutil.rmtree(d, ignore_errors=True)
        spark = batch.sparkSession
        idc = self.id_col
        batch = batch.localCheckpoint(eager=True)  # micro-batches are small

        if self._state_exists():
            pairs = incremental_minhash_pairs(
                spark, self.state_path, batch,
                tau=self.tau, id_col=idc, text_col=self.text_col, **self.cfg
            )
            # A batch doc is a dupe if it pairs with a stored doc, or with a
            # lower-id batch sibling (pairwise gate — a chain A~B~C keeps A
            # and C; the batch CC pass owns transitive resolution).
            # Membership is marked by JOIN, not isin(collect()): a literal
            # id list costs one py4j round-trip per element.
            b1 = batch.select(F.col(idc).alias("id1"), F.lit(True).alias("_in1"))
            b2 = batch.select(F.col(idc).alias("id2"), F.lit(True).alias("_in2"))
            marked = (
                pairs.join(b1, "id1", "left").join(b2, "id2", "left").select(
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
            # first batch: no state yet — siblings dedup among themselves
            from ..operators.dedup import minhash_lsh_pairs

            pairs = minhash_lsh_pairs(
                batch, tau=self.tau, id_col=idc, text_col=self.text_col, **self.cfg
            )
            dupe_ids = pairs.select(F.col("id2").alias(idc)).distinct()

        dupes = batch.join(dupe_ids, idc, "left_semi")
        accepted = batch.join(dupe_ids, idc, "left_anti").localCheckpoint(eager=True)

        dupes.write.mode("append").parquet(self.dupes_path)
        accepted.write.mode("append").parquet(self.accepted_path)
        had_state = self._state_exists()
        # Idempotent state append: this epoch's band/posting rows live in
        # their own deterministic subdirectories (overwrite mode), so a
        # replayed epoch rewrites rather than duplicates, and a torn
        # bands-without-postings append is healed by the remnant cleanup.
        post = _shingle_digests(
            _spread_tokens(accepted, self.text_col, idc), self.cfg["n"]
        ).localCheckpoint(eager=True)
        bands_dir, post_dir = self._batch_state_dirs(batch_id)
        _band_rows(
            post, self.cfg["num_hashes"], self.cfg["bands"]
        ).write.mode("overwrite").parquet(bands_dir)
        post.withColumnRenamed("m", "s").write.mode("overwrite").parquet(
            post_dir
        )
        if not had_state:
            with open(os.path.join(self.state_path, "_STATE_OK"), "w") as f:
                f.write("ok")
        with open(self._batch_marker(batch_id), "w") as f:
            f.write("ok")


def neardup_ingest_stream(
    stream: DataFrame,
    handler: NearDupIngest,
    *,
    checkpoint: str,
):
    """Wire a streaming DataFrame of documents through the near-dup gate."""
    handler.checkpoint_dir = checkpoint
    return (
        stream.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
