"""Streaming classify-on-ingest: label every arriving document with a
published Naive Bayes model and route low-confidence predictions to a
review sink — the labeling member of the ingestion-gate family
(byte-identical gate: dedup_stream; MinHash gate: neardup_stream;
ExactSubstr gate: substring_stream).

The model is a build-once/serve-many artifact (operators/nbayes.py
``publish_nb_model``): training happens OUT of band, the stream only
scores — so a micro-batch costs O(batch tokens ⋈ model postings), never
a training pass. That matches the production shape: retraining is a
batch job that republishes the artifact; the stream picks it up on the
next handler construction.

Routing: predictions with margin ≥ ``min_margin`` (winner's log-score
lead over the runner-up label — the standard NB confidence signal)
append to the ``labeled`` sink WITH their predicted label; the rest go
to ``review`` for human/strong-model adjudication, the canonical
weak-labeling loop of a curation pipeline.

Exactly-once: foreachBatch is at-least-once; a per-batch marker keyed by
(stream run id, epoch id) (streaming/replay.py) makes redelivered
epochs no-ops. Unlike the dedup gates there is NO mutable state here —
the model is read-only — so the marker only guards the two sink appends
and there is no crash window between state and marker to heal.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.nbayes import load_nb_model, nb_score
from .replay import batch_key


class ClassifyIngest:
    """foreachBatch handler: score each batch against the published model
    and route by confidence margin."""

    def __init__(
        self,
        model_path: str,
        labeled_path: str,
        review_path: str,
        *,
        min_margin: float = 1.0,
        id_col: str = "doc_id",
        text_col: str = "text",
        checkpoint_dir: str | None = None,
    ) -> None:
        self.model_path = model_path
        self.labeled_path = labeled_path
        self.review_path = review_path
        self.min_margin = min_margin
        self.id_col = id_col
        self.text_col = text_col
        self.checkpoint_dir = checkpoint_dir
        self._model = None

    def _batch_marker(self, batch_id: int) -> str:
        key = batch_key(self.checkpoint_dir, batch_id)
        return os.path.join(self.labeled_path, f"_BATCH_{key}_OK")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._batch_marker(batch_id)):
            return
        spark = batch.sparkSession
        if self._model is None:
            base, model = load_nb_model(spark, self.model_path)
            # model frames are small relative to the stream's lifetime of
            # batches: checkpoint once, reuse every epoch
            self._model = (
                base.localCheckpoint(eager=True),
                model.localCheckpoint(eager=True),
            )
        base, model = self._model
        batch = batch.localCheckpoint(eager=True)  # micro-batches are small
        preds = nb_score(
            batch, base, model, id_col=self.id_col, text_col=self.text_col
        )
        # Left join: documents whose text tokenizes to nothing produce no
        # rows in nb_score, but the gate's contract is that EVERY arriving
        # doc is routed somewhere — token-less docs get NULL predicted and
        # margin 0, which sends them to review regardless of min_margin.
        enriched = (
            batch.join(preds, self.id_col, "left")
            .withColumn("margin", F.coalesce(F.col("margin"), F.lit(0.0)))
            .localCheckpoint(eager=True)
        )
        confident = enriched.filter(
            (F.col("margin") >= self.min_margin)
            & F.col("predicted").isNotNull()
        )
        review = enriched.filter(
            (F.col("margin") < self.min_margin)
            | F.col("predicted").isNull()
        )
        os.makedirs(self.labeled_path, exist_ok=True)
        confident.write.mode("append").parquet(
            os.path.join(self.labeled_path, "data")
        )
        review.write.mode("append").parquet(self.review_path)
        with open(self._batch_marker(batch_id), "w") as f:
            f.write("ok")


def classify_ingest_stream(
    stream: DataFrame,
    handler: ClassifyIngest,
    *,
    checkpoint: str,
):
    """Wire a streaming DataFrame of documents through the classifier."""
    handler.checkpoint_dir = checkpoint
    return (
        stream.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
