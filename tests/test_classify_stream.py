"""Streaming classify-on-ingest gate (streaming/classify_stream.py)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from vector_db_mvp_spark.operators.nbayes import nb_model, publish_nb_model
from vector_db_mvp_spark.streaming.classify_stream import (
    ClassifyIngest,
    classify_ingest_stream,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

TRAIN = [
    (0, "en", "the cat sat on the mat and the dog ran in the park"),
    (2, "en", "a quick brown fox jumps over the lazy dog near the barn"),
    (4, "fr", "le chat est sur le tapis et le chien court dans le parc"),
    (6, "fr", "un renard brun saute par dessus le chien paresseux"),
]


@pytest.fixture()
def model_path(spark, tmp_path):
    train = spark.createDataFrame(TRAIN, "doc_id long, lang string, text string")
    base, model = nb_model(train)
    p = str(tmp_path / "nbmodel")
    publish_nb_model(base, model, p)
    return p


@pytest.fixture()
def run_classify(spark, tmp_path, model_path):
    def _run(batches, min_margin=1.0):
        src = str(tmp_path / "in")
        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                [(d, t, t0 + dt.timedelta(minutes=i)) for d, t in rows], SCHEMA
            ).coalesce(1).write.mode("append").parquet(src)
        handler = ClassifyIngest(
            model_path,
            str(tmp_path / "labeled"),
            str(tmp_path / "review"),
            min_margin=min_margin,
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = classify_ingest_stream(
            stream, handler, checkpoint=str(tmp_path / "ckpt")
        )
        q.awaitTermination(180)

        def _read(p):
            try:
                return {
                    r["doc_id"]: r for r in spark.read.parquet(p).collect()
                }
            except Exception:
                return {}

        return (
            _read(str(tmp_path / "labeled" / "data")),
            _read(str(tmp_path / "review")),
            handler,
        )

    return _run


def test_confident_docs_labeled_with_language(run_classify):
    labeled, review, _ = run_classify(
        [
            [(1, "the cat ran in the park near the dog")],
            [(3, "le chat court dans le parc avec le chien")],
        ]
    )
    assert labeled[1].predicted == "en"
    assert labeled[3].predicted == "fr"
    assert not review


def test_ambiguous_docs_route_to_review(run_classify):
    """A doc sharing no training vocabulary scores nearly identically
    under both labels (margin ≈ prior/length only) — routed to review at
    any reasonable margin."""
    labeled, review, _ = run_classify(
        [[(9, "zzz qqq www unseen vocabulary entirely")]], min_margin=0.5
    )
    assert 9 in review and 9 not in labeled
    assert review[9].margin < 0.5


def test_tokenless_docs_route_to_review(run_classify):
    """A doc whose text tokenizes to nothing produces no nb_score rows;
    the gate must still route it — to review with NULL predicted and
    margin 0, never silently drop it from both sinks."""
    labeled, review, _ = run_classify(
        [
            [
                (1, "the cat ran in the park near the dog"),
                (5, "   "),
                (7, ""),
            ]
        ]
    )
    assert labeled[1].predicted == "en"
    for d in (5, 7):
        assert d in review and d not in labeled
        assert review[d].predicted is None
        assert review[d].margin == 0.0


def test_tokenless_doc_never_confident_even_at_zero_margin(run_classify):
    """min_margin=0 would pass margin>=0 for a coalesced token-less doc;
    the NULL-prediction guard must still route it to review."""
    labeled, review, _ = run_classify([[(5, "   ")]], min_margin=0.0)
    assert 5 in review and 5 not in labeled


def test_replayed_epoch_is_noop(spark, run_classify, tmp_path):
    """Redelivering a marked epoch must not double-append."""
    labeled, _, handler = run_classify(
        [[(1, "the cat ran in the park near the dog")]]
    )
    n_before = spark.read.parquet(str(tmp_path / "labeled" / "data")).count()
    # simulate at-least-once redelivery of epoch 0
    batch = spark.createDataFrame(
        [(1, "the cat ran in the park near the dog", dt.datetime(2026, 1, 1))],
        SCHEMA,
    )
    handler(batch, 0)
    assert spark.read.parquet(str(tmp_path / "labeled" / "data")).count() == n_before


def test_marker_written_after_sinks(tmp_path, run_classify):
    _, _, handler = run_classify(
        [[(1, "the cat ran in the park near the dog")]]
    )
    assert os.path.exists(handler._batch_marker(0))
