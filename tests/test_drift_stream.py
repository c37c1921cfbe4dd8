"""Streaming PSI drift monitor (streaming/drift_stream.py)."""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from vector_db_mvp_spark.streaming.drift_stream import (
    DriftIngest,
    drift_ingest_stream,
    publish_norm_reference,
)

SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("ts", TimestampType(), False),
    ]
)


def _vec(rng, scale):
    return [rng.uniform(0.5, 1.0) * scale for _ in range(8)]


@pytest.fixture()
def reference_path(spark, tmp_path):
    rng = random.Random(7)
    ref = spark.createDataFrame(
        [(i, _vec(rng, 1.0), dt.datetime(2026, 1, 1)) for i in range(400)],
        SCHEMA,
    )
    p = str(tmp_path / "ref")
    publish_norm_reference(ref, p)
    return p


@pytest.fixture()
def run_drift(spark, tmp_path, reference_path):
    def _run(batches, max_psi=0.2):
        src = str(tmp_path / "in")
        t0 = dt.datetime(2026, 1, 2, 12, 0, 0)
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                [(v, e, t0 + dt.timedelta(minutes=i)) for v, e in rows], SCHEMA
            ).coalesce(1).write.mode("append").parquet(src)
        handler = DriftIngest(
            reference_path,
            str(tmp_path / "accepted"),
            str(tmp_path / "quarantine"),
            max_psi=max_psi,
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = drift_ingest_stream(stream, handler, checkpoint=str(tmp_path / "ckpt"))
        q.awaitTermination(180)

        def _count(p):
            try:
                return spark.read.parquet(p).count()
            except Exception:
                return 0

        return (
            _count(str(tmp_path / "accepted" / "data")),
            _count(str(tmp_path / "quarantine")),
            handler,
        )

    return _run


def test_same_distribution_batch_accepted(run_drift):
    rng = random.Random(11)
    rows = [(1000 + i, _vec(rng, 1.0)) for i in range(200)]
    accepted, quarantined, h = run_drift([rows])
    assert accepted == 200 and quarantined == 0
    assert h.last_psi is not None and h.last_psi <= 0.2


def test_shifted_distribution_batch_quarantined(run_drift):
    """Norms scaled 3x: the whole batch lands far outside the reference
    bins -> PSI blows past any reasonable bar."""
    rng = random.Random(13)
    rows = [(2000 + i, _vec(rng, 3.0)) for i in range(200)]
    accepted, quarantined, h = run_drift([rows])
    assert accepted == 0 and quarantined == 200
    assert h.last_psi > 0.5


def test_mixed_batches_route_independently(run_drift):
    rng = random.Random(17)
    ok = [(3000 + i, _vec(rng, 1.0)) for i in range(150)]
    bad = [(4000 + i, _vec(rng, 3.0)) for i in range(150)]
    accepted, quarantined, _ = run_drift([ok, bad])
    assert accepted == 150 and quarantined == 150


def test_replayed_epoch_is_noop(spark, tmp_path, run_drift):
    rng = random.Random(19)
    rows = [(5000 + i, _vec(rng, 1.0)) for i in range(100)]
    accepted, _, handler = run_drift([rows])
    batch = spark.createDataFrame(
        [(v, e, dt.datetime(2026, 1, 3)) for v, e in rows], SCHEMA
    )
    handler(batch, 0)  # simulated at-least-once redelivery
    assert (
        spark.read.parquet(str(tmp_path / "accepted" / "data")).count() == accepted
    )
