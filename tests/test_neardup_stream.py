"""Streaming near-dup ingestion gate (streaming/neardup_stream.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from vector_db_mvp_spark.streaming.neardup_stream import (
    NearDupIngest,
    neardup_ingest_stream,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill nearby every single morning"
)
NEAR = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill nearby every single evening"
)
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines"
)
THIRD = (
    "yet another unrelated document mentioning gradient descent "
    "optimizers learning rates and batch normalization layers"
)


@pytest.fixture()
def run_ingest(spark, tmp_path):
    def _run(batches):
        src = str(tmp_path / "in")
        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                [(d, t, t0 + dt.timedelta(minutes=i)) for d, t in rows], SCHEMA
            ).coalesce(1).write.mode("append").parquet(src)
        handler = NearDupIngest(
            str(tmp_path / "state"),
            str(tmp_path / "accepted"),
            str(tmp_path / "dupes"),
            tau=0.4,
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = neardup_ingest_stream(
            stream, handler, checkpoint=str(tmp_path / "ckpt")
        )
        q.awaitTermination(180)
        accepted = {
            r["doc_id"] for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
        }
        try:
            dupes = {
                r["doc_id"] for r in spark.read.parquet(str(tmp_path / "dupes")).collect()
            }
        except Exception:
            dupes = set()
        return accepted, dupes, handler

    return _run


def test_cross_batch_neardup_is_gated(spark, run_ingest):
    accepted, dupes, _ = run_ingest(
        [
            [(1, BASE), (2, OTHER)],
            [(3, NEAR), (4, THIRD)],  # 3 is a near-dup of stored 1
        ]
    )
    assert accepted == {1, 2, 4}
    assert dupes == {3}


def test_first_batch_siblings_dedup_among_themselves(spark, run_ingest):
    accepted, dupes, _ = run_ingest([[(1, BASE), (2, NEAR), (3, OTHER)]])
    assert accepted == {1, 3}
    assert dupes == {2}


def test_replayed_batch_is_skipped(spark, run_ingest, tmp_path):
    accepted, dupes, handler = run_ingest([[(1, BASE), (2, OTHER)]])
    n_before = spark.read.parquet(str(tmp_path / "accepted")).count()
    # simulate foreachBatch redelivery of batch 0
    replay = spark.read.parquet(str(tmp_path / "accepted")).limit(2)
    handler(replay, 0)
    assert spark.read.parquet(str(tmp_path / "accepted")).count() == n_before


def test_raw_jsonl_stream_through_gate_end_to_end(spark, tmp_path):
    """The full ingestion path: raw JSONL files (one with a corrupt line)
    -> schema-enforced stream -> parse-quarantine filter -> near-dup gate.
    Corrupt lines never reach the gate; near-dups never reach storage."""
    import json

    from vector_db_mvp_spark.sources.ingest import (
        DOCUMENT_INGEST_SCHEMA,
        _with_corrupt,
    )

    src = tmp_path / "raw"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        json.dumps({"doc_id": 1, "text": BASE, "lang": "en", "source": "s", "n_chars": len(BASE)})
        + "\n<<< totally not json >>>\n"
        + json.dumps({"doc_id": 2, "text": OTHER, "lang": "en", "source": "s", "n_chars": len(OTHER)})
        + "\n"
    )
    (src / "b1.jsonl").write_text(
        json.dumps({"doc_id": 3, "text": NEAR, "lang": "en", "source": "s", "n_chars": len(NEAR)})
        + "\n"
        + json.dumps({"doc_id": 4, "text": THIRD, "lang": "en", "source": "s", "n_chars": len(THIRD)})
        + "\n"
    )

    handler = NearDupIngest(
        str(tmp_path / "state"),
        str(tmp_path / "accepted"),
        str(tmp_path / "dupes"),
        tau=0.4,
    )
    stream = (
        spark.readStream.schema(_with_corrupt(DOCUMENT_INGEST_SCHEMA))
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .filter(F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull())
        .drop("_corrupt_record")
        .select("doc_id", "text")
    )
    q = neardup_ingest_stream(
        stream, handler, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    accepted = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
    }
    dupes = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "dupes")).collect()
    }
    assert accepted == {1, 2, 4}  # corrupt line dropped, near-dup 3 gated
    assert dupes == {3}


def test_state_matches_accepted_corpus(spark, run_ingest, tmp_path):
    from vector_db_mvp_spark.operators.incremental import incremental_minhash_pairs

    accepted, _, handler = run_ingest(
        [
            [(1, BASE), (2, OTHER)],
            [(3, NEAR), (4, THIRD)],
        ]
    )
    # a later out-of-band batch probing the state sees near-dups of ACCEPTED
    # docs only (3 never entered the state)
    probe = spark.createDataFrame([(9, BASE + " extra")], "doc_id long, text string")
    pairs = incremental_minhash_pairs(
        spark, str(tmp_path / "state"), probe, tau=0.4
    ).collect()
    assert {(r["id1"], r["id2"]) for r in pairs} == {(1, 9)}


def test_crash_between_append_and_marker_is_idempotent(
    spark, run_ingest, tmp_path
):
    """A crash AFTER the state append but BEFORE the replay marker makes
    Spark redeliver the epoch. The redelivery must not duplicate the
    batch's band/posting rows: _jaccard_verify counts postings ROWS, so a
    double-appended doc INFLATES its Jaccard (a false positive can cross
    tau) — the state must come back bit-identical."""
    import os

    accepted, dupes, handler = run_ingest(
        [[(1, BASE), (2, OTHER)], [(4, THIRD)]]
    )
    assert accepted == {1, 2, 4}

    def _rows(sub):
        df = spark.read.option("recursiveFileLookup", "true").parquet(
            str(tmp_path / "state" / sub)
        )
        return sorted(map(tuple, df.collect()))

    before = (_rows("bands"), _rows("postings"))
    assert len(before[1]) == len(set(before[1]))

    os.remove(handler._batch_marker(1))  # simulate the crash window
    t0 = dt.datetime(2026, 1, 1, 12, 1, 0)
    handler(spark.createDataFrame([(4, THIRD, t0)], SCHEMA), 1)
    assert (_rows("bands"), _rows("postings")) == before

    # detection downstream of the replay: a near-copy of doc 1 is gated,
    # with the UNINFLATED jaccard (rows doubled would give a different
    # score or spurious pairs)
    handler(
        spark.createDataFrame(
            [(9, NEAR, t0 + dt.timedelta(minutes=2))], SCHEMA
        ),
        2,
    )
    dupes2 = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "dupes")).collect()
    }
    assert 9 in dupes2


def test_torn_state_append_is_healed_on_redelivery(
    spark, run_ingest, tmp_path
):
    """The state is two sequential writes (bands, then postings); a crash
    between them leaves a doc with band rows but no postings — candidates
    that verify to nothing. The redelivery's remnant cleanup must heal
    the tear."""
    import os
    import shutil

    accepted, dupes, handler = run_ingest([[(1, BASE), (2, OTHER)]])
    # epoch 1 "crashes" mid-state-append: bands written, postings not,
    # marker not written
    t0 = dt.datetime(2026, 1, 1, 12, 1, 0)
    batch = spark.createDataFrame([(4, THIRD, t0)], SCHEMA)
    handler(batch, 1)
    bands_dir, post_dir = handler._batch_state_dirs(1)
    os.remove(handler._batch_marker(1))
    shutil.rmtree(post_dir)  # the torn half

    handler(batch, 1)  # redelivery
    assert os.path.isdir(bands_dir) and os.path.isdir(post_dir)
    # doc 4 is whole again: a near-copy of THIRD is gated correctly
    near_third = THIRD.replace("layers", "modules")
    handler(
        spark.createDataFrame(
            [(9, near_third, t0 + dt.timedelta(minutes=2))], SCHEMA
        ),
        2,
    )
    dupes2 = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "dupes")).collect()
    }
    assert 9 in dupes2
