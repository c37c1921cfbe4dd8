"""Streaming exact-substring ingestion gate (streaming/substring_stream.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from vector_db_mvp_spark.streaming.substring_stream import (
    SubstringIngest,
    substring_ingest_stream,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)


def _w(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


# an 8-token span shared verbatim; filler disjoint everywhere else
SPAN = _w(8, "s")
BASE = _w(4, "a") + " " + SPAN + " " + _w(5, "b")
COPIER = _w(6, "c") + " " + SPAN  # shares the span, low global Jaccard
OTHER = _w(16, "o")
THIRD = _w(14, "t")


@pytest.fixture()
def run_ingest(spark, tmp_path):
    def _run(batches, min_tokens=6):
        src = str(tmp_path / "in")
        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                [(d, t, t0 + dt.timedelta(minutes=i)) for d, t in rows], SCHEMA
            ).coalesce(1).write.mode("append").parquet(src)
        handler = SubstringIngest(
            str(tmp_path / "state"),
            str(tmp_path / "accepted"),
            str(tmp_path / "dupes"),
            min_tokens=min_tokens,
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = substring_ingest_stream(
            stream, handler, checkpoint=str(tmp_path / "ckpt")
        )
        q.awaitTermination(180)
        accepted = {
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
        }
        try:
            dupes = {
                r["doc_id"]
                for r in spark.read.parquet(str(tmp_path / "dupes")).collect()
            }
        except Exception:
            dupes = set()
        return accepted, dupes, handler

    return _run


def test_cross_batch_span_copy_is_gated(spark, run_ingest):
    accepted, dupes, _ = run_ingest(
        [
            [(1, BASE), (2, OTHER)],
            [(3, COPIER), (4, THIRD)],  # 3 copies stored 1's span verbatim
        ]
    )
    assert accepted == {1, 2, 4}
    assert dupes == {3}


def test_first_batch_siblings_gate_among_themselves(spark, run_ingest):
    accepted, dupes, _ = run_ingest([[(1, BASE), (2, COPIER), (3, OTHER)]])
    assert accepted == {1, 3}
    assert dupes == {2}


def test_short_overlap_passes_the_gate(spark, run_ingest):
    # sharing fewer than min_tokens consecutive tokens is NOT a dupe
    short = _w(4, "s")  # 4-token prefix of SPAN's vocabulary, below L=6
    doc = short + " " + _w(12, "q")
    accepted, dupes, _ = run_ingest([[(1, BASE)], [(5, doc)]])
    assert accepted == {1, 5}
    assert dupes == set()


def test_replayed_batch_is_skipped(spark, run_ingest, tmp_path):
    accepted, dupes, handler = run_ingest([[(1, BASE), (2, OTHER)]])
    n_before = spark.read.parquet(str(tmp_path / "accepted")).count()
    replay = spark.read.parquet(str(tmp_path / "accepted")).limit(2)
    handler(replay, 0)
    assert spark.read.parquet(str(tmp_path / "accepted")).count() == n_before


def test_crash_between_append_and_marker_is_idempotent(
    spark, run_ingest, tmp_path
):
    """A crash AFTER the postings-state append but BEFORE the replay
    marker makes Spark redeliver the epoch. The redelivery must not
    duplicate the batch's (doc, pos, hash) postings — duplicates corrupt
    the diagonal island arithmetic for every future batch."""
    accepted, dupes, handler = run_ingest(
        [[(1, BASE), (2, OTHER)], [(4, THIRD)]]
    )
    assert accepted == {1, 2, 4}
    postings_dir = str(tmp_path / "state" / "postings")

    def _postings_rows():
        df = spark.read.option("recursiveFileLookup", "true").parquet(
            postings_dir
        )
        return sorted((r["_id"], r["_pos"], r["_h"]) for r in df.collect())

    before = _postings_rows()
    assert len(before) == len(set(before))  # unique to begin with

    # simulate the crash: marker for epoch 1 lost, postings already landed
    import os

    os.remove(handler._batch_marker(1))
    t0 = dt.datetime(2026, 1, 1, 12, 1, 0)
    replay = spark.createDataFrame([(4, THIRD, t0)], SCHEMA)
    handler(replay, 1)

    after = _postings_rows()
    assert after == before  # bit-identical state, no duplicate postings

    # and detection downstream of the replay still works: a copier of
    # doc 1's span is gated with exact span arithmetic intact
    replay2 = spark.createDataFrame(
        [(9, COPIER, t0 + dt.timedelta(minutes=2))], SCHEMA
    )
    handler(replay2, 2)
    dupes2 = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "dupes")).collect()
    }
    assert 9 in dupes2


def test_compaction_flattens_state_and_preserves_detection(
    spark, run_ingest, tmp_path
):
    """After N epochs the state holds N subdirectories; compaction folds
    them into flat files (publish-then-swap) without changing a single
    posting — detection after compaction must behave identically."""
    import os

    from vector_db_mvp_spark.operators.substring import (
        compact_substring_state,
    )

    accepted, dupes, handler = run_ingest(
        [[(1, BASE)], [(2, OTHER)], [(4, THIRD)]]
    )
    assert accepted == {1, 2, 4}
    state = str(tmp_path / "state")
    postings = os.path.join(state, "postings")
    subdirs = [d for d in os.listdir(postings) if d.startswith("batch_")]
    assert len(subdirs) == 3

    def _rows():
        df = spark.read.option("recursiveFileLookup", "true").parquet(postings)
        return sorted((r["_id"], r["_pos"], r["_h"]) for r in df.collect())

    before = _rows()
    assert compact_substring_state(spark, state, min_files=1)
    assert _rows() == before  # bit-identical postings
    assert not [d for d in os.listdir(postings) if d.startswith("batch_")]

    # detection against the compacted (flat) state still gates a copier
    t0 = dt.datetime(2026, 1, 1, 13, 0, 0)
    handler(spark.createDataFrame([(9, COPIER, t0)], SCHEMA), 3)
    dupes2 = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "dupes")).collect()
    }
    assert 9 in dupes2


def test_compaction_refuses_uncommitted_epoch_remnant(
    spark, run_ingest, tmp_path
):
    """A postings subdirectory without its replay marker is a crashed,
    uncommitted delivery; folding it into the flat files would make the
    epoch's redelivery double-append. Compaction must refuse."""
    import os

    from vector_db_mvp_spark.operators.substring import (
        compact_substring_state,
    )

    accepted, dupes, handler = run_ingest([[(1, BASE)], [(2, OTHER)]])
    state = str(tmp_path / "state")
    os.remove(handler._batch_marker(1))  # simulate the crash window
    assert compact_substring_state(spark, state, min_files=1) is False
    # restore the marker: compaction proceeds
    with open(handler._batch_marker(1), "w") as f:
        f.write("ok")
    assert compact_substring_state(spark, state, min_files=1) is True


def test_auto_compaction_mid_stream(spark, tmp_path):
    """compact_every folds the state after every N committed epochs
    WITHOUT changing gate behavior — the stream keeps gating correctly
    against the flattened state."""
    import os

    src = str(tmp_path / "in2")
    t0 = dt.datetime(2026, 2, 1, 9, 0, 0)
    batches = [[(1, BASE)], [(2, OTHER)], [(3, THIRD)], [(9, COPIER)]]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            [(d, t, t0 + dt.timedelta(minutes=i)) for d, t in rows], SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
    handler = SubstringIngest(
        str(tmp_path / "state2"),
        str(tmp_path / "accepted2"),
        str(tmp_path / "dupes2"),
        min_tokens=6,
        compact_every=2,
    )
    # low threshold so the mid-stream folds actually happen
    import vector_db_mvp_spark.operators.substring as subm

    orig = subm.compact_substring_state

    def eager_compact(spark_, path, **kw):
        kw["min_files"] = 1
        return orig(spark_, path, **kw)

    subm.compact_substring_state = eager_compact
    try:
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = substring_ingest_stream(
            stream, handler, checkpoint=str(tmp_path / "ckpt2")
        )
        q.awaitTermination(180)
    finally:
        subm.compact_substring_state = orig
    accepted = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "accepted2")).collect()
    }
    dupes = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "dupes2")).collect()
    }
    assert accepted == {1, 2, 3} and dupes == {9}
    postings = os.path.join(str(tmp_path / "state2"), "postings")
    # epoch 4's subdir may remain (written after the last fold); earlier
    # epochs are folded flat
    subdirs = [d for d in os.listdir(postings) if d.startswith("batch_")]
    assert len(subdirs) < len(batches)
