"""Streaming CM-sketch maintenance (streaming/sketch_stream.py): the
maintained sketch must equal the one-shot batch sketch over the same rows,
and replays must be no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_mvp_spark.functions.text import tokens
from vector_db_mvp_spark.operators.sketch import cms_heavy_hitters
from vector_db_mvp_spark.sources.testdata import load_table
from vector_db_mvp_spark.streaming.sketch_stream import CmsIngest, start_cms_stream


def _token_stream_dir(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    src = str(tmp_path / "toks_in")
    # two files -> the file source can deliver multiple micro-batches
    toks.repartition(2).write.parquet(src)
    return src, toks


def test_maintained_sketch_equals_batch_sketch(spark, sf_dir, tmp_path):
    src, toks = _token_stream_dir(spark, sf_dir, tmp_path)
    handler = CmsIngest(
        spark, str(tmp_path / "cms_state"), "tok", depth=4, width=256
    )
    stream = spark.readStream.schema(toks.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = start_cms_stream(stream, handler, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = [
        (r["value"], r["est_count"])
        for r in handler.estimate_topk(toks, "tok", k=25).collect()
    ]
    want = [
        (r["value"], r["est_count"])
        for r in cms_heavy_hitters(toks, "tok", depth=4, width=256, k=25).collect()
    ]
    assert got == want
    # bounded state: at most depth x width counter rows
    assert handler.counters().count() <= 4 * 256


def test_replay_same_checkpoint_is_noop(spark, sf_dir, tmp_path):
    src, toks = _token_stream_dir(spark, sf_dir, tmp_path)
    handler = CmsIngest(
        spark, str(tmp_path / "cms_state2"), "tok", depth=2, width=64
    )
    ckpt = str(tmp_path / "ckpt2")
    stream = spark.readStream.schema(toks.schema).parquet(src)
    start_cms_stream(stream, handler, checkpoint_dir=ckpt).awaitTermination(120)
    before = sorted(
        (r["r"], r["h"], r["c"]) for r in handler.counters().collect()
    )
    # restart over the SAME checkpoint: no new source files -> no batches;
    # and directly re-invoking an already-applied epoch is a marker no-op.
    stream2 = spark.readStream.schema(toks.schema).parquet(src)
    start_cms_stream(stream2, handler, checkpoint_dir=ckpt).awaitTermination(120)
    batch = spark.read.parquet(src)
    handler(batch, 0)  # replay of epoch 0 under the same run scope
    after = sorted(
        (r["r"], r["h"], r["c"]) for r in handler.counters().collect()
    )
    assert after == before


def test_maintained_kmv_equals_batch_sketch(spark, sf_dir, tmp_path):
    from vector_db_mvp_spark.operators.sketch import kmv_distinct
    from vector_db_mvp_spark.streaming.sketch_stream import KmvIngest

    ev = load_table(spark, sf_dir, "events")
    handler = KmvIngest(
        spark, str(tmp_path / "kmv_state"), "event_type", "user_id", k=16
    )
    # three uneven batches, with overlap in user ids across batches
    handler(ev.filter(F.col("event_id") % 3 == 0), 0)
    handler(ev.filter(F.col("event_id") % 3 == 1), 1)
    handler(ev.filter(F.col("event_id") % 3 == 2), 2)
    got = sorted(tuple(r) for r in handler.estimates().collect())
    want = sorted(
        (r["event_type"], r["k_used"], r["distinct_estimate"])
        for r in kmv_distinct(ev, "event_type", "user_id", k=16).collect()
    )
    assert got == want
    # bounded state: at most k rows per group
    per_group = (
        handler.state.read().groupBy("event_type").count().collect()
    )
    assert all(r["count"] <= 16 for r in per_group)
    # replay of an applied batch is a no-op
    before = got
    handler(ev.filter(F.col("event_id") % 3 == 0), 0)
    after = sorted(tuple(r) for r in handler.estimates().collect())
    assert after == before
