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
