"""Binary sign-bit quantization ANN (operators/binary.py): pack
correctness, Hamming kernel, recall floor vs brute force, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.binary import (
    binary_topk,
    hamming_to_query,
    pack_sign_bits,
    pack_sign_bits_py,
)
from vector_db_mvp_spark.operators.topk import topk_cosine
from vector_db_mvp_spark.sources.testdata import load_table


def test_pack_py_and_spark_agree(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    got = emb.select(
        "vec_id", "embedding", pack_sign_bits(F.col("embedding"), 64).alias("w")
    ).collect()
    for r in got:
        assert list(r["w"]) == pack_sign_bits_py(r["embedding"]), r["vec_id"]


def test_pack_known_pattern(spark):
    # bits 0 and 33 set -> words [1, 2]
    vec = [0.0] * 64
    vec[0] = 0.5
    vec[33] = 0.1
    vec[5] = -0.9  # negative -> not set
    assert pack_sign_bits_py(vec) == [1, 2]
    df = spark.createDataFrame([(vec,)], "embedding array<float>")
    row = df.select(pack_sign_bits(F.col("embedding"), 64).alias("w")).first()
    assert list(row["w"]) == [1, 2]


def test_hamming_zero_to_self(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(5)
    rows = emb.collect()
    for r in rows:
        qw = pack_sign_bits_py(r["embedding"])
        ham = (
            emb.filter(F.col("vec_id") == r["vec_id"])
            .select(
                hamming_to_query(
                    pack_sign_bits(F.col("embedding"), 64), qw
                ).alias("h")
            )
            .first()["h"]
        )
        assert ham == 0


def test_recall_floor_vs_brute(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {
        r["vec_id"]
        for r in topk_cosine(emb, qv, 10, score_decimals=6).collect()
    }
    approx = {
        r["vec_id"]
        for r in binary_topk(emb, qv, 10, dim=64, candidates=100).collect()
    }
    # sign-bit codes with a 100-candidate cut must beat random by far;
    # random 10-of-500 expectation is ~0.2 overlap
    assert len(exact & approx) >= 5


def test_plan_take_ordered_no_shuffle_in_scan(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    df = binary_topk(emb, qv, 10, dim=64, candidates=100)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
