"""int8 embedding quantization: reconstruction error bound, null/zero
handling, storage-size win, and top-k ranking survival."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vector_db_mvp_spark.operators.quantize import (
    dequantize_embedding,
    with_quantized,
)
from vector_db_mvp_spark.operators.topk import topk_cosine
from vector_db_mvp_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def quantized(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return with_quantized(emb).withColumn(
        "embedding_dq", dequantize_embedding(F.col("embedding_q"))
    ).cache()


def test_reconstruction_error_bounded(quantized):
    """|x - dq(q(x))| <= scale/2 elementwise (round-to-nearest)."""
    bad = quantized.select(
        F.exists(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("embedding_dq").cast("array<double>"),
                lambda a, b: F.abs(a - b)
                > (F.col("embedding_q.scale").cast("double") / 2 + F.lit(1e-6)),
            ),
            lambda x: x,
        ).alias("bad")
    ).filter(F.col("bad")).count()
    assert bad == 0


def test_zero_and_null_vectors(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, None), (2, [1.0, -1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in with_quantized(df).collect()}
    assert rows[1]["embedding_q"] is None
    assert rows[0]["embedding_q"]["scale"] == 0.0
    assert list(rows[0]["embedding_q"]["codes"]) == [0, 0]
    assert list(rows[2]["embedding_q"]["codes"]) == [127, -127]


def test_topk_ranking_survives_quantization(spark, quantized):
    """Top-10 cosine over dequantized vectors overlaps >= 8/10 with exact —
    the property that makes int8 a safe serving tier."""
    q = [float(x) for x in quantized.head()["embedding"]]
    exact = [r["vec_id"] for r in topk_cosine(quantized, q, 10).collect()]
    approx = [
        r["vec_id"]
        for r in topk_cosine(quantized, q, 10, embedding_col="embedding_dq").collect()
    ]
    assert len(set(exact) & set(approx)) >= 8
    assert exact[0] == approx[0]  # the top hit must not change


def test_codes_are_tinyint(quantized):
    dtype = dict(quantized.dtypes)["embedding_q"]
    assert "tinyint" in dtype  # 1 byte/dim on disk vs 4 for float
