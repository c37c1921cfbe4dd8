"""Scalar int8 embedding quantization — a storage-tier operator for the
100 TB regime: a float32 embedding column costs 4·D bytes/row; symmetric
per-vector int8 quantization cuts it to D bytes + one float scale, which is
the difference between a 100 TB and a 25 TB vector corpus (plus 4x less
scan IO for every ANN probe).

Scheme: per vector, ``scale = max(|x|) / 127``; ``q_i = round(x_i / scale)``
(zero vector -> scale 0, all-zero codes). Dequantized value ``q_i * scale``
is within scale/2 of the original, so cosine rankings survive (recall
pinned by test). All native expressions — quantization runs inside
whole-stage codegen next to the write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_embedding(v: Column) -> Column:
    """array<float> -> struct(scale: float, codes: array<tinyint>)."""
    vd = v.cast("array<double>")
    amax = F.aggregate(vd, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = amax / F.lit(127.0)
    codes = F.when(scale == 0.0, F.transform(vd, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(vd, lambda x: F.round(x / scale).cast("tinyint"))
    )
    return F.struct(scale.cast("float").alias("scale"), codes.alias("codes"))


def dequantize_embedding(q: Column) -> Column:
    """struct(scale, codes) -> array<float> approximation."""
    return F.transform(
        q["codes"], lambda c: (c.cast("double") * q["scale"].cast("double")).cast("float")
    )


def with_quantized(df: DataFrame, *, embedding_col: str = "embedding",
                   out_col: str = "embedding_q") -> DataFrame:
    return df.withColumn(
        out_col,
        F.when(F.col(embedding_col).isNull(), F.lit(None)).otherwise(
            quantize_embedding(F.col(embedding_col))
        ),
    )
