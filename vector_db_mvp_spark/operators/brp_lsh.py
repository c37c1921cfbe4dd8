"""MLlib BucketedRandomProjectionLSH ANN — the packaged scale-out
alternative to the hand-rolled random-hyperplane index (SURVEY.md §2.3 J2 /
§2.5 T3: "MLlib BucketedRandomProjectionLSH on unit vectors; Euclidean on
unit vectors is monotone in cosine").

For unit vectors, ||a-b||² = 2 - 2·cos(a,b), so Euclidean NN order == cosine
NN order; fitting BRP-LSH on unit-normalized embeddings gives a
cosine-compatible ANN index with MLlib's distributed build. Use where the
operational simplicity of a maintained implementation beats exact
bucket-parity with the reference (which the custom operators/lsh.py keeps).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import unit_normalize


def build_brp_index(
    df: DataFrame,
    *,
    embedding_col: str = "embedding",
    bucket_length: float = 1.0,
    num_hash_tables: int = 4,
    seed: int = 42,
):
    """Fit BRP-LSH on unit-normalized vectors. Returns (model, features_df)
    where features_df carries a ``_features`` ml-vector column."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feat = df.filter(F.col(embedding_col).isNotNull()).withColumn(
        "_features",
        array_to_vector(unit_normalize(F.col(embedding_col)).cast("array<double>")),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    return brp.fit(feat), feat


def brp_topk(
    model,
    features_df: DataFrame,
    query_vector: Sequence[float],
    k: int,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """approxNearestNeighbors on the unit sphere -> (id, score) with score
    converted back to cosine via cos = 1 - dist²/2."""
    import numpy as np
    from pyspark.ml.linalg import Vectors

    q = np.asarray(query_vector, dtype=np.float64)
    n = float(np.linalg.norm(q))
    if n != 0.0:
        q = q / n
    hits = model.approxNearestNeighbors(features_df, Vectors.dense(q), k)
    return hits.select(
        id_col,
        (F.lit(1.0) - F.col("distCol") * F.col("distCol") / F.lit(2.0)).alias("score"),
    )
