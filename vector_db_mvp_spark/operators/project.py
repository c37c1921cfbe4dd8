"""Random-projection dimensionality reduction for embedding columns.

Johnson-Lindenstrauss random projection (Achlioptas, "Database-friendly
random projections", PODS'01): multiplying each embedding by a fixed k x d
Gaussian matrix approximately preserves pairwise geometry while cutting
storage/compute by d/k. In a curation pipeline this is the cheap first
pass — candidate generation, clustering, or pre-filters run on the k-dim
sketch; exact scoring stays on the full vectors.

Implementation notes:
- The projection matrix comes from the SAME seeded generator as the LSH
  planes (``functions/lsh.generate_planes`` — reference-compatible
  ``random.Random(seed).gauss`` sequence), so any engine can regenerate it
  from the seed; no matrix needs to ship with the data.
- The k dot products are rendered as ONE Spark SQL string and parsed with a
  single ``F.expr`` — building the expression tree via the Column API costs
  a py4j round-trip per literal (k*d of them, seconds of driver time).
- Pure map work in whole-stage codegen: no shuffle, no Python, parallelism
  = input splits. The Arrow-matmul pandas path (``functions/lsh.
  bucket_codes_pandas``) is the alternative at very large k*d; for k*d up
  to a few thousand the native fold wins by staying JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lsh import generate_planes, spark_sql_plane_dot, sql_plane_dot


def projection_planes(dim: int, k: int, *, seed: int = 7) -> list[list[float]]:
    """k unit-normalized d-vectors from the seeded reference RNG."""
    return generate_planes(dim, num_tables=1, num_planes=k, seed=seed)[0]


def random_projection(
    df: DataFrame,
    planes: list[list[float]],
    *,
    embedding_col: str = "embedding",
    out_prefix: str = "p",
) -> DataFrame:
    """Append one DOUBLE column per plane: ``p0..p{k-1}`` = plane dots.
    Flat columns (not an array) so results stay hashable for exact
    engine-to-engine comparison and prune column-wise in parquet."""
    cols = [
        F.expr(spark_sql_plane_dot(embedding_col, plane)).alias(f"{out_prefix}{i}")
        for i, plane in enumerate(planes)
    ]
    return df.select("*", *cols)


def sql_random_projection(
    planes: list[list[float]],
    *,
    embedding_expr: str = "embedding",
    out_prefix: str = "p",
    round_to: int = 6,
) -> list[str]:
    """DuckDB twins of the projection columns (one SELECT item per plane)."""
    return [
        f"round({sql_plane_dot(embedding_expr, plane)}, {round_to}) AS {out_prefix}{i}"
        for i, plane in enumerate(planes)
    ]
