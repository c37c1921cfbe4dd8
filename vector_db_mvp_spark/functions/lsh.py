"""Random-hyperplane LSH primitives (reference F4/F5,
``app/indexing/lsh.py:31-64``).

Plane generation reproduces the reference bit-for-bit: one shared
``random.Random(seed)`` drawing ``gauss(0,1)`` in (table, plane, dim) order,
each plane L2-normalized (``lsh.py:43-52``). Planes are generated on the
driver and embedded in the plan as literals / broadcast numpy — tiny
(T*P*D doubles) and exact, which is what guarantees bucket parity.

Bucket code (reference ``lsh.py:58-64``): P-bit integer, bit i set iff
``dot(v, plane_i) >= 0``. The reference hashes the *unit* vector, but
``sign(dot(unit(v), p)) == sign(dot(v, p))`` for any ``v`` (positive norm;
the zero vector is left unchanged by ``_unit``), so we hash raw vectors and
skip a normalization pass.

Two implementations of the same function:
- ``bucket_codes_native`` — pure Catalyst expressions with sequential folds;
  bitwise-identical to the DuckDB oracle, used by oracle-checked queries.
- ``bucket_codes_pandas`` — Arrow-batched numpy ``V @ P.T`` sign bits; the
  throughput path for index builds at scale (one BLAS matmul per batch
  instead of T*P scalar folds per row).
The two agree except when a dot lands within float-reordering distance of
exactly 0.0 — probability ~0 for real embeddings.
"""

from __future__ import annotations

import math
import random
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def generate_planes(
    dim: int, num_tables: int = 8, num_planes: int = 12, seed: int = 42
) -> list[list[list[float]]]:
    """planes[t][p] = unit-normalized D-vector; same RNG sequence as the
    reference (lsh.py:37,45-52)."""
    rng = random.Random(seed)
    planes: list[list[list[float]]] = []
    for _ in range(num_tables):
        table = []
        for _ in range(num_planes):
            vec = [rng.gauss(0.0, 1.0) for _ in range(dim)]
            n = math.sqrt(sum(x * x for x in vec))
            if n != 0.0:
                vec = [x / n for x in vec]
            table.append(vec)
        planes.append(table)
    return planes


def _plane_dot(v: Column, plane: list[float]) -> Column:
    """Sequential-fold dot of an embedding column with a literal plane."""
    lit_plane = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(v.cast("array<double>"), lit_plane, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def bucket_codes_native(v: Column, planes: list[list[list[float]]]) -> Column:
    """array<long> of per-table bucket codes, as native expressions."""
    table_codes = []
    for table in planes:
        code = F.lit(0).cast("long")
        for i, plane in enumerate(table):
            bit = F.when(_plane_dot(v, plane) >= 0.0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            code = code + bit
        table_codes.append(code)
    return F.array(*table_codes)


def bucket_codes_pandas(planes: list[list[list[float]]], embedding_col: str = "embedding"):
    """mapInPandas-free scalar pandas UDF: codes for a batch via one matmul.

    Returns a pandas_udf producing array<long>. ``P`` is captured in the
    closure and shipped once per executor (broadcast-by-closure; T*P*D
    doubles — a few KB)."""
    P = np.asarray(planes, dtype=np.float64)  # (T, P, D)
    T, Pn, D = P.shape
    flat = P.reshape(T * Pn, D)  # (T*P, D)
    weights = (1 << np.arange(Pn, dtype=np.int64))  # (P,)

    @F.pandas_udf(ArrayType(LongType()))
    def _codes(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            out = []
            vecs = s.to_numpy()
            for v in vecs:
                if v is None:
                    out.append(None)
                    continue
                bits = (np.asarray(v, dtype=np.float64) @ flat.T) >= 0.0  # (T*P,)
                codes = (bits.reshape(T, Pn) * weights).sum(axis=1)
                out.append(codes.tolist())
            yield pd.Series(out)

    return _codes(F.col(embedding_col))


# --- DuckDB oracle SQL generation (mirrors bucket_codes_native exactly) ----

def sql_plane_dot(vec_expr: str, plane: list[float]) -> str:
    lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
    return (
        f"list_sum(list_transform(list_zip(CAST({vec_expr} AS DOUBLE[]), "
        f"CAST({lit} AS DOUBLE[])), p -> p[1] * p[2]))"
    )


def sql_bucket_code(vec_expr: str, table: list[list[float]]) -> str:
    bits = [
        f"(CASE WHEN {sql_plane_dot(vec_expr, plane)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(table)
    ]
    return "(" + " + ".join(bits) + ")"
