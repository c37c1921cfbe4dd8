"""Z-order (Morton) clustering for multi-column data skipping.

Parquet scans prune row groups / files by min-max statistics, but sorting
on ONE column destroys locality on every other. Interleaving the bits of
two key columns into a Z-value and range-partitioning + sorting on it
keeps BOTH columns' min-max ranges narrow per file, so predicates on
either (or both) prune — the technique behind Delta/Iceberg ``ZORDER BY``.

The Z-value is a pure Catalyst expression (unrolled shift/mask fold —
whole-stage codegen, no UDF); the write is
``repartitionByRange(z).sortWithinPartitions(z)``, i.e. one range shuffle,
which is exactly what a single-column sort-write costs — the clustering is
free at write time and pays off on every subsequent scan.

tests/test_zorder.py verifies the skipping effect directly on parquet
footer statistics: per-file min-max ranges of BOTH columns must be
narrow under Z-order where a single-column sort leaves one column's
ranges spanning the whole domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, *, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative int
    columns: bit i of ``a`` lands at position 2i, bit i of ``b`` at
    2i+1. Unrolled to a fixed shift/mask expression tree."""
    a = a.cast("long")
    b = b.cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered on the
    Z-value of (col_a, col_b). One range shuffle; the helper column is
    dropped before writing."""
    z = z_value(F.col(col_a), F.col(col_b), bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def sql_z_value(a_sql: str, b_sql: str, *, bits: int = 16) -> str:
    """SQL twin of :func:`z_value` (DuckDB and Spark SQL share >>, &, <<,
    |) — lets an external oracle verify the interleave bit-for-bit."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a_sql} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b_sql} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
