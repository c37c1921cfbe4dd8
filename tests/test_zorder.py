"""Z-order clustering and its data-skipping effect (operators/zorder.py)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.zorder import write_zordered, z_value


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a int, b int")
    got = df.select(z_value(F.col("a"), F.col("b"), bits=3).alias("z")).collect()[0].z
    # a bits at even positions: 1,0,1 -> 1 + 0 + 16; b at odd: 1,1,0 -> 2 + 8.
    assert got == 1 + 16 + 2 + 8  # 0b011011


def test_z_value_monotone_in_quadrants(spark):
    """All Z-values of the low quadrant (a,b < 2^k) sort before any point
    with a high bit set in either column — the locality guarantee."""
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "a int, b int")
    vals = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", z_value(F.col("a"), F.col("b")).alias("z")).collect()
    }
    low = max(vals[(a, b)] for a in range(4) for b in range(4))
    high = min(v for (a, b), v in vals.items() if a >= 4 or b >= 4)
    assert low < high


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def _avg_span(ranges: list[tuple[int, int]]) -> float:
    return sum(hi - lo for lo, hi in ranges) / len(ranges)


def test_zorder_narrows_minmax_on_both_columns(spark, tmp_path):
    """The skipping effect, measured on parquet footer stats: under
    Z-order BOTH columns' per-file min-max spans shrink far below the
    domain; under a single-column sort the other column's spans stay
    domain-wide."""
    n = 1 << 12
    domain = 1 << 6  # x, y in [0, 64)
    # The full 64x64 grid: x and y are independent, so a single-column
    # sort cannot help the other column.
    df = (
        spark.range(n)
        .select(
            (F.col("id") % domain).cast("int").alias("x"),
            (F.col("id") / domain).cast("int").alias("y"),
        )
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zpath, "x", "y", num_files=16, bits=6)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )
    # Single-column sort: y spans stay ~domain-wide.
    assert _avg_span(_file_ranges(spath, "y")) > domain * 0.8
    # Z-order: both columns' spans contract well below the domain.
    assert _avg_span(_file_ranges(zpath, "x")) < domain * 0.6
    assert _avg_span(_file_ranges(zpath, "y")) < domain * 0.6


def test_zorder_write_roundtrips_rows(spark, tmp_path):
    df = spark.createDataFrame([(i, i * 3 % 7) for i in range(100)], "a int, b int")
    path = str(tmp_path / "rt")
    write_zordered(df, path, "a", "b", num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert "_z" not in back.columns
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
