"""Parquet sources for the driver-generated fixture tables (TESTDATA.md).

Scale note: each table is a single parquet file locally; at 100 TB the same
loader points at a partitioned directory tree (e.g. chunks partitioned by
``library_id``) and nothing else changes — ``spark.read.parquet`` handles
partition discovery/pruning, and filters expressed declaratively downstream
reach the scan as PushedFilters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Schema comes from the parquet footer (the files
    are driver-written with fixed schemas; see FIXTURES.md §2).

    The ``events`` fixture stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    vectorized parquet reader rejects; we read nanos as long (legacy conf) and
    convert to a microsecond TimestampType column. Truncation ns→µs is safe:
    every query over events aggregates at second-or-coarser granularity.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            # Integer division: `/` would route through DOUBLE, and ~1.7e18
            # nanos exceeds the 53-bit mantissa -> off-by-1µs truncation.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    """Register each fixture table as a temp view so operators can be written
    in either DataFrame or ``spark.sql`` form against the same names DuckDB
    pre-registers for the oracle."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
