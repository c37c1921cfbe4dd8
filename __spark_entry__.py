"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (filtered top-k cosine search) on
sf0.001. ``queries()``/``oracle_sql()`` expose the full operator inventory
from ``vector_db_mvp_spark.queries`` for the duckdb-oracle correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_db_mvp_spark.shipping import ensure_package_shipped  # noqa: E402
from vector_db_mvp_spark.workload import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_package_shipped(spark)
    return QUERIES["topk_cosine_brute"](spark, "/root/testdata/sf0.001")


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_package_shipped(spark)
        return fn(spark, sf_dir)

    return wrapper


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipped(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
