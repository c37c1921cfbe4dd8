"""Query inventory: every operator from SURVEY.md §2 (plus north-star
LLM-data-pipeline operators) as (Spark plan, DuckDB oracle SQL) pairs,
assembled from per-domain modules.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame; each
oracle is ANSI SQL DuckDB runs over the same parquet views. Columns are
aliased identically on both sides (the driver hash-compares after sorting
columns by name). Queries without an oracle entry get the driver's weaker
rows-only check (genuinely non-SQL-expressible ops only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import curation, media, relational, text, vector

_MODULES = (vector, relational, text, curation, media)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

for _m in _MODULES:
    _overlap = set(QUERIES) & set(_m.QUERIES)
    assert not _overlap, f"duplicate query names: {_overlap}"
    QUERIES.update(_m.QUERIES)
    ORACLE_SQL.update(_m.ORACLE_SQL)
