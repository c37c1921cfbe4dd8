"""Local mirror of the driver's duckdb-oracle comparison: run a Spark query
and its oracle SQL over the same parquet, compare row counts + sorted values."""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\x00<NULL>"
    if isinstance(v, float):
        return str(round(v, 9))
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return str(v)


def rows_match(spark_df, con, sql: str) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    sp = sp.reindex(sorted(sp.columns), axis=1)
    du = du.reindex(sorted(du.columns), axis=1)
    if list(sp.columns) != list(du.columns):
        return False, f"columns differ: spark={list(sp.columns)} duck={list(du.columns)}"
    if len(sp) != len(du):
        return False, f"row counts differ: spark={len(sp)} duck={len(du)}"
    a = sorted(tuple(_norm(v) for v in row) for row in sp.itertuples(index=False, name=None))
    b = sorted(tuple(_norm(v) for v in row) for row in du.itertuples(index=False, name=None))
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ, first diffs: {diff}"
    return True, "ok"


def assert_oracle_match(spark, sf_dir: str, query_fn, sql: str):
    con = duck_connection(sf_dir)
    try:
        ok, msg = rows_match(query_fn(spark, sf_dir), con, sql)
        assert ok, msg
    finally:
        con.close()
