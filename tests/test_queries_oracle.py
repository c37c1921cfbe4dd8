"""Every entry in the query inventory must hash-match its DuckDB oracle —
the local mirror of the driver's CORRECTNESS gate (run at sf0.001 for speed;
the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from vector_db_mvp_spark.workload import ORACLE_SQL, QUERIES

from .oracle import assert_oracle_match


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, sf_dir, name):
    assert_oracle_match(spark, sf_dir, QUERIES[name], ORACLE_SQL[name])


def test_all_oracle_keys_have_queries():
    assert set(ORACLE_SQL) <= set(QUERIES)
