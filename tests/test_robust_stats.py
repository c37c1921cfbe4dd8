"""Regression pins for the exact robust-statistics queries (ADVICE r8).

- price_mad_by_flag's median/MAD folds must yield NULL for a return flag
  with ZERO rows instead of fabricating min(value)-over-the-domain (the
  2*cum >= N_f predicate is vacuously true when N_f = 0).
- spearman_quantity_price's rank sums accumulate as DECIMAL(38,0), not
  BIGINT (sx totals n(n+1) — int64 wraps silently at n ~ 3e9 rows).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.workload.relational import (
    q_price_mad_by_flag,
    q_spearman_quantity_price,
)


@pytest.fixture(scope="module")
def lineitem_no_r(spark, sf_dir, tmp_path_factory):
    """A lineitem fixture with every 'R' row removed — one flag group empty."""
    out = tmp_path_factory.mktemp("mad-empty-flag")
    (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .filter(F.col("l_returnflag") != "R")
        .write.mode("overwrite")
        .parquet(str(out / "lineitem.parquet"))
    )
    return str(out)

def test_mad_empty_flag_yields_null(spark, lineitem_no_r):
    rows = {r["returnflag"]: r for r in q_price_mad_by_flag(spark, lineitem_no_r).collect()}
    assert set(rows) == {"A", "N", "R"}
    r = rows["R"]
    assert r["n_rows"] == 0
    assert r["median_price"] is None
    assert r["mad_price"] is None
    assert r["n_outliers"] == 0
    # Non-empty groups still produce real medians.
    for f in ("A", "N"):
        assert rows[f]["n_rows"] > 0
        assert rows[f]["median_price"] is not None
        assert rows[f]["mad_price"] is not None


def test_spearman_moments_are_decimal38(spark, sf_dir):
    df = q_spearman_quantity_price(spark, sf_dir)
    row = df.collect()[0]
    assert row["n_rows"] > 0
    assert -1.0 <= row["rho"] <= 1.0
    # Pin the overflow-proof accumulator types on the moments frame's
    # SCHEMA (stable across Spark versions, unlike optimized-plan text):
    # all five moment sums must be DECIMAL(38,0), never a wrapping BIGINT.
    from vector_db_mvp_spark.sources.testdata import load_table
    from vector_db_mvp_spark.workload.relational import _spearman_moments

    moments = _spearman_moments(load_table(spark, sf_dir, "lineitem"))
    dtypes = dict(moments.dtypes)
    assert dtypes["n"] == "bigint"
    for col in ("sx", "sy", "sxx", "syy", "sxy"):
        assert dtypes[col] == "decimal(38,0)", (col, dtypes[col])
