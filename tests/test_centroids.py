"""Per-group centroid operator: three implementations, one contract.

- native posexplode/partial-agg path (the scale path, oracle-checked)
- applyInPandas grouped-map twin
- GROUPED_AGG pandas UDAF (the X4 user-defined-aggregate surface)

All three must agree to float tolerance, and the UDAF must compose with
scalar aggregates in a single grouped pass.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.centroids import (
    centroid_udaf,
    label_centroids,
    label_centroids_pandas,
    mean_norm_udaf,
)
from vector_db_mvp_spark.sources.testdata import load_table
from vector_db_mvp_spark.workload.vector import QUERIES, ORACLE_SQL

from .oracle import assert_oracle_match


def _as_map(rows):
    return {r["label"]: (r["n_vectors"], list(r["centroid"])) for r in rows}


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_native_pandas_udaf_parity(spark, emb):
    native = _as_map(label_centroids(emb).collect())
    pandas_twin = _as_map(label_centroids_pandas(emb).collect())
    udaf = {
        r["label"]: list(r["centroid"])
        for r in emb.filter(F.col("embedding").isNotNull())
        .groupBy("label")
        .agg(
            centroid_udaf(F.col("embedding").cast("array<double>")).alias("centroid"),
        )
        .collect()
    }
    assert set(native) == set(pandas_twin) == set(udaf)
    for label in native:
        n_n, c_n = native[label]
        n_p, c_p = pandas_twin[label]
        assert n_n == n_p
        for c_o in (c_p, udaf[label]):
            assert len(c_n) == len(c_o) == 64
            assert all(
                math.isclose(a, b, rel_tol=0, abs_tol=1e-9)
                for a, b in zip(c_n, c_o)
            )


def test_udaf_composes_with_pandas_aggs(spark, emb):
    """The reason the UDAF surface exists: several vector aggregates in ONE
    grouped pass. (Catalyst only allows pandas UDAFs next to other pandas
    aggregates — mixing with F.count raises INVALID_PANDAS_UDF_PLACEMENT.)"""
    out = (
        emb.filter(F.col("embedding").isNotNull())
        .groupBy("label")
        .agg(
            centroid_udaf(F.col("embedding").cast("array<double>")).alias("centroid"),
            mean_norm_udaf(F.col("embedding").cast("array<double>")).alias("mean_norm"),
        )
        .collect()
    )
    # fixture embeddings are unit-normalized, so every group's mean norm is 1
    assert out and all(
        len(r["centroid"]) == 64 and math.isclose(r["mean_norm"], 1.0, abs_tol=1e-6)
        for r in out
    )


def test_centroid_is_elementwise_mean(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0, 6.0]), (2, [5.0, 5.0]), (2, None)],
        "label int, embedding array<double>",
    )
    got = _as_map(label_centroids(df).collect())
    assert got[1] == (2, [2.0, 4.0])
    assert got[2] == (1, [5.0, 5.0])  # null embedding excluded


def test_label_centroids_oracle(spark, sf_dir):
    assert_oracle_match(
        spark, sf_dir, QUERIES["label_centroids"], ORACLE_SQL["label_centroids"]
    )
