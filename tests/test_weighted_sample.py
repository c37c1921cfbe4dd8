"""A-ES deterministic weighted sampling (operators/sampling.py)."""

from __future__ import annotations

from vector_db_mvp_spark.operators.sampling import weighted_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, w double")


def test_reproducible_and_k_sized(spark):
    rows = [(i, 1.0 + (i % 7)) for i in range(200)]
    a = weighted_sample(_docs(spark, rows), id_col="doc_id", weight_col="w", k=20)
    b = weighted_sample(_docs(spark, rows), id_col="doc_id", weight_col="w", k=20)
    ids_a = [r.doc_id for r in a.collect()]
    assert len(ids_a) == 20
    assert ids_a == [r.doc_id for r in b.collect()]


def test_heavy_rows_overrepresented(spark):
    """Rows with 10x weight should dominate the sample (A-ES inclusion is
    weight-proportional; with 100 heavy vs 100 light at 10:1, expectation
    for heavy is >> half)."""
    rows = [(i, 10.0) for i in range(100)] + [(i, 1.0) for i in range(100, 200)]
    out = weighted_sample(
        _docs(spark, rows), id_col="doc_id", weight_col="w", k=40
    ).collect()
    heavy = sum(1 for r in out if r.doc_id < 100)
    assert heavy >= 30  # md5-deterministic, pinned: heavy class dominates


def test_nonpositive_weights_excluded(spark):
    rows = [(1, 0.0), (2, -3.0), (3, 2.0)]
    out = weighted_sample(
        _docs(spark, rows), id_col="doc_id", weight_col="w", k=10
    ).collect()
    assert [r.doc_id for r in out] == [3]
