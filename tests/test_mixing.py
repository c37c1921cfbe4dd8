"""Temperature-scaled mixture sampling (operators/mixing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.mixing import temperature_mix
from vector_db_mvp_spark.sources.testdata import load_table


def test_quota_follows_temperature_not_raw_share(spark):
    # skewed corpus: big source 90 docs, small source 10. With alpha=0.5 the
    # small source gets sqrt-weighted: quota ratio 3:1, not 9:1.
    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, total=40, alpha=0.5)
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # weights: sqrt(90)=9.487, sqrt(10)=3.162 -> big 30, small 10
    assert got == {"big": 30, "small": 10}


def test_alpha_one_is_proportional_and_alpha_zero_uniform(spark):
    rows = [(i, "a") for i in range(80)] + [(200 + i, "b") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    prop = temperature_mix(df, total=50, alpha=1.0)
    got = {r["source"]: r["quota"] for r in prop.select("source", "quota").distinct().collect()}
    assert got == {"a": 40, "b": 10}
    flat = temperature_mix(df, total=40, alpha=0.0)
    got0 = {r["source"]: r["quota"] for r in flat.select("source", "quota").distinct().collect()}
    assert got0 == {"a": 20, "b": 20}


def test_small_source_contributes_everything_it_has(spark):
    rows = [(i, "a") for i in range(100)] + [(200, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, total=80, alpha=0.5)
    tiny = out.filter(F.col("source") == "tiny").count()
    assert tiny == 1  # quota may exceed 1, but only 1 doc exists


def test_selection_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(r["doc_id"] for r in temperature_mix(docs, total=30).collect())
    b = sorted(r["doc_id"] for r in temperature_mix(docs, total=30).collect())
    assert a == b and len(a) > 0


def test_char_budget_mix_rejects_alpha_above_one(spark):
    """alpha > 1 inverts the capping order the prefix closed form needs
    (total/w = total^(1-alpha) stops being non-decreasing) — both the
    operator and its oracle twin must refuse rather than mis-plan."""
    import pytest

    from vector_db_mvp_spark.operators.mixing import (
        char_budget_mix,
        sql_char_budget_mix,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 1000)], "doc_id int, lang string, n_chars int"
    )
    with pytest.raises(ValueError, match="alpha"):
        char_budget_mix(df, budget=100, alpha=1.5)
    with pytest.raises(ValueError, match="alpha"):
        sql_char_budget_mix(budget=100, alpha=1.5)
    # boundary values stay accepted (both groups fit: everything kept)
    assert char_budget_mix(df, budget=2000, alpha=1.0).count() == 2
    assert char_budget_mix(df, budget=2000, alpha=0.0).count() == 2
