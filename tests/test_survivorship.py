"""Survivorship golden-record merge (operators/survivorship.py)."""

from __future__ import annotations

import pytest

from vector_db_mvp_spark.operators.survivorship import golden_record


def _df(spark):
    rows = [
        # entity e1: brand mode B2 (2 vs 1), sizes 3/7/5, prices 9.0/2.5/4.0
        ("e1", "B2", "t1", 3, 9.0),
        ("e1", "B2", "t2", 7, 2.5),
        ("e1", "B1", "t2", 5, 4.0),
        # entity e2: brand tie B1/B3 (1 each) -> smaller value B1 wins
        ("e2", "B3", "t9", 1, 1.0),
        ("e2", "B1", "t9", 2, 8.0),
    ]
    return spark.createDataFrame(
        rows, "entity string, brand string, typ string, size int, price double"
    )


RULES = {"brand": "mode", "typ": "mode", "size": "max", "price": "min"}


def test_rules_and_mode_tiebreak(spark):
    got = {
        r["entity"]: r.asDict()
        for r in golden_record(_df(spark), entity_col="entity", rules=RULES).collect()
    }
    assert got["e1"] == {
        "entity": "e1", "n_records": 3, "brand": "B2", "typ": "t2",
        "size": 7, "price": 2.5,
    }
    # tie on count -> lexicographically smaller brand
    assert got["e2"]["brand"] == "B1"
    assert got["e2"]["n_records"] == 2
    assert got["e2"]["typ"] == "t9"


def test_partitioning_invariance(spark):
    base = golden_record(_df(spark), entity_col="entity", rules=RULES).collect()
    shuffled = golden_record(
        _df(spark).repartition(7), entity_col="entity", rules=RULES
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, shuffled))


def test_unknown_rule_raises(spark):
    with pytest.raises(ValueError, match="unknown survivorship rule"):
        golden_record(_df(spark), entity_col="entity", rules={"brand": "median"})
