"""Welch's t-test and WOE/IV binning against pure-Python references."""

from __future__ import annotations

import math

import pytest


def _orders_free_welch(spark, tmp_path, rows):
    """Build a tiny lineitem parquet and run the registered query."""
    import pandas as pd

    from vector_db_mvp_spark.workload.relational import (
        q_welch_ttest_price_by_flag,
    )

    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame(
        {
            "l_orderkey": range(len(rows)),
            "l_partkey": [1] * len(rows),
            "l_suppkey": [1] * len(rows),
            "l_linenumber": [1] * len(rows),
            "l_quantity": [1.0] * len(rows),
            "l_extendedprice": [r[1] for r in rows],
            "l_discount": [0.0] * len(rows),
            "l_tax": [0.0] * len(rows),
            "l_returnflag": [r[0] for r in rows],
            "l_linestatus": ["O"] * len(rows),
            "l_shipdate": ["1995-01-01"] * len(rows),
            "l_commitdate": ["1995-01-01"] * len(rows),
            "l_receiptdate": ["1995-01-01"] * len(rows),
            "l_shipinstruct": [""] * len(rows),
            "l_shipmode": [""] * len(rows),
            "l_comment": [""] * len(rows),
        }
    ).to_parquet(d / "lineitem.parquet")
    return q_welch_ttest_price_by_flag(spark, str(d)).collect()[0]


def test_welch_matches_textbook_formula(spark, tmp_path):
    a = [10.0, 12.0, 11.0, 13.0, 9.0]
    b = [20.0, 22.0, 19.0, 21.0]
    rows = [("A", x) for x in a] + [("R", x) for x in b]
    r = _orders_free_welch(spark, tmp_path, rows)

    def _var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va, vb = _var(a), _var(b)
    se2 = va / len(a) + vb / len(b)
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert r.n_a == 5 and r.n_b == 4
    assert r.mean_a == pytest.approx(ma, abs=1e-6)
    assert r.mean_b == pytest.approx(mb, abs=1e-6)
    assert r.t_stat == pytest.approx(t, abs=1e-5)
    assert r.welch_df == pytest.approx(df, abs=1e-3)


def test_welch_identical_groups_give_zero_t(spark, tmp_path):
    rows = [("A", x) for x in (5.0, 7.0, 9.0)] + [
        ("R", x) for x in (5.0, 7.0, 9.0)
    ]
    r = _orders_free_welch(spark, tmp_path, rows)
    assert r.t_stat == pytest.approx(0.0, abs=1e-9)


def test_woe_iv_sums_and_signs(spark, sf_dir):
    """Per-bin good/bad counts partition the corpus; WOE sign follows the
    good/bad ratio against the global ratio; IV terms are non-negative."""
    from vector_db_mvp_spark.workload.relational import q_price_woe_iv

    rows = q_price_woe_iv(spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    g = sum(r.n_good for r in rows)
    b = sum(r.n_bad for r in rows)
    assert g > 0 and b > 0
    for r in rows:
        expect_woe = math.log((r.n_good / g) / (r.n_bad / b))
        assert r.woe == pytest.approx(expect_woe, abs=2e-6)
        assert r.iv_term >= 0  # (pg-pb) and ln(pg/pb) share sign
