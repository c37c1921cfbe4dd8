"""ANF neighborhood function (operators/anf.py) and the Gini/Benford
workload queries against hand-computable inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.anf import anf_rounds


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _sym(pairs):
    return pairs + [(b, a) for a, b in pairs]


def test_anf_monotone_and_saturates(spark):
    """Path a-b-c-d: N(t) grows each round until the diameter, then
    freezes; with few distinct nodes the HLL estimate is near-exact so
    the per-round ball sizes match BFS exactly."""
    e = _edges(spark, _sym([("a", "b"), ("b", "c"), ("c", "d")]))
    rows = {r.t: r for r in anf_rounds(e, 4).collect()}
    assert [rows[t].n_nodes for t in range(5)] == [4] * 5
    sums = [rows[t].sum_ball_est for t in range(5)]
    assert sums[0] <= sums[1] <= sums[2] <= sums[3]
    # diameter 3: round 3 saturates, round 4 must not grow
    assert sums[3] == sums[4]
    # small-range LinearCounting correction: tiny balls estimate near
    # their exact sizes (t=0: every ball is exactly 1)
    assert rows[0].avg_ball == pytest.approx(1.0, abs=0.05)
    assert rows[3].avg_ball == pytest.approx(4.0, rel=0.1)


def test_anf_disconnected_components_do_not_mix(spark):
    """Two disjoint edges: balls never exceed their component size."""
    e = _edges(spark, _sym([("a", "b"), ("x", "y")]))
    rows = {r.t: r for r in anf_rounds(e, 3).collect()}
    # saturated by t=1 (each component is a single edge)
    assert rows[1].sum_ball_est == rows[3].sum_ball_est


def test_anf_idempotent_state_under_duplicate_edges(spark):
    """Register max is idempotent: duplicating edges changes nothing."""
    base = _sym([("a", "b"), ("b", "c")])
    once = anf_rounds(_edges(spark, base), 2).collect()
    twice = anf_rounds(_edges(spark, base + base), 2).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


def test_gini_known_distributions(spark, tmp_path):
    """Uniform spends -> gini 0; one customer owns everything -> gini
    -> (n-1)/n. Built via a tiny orders parquet so the query function
    runs unchanged."""
    import pandas as pd

    from vector_db_mvp_spark.workload.relational import q_customer_spend_gini

    def _write(rows, name):
        d = tmp_path / name
        d.mkdir()
        pd.DataFrame(
            {
                "o_orderkey": range(len(rows)),
                "o_custkey": [r[0] for r in rows],
                "o_totalprice": [r[1] for r in rows],
                "o_orderdate": ["1995-01-01"] * len(rows),
                "o_orderstatus": ["O"] * len(rows),
                "o_orderpriority": ["1-URGENT"] * len(rows),
                "o_clerk": ["c"] * len(rows),
                "o_shippriority": [0] * len(rows),
                "o_comment": [""] * len(rows),
            }
        ).to_parquet(d / "orders.parquet")
        return str(d)

    uniform = _write([(i, 100.0) for i in range(10)], "uniform")
    r = q_customer_spend_gini(spark, uniform).collect()[0]
    assert r.n_customers == 10
    assert r.gini == pytest.approx(0.0, abs=1e-9)
    # top-10% (1 customer) of a uniform distribution holds exactly 10%
    assert r.top10pct_share == pytest.approx(0.1, abs=1e-9)

    skew = _write([(0, 1000.0)] + [(i, 0.01) for i in range(1, 10)], "skew")
    r = q_customer_spend_gini(spark, skew).collect()[0]
    # near-total concentration: gini -> (n-1)/n = 0.9 as the small
    # spends -> 0
    assert r.gini == pytest.approx(0.9, abs=1e-3)
    assert r.top10pct_share == pytest.approx(1.0, abs=1e-3)


def test_benford_digits_partition_and_expected_constants(spark, sf_dir):
    from vector_db_mvp_spark.workload.relational import (
        _benford_expected,
        q_benford_price_digits,
    )

    rows = q_benford_price_digits(spark, sf_dir).collect()
    assert [r.digit for r in rows] == sorted({r.digit for r in rows})
    assert sum(r.n_obs for r in rows) > 0
    assert sum(r.obs_pct for r in rows) == pytest.approx(1.0, abs=1e-4)
    exp = _benford_expected()
    for r in rows:
        assert r.benford_pct == pytest.approx(round(exp[r.digit], 6), abs=1e-9)


def test_hyperball_harmonic_orders_path_center_first(spark):
    """Path a-b-c-d-e: the center c reaches everything closest -> highest
    harmonic centrality; symmetric pairs tie."""
    from vector_db_mvp_spark.operators.anf import hyperball_harmonic

    e = _edges(spark, _sym([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]))
    got = {r.node: r.harmonic for r in hyperball_harmonic(e, 4).collect()}
    assert got["c"] == max(got.values())
    assert got["a"] == got["e"] and got["b"] == got["d"]
    assert got["b"] > got["a"]
    # exact harmonic of the center at tiny scale: 2/1 + 2/2 = 3, LC-
    # corrected estimates land near it
    assert got["c"] == pytest.approx(3.0, rel=0.15)


def test_hyperball_zero_increment_after_saturation(spark):
    """A single edge saturates at t=1: rounds 2..3 add nothing."""
    from vector_db_mvp_spark.operators.anf import hyperball_harmonic

    e = _edges(spark, _sym([("a", "b")]))
    h1 = {r.node: r.harmonic for r in hyperball_harmonic(e, 1).collect()}
    h3 = {r.node: r.harmonic for r in hyperball_harmonic(e, 3).collect()}
    assert h1 == h3
