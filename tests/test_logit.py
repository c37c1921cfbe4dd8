"""Fixed-round Newton logistic regression (operators/logit.py)."""

from __future__ import annotations

import math

import pytest

from vector_db_mvp_spark.operators.logit import logistic_newton


def _grouped(spark, rows):
    return spark.createDataFrame(rows, "x double, n_pos long, n_neg long")


def _py_newton(rows, rounds):
    b0 = b1 = 0.0
    out = []
    for _ in range(rounds):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for x, n1, n0 in rows:
            n = n1 + n0
            p = round(1.0 / (1.0 + math.exp(-(b0 + b1 * x))), 12)
            resid = n1 - n * p
            w = n * p * (1 - p)
            g0 += round(resid, 6)
            g1 += round(x * resid, 6)
            h00 += round(w, 6)
            h01 += round(w * x, 6)
            h11 += round(w * x * x, 6)
        det = h00 * h11 - h01 * h01
        b0 = round(b0 + (h11 * g0 - h01 * g1) / det, 12)
        b1 = round(b1 + (h00 * g1 - h01 * g0) / det, 12)
        out.append((round(b0, 6), round(b1, 6)))
    return out


def test_matches_pure_python_trajectory(spark):
    rows = [
        (1.0, 5, 45),
        (2.0, 12, 38),
        (3.0, 20, 30),
        (4.0, 33, 17),
        (5.0, 41, 9),
    ]
    expect = _py_newton(rows, 4)
    got = [
        (r.b0, r.b1)
        for r in logistic_newton(_grouped(spark, rows), 4)
        .orderBy("round")
        .collect()
    ]
    assert got == pytest.approx(expect, abs=2e-6)


def test_recovers_separating_direction(spark):
    """Positives concentrated at high x must yield b1 > 0 and a
    monotone-in-x fitted probability."""
    rows = [(float(x), x * 10, (10 - x) * 10) for x in range(1, 10)]
    fit = (
        logistic_newton(_grouped(spark, rows), 4)
        .orderBy("round")
        .collect()[-1]
    )
    assert fit.b1 > 0

    def p(x):
        return 1.0 / (1.0 + math.exp(-(fit.b0 + fit.b1 * x)))

    assert p(9) > 0.8 > 0.2 > p(1)


def test_rejects_zero_rounds(spark):
    with pytest.raises(ValueError, match="rounds"):
        logistic_newton(_grouped(spark, [(1.0, 1, 1)]), 0)


def test_sql_mirror_matches_spark(spark):
    """The unrolled DuckDB oracle replays the identical trajectory."""
    import duckdb

    from vector_db_mvp_spark.operators.logit import sql_logistic_newton

    rows = [
        (1.0, 5, 45),
        (2.0, 12, 38),
        (3.0, 20, 30),
        (4.0, 33, 17),
        (5.0, 41, 9),
    ]
    got = [
        (r.round, r.b0, r.b1)
        for r in logistic_newton(_grouped(spark, rows), 3)
        .orderBy("round")
        .collect()
    ]
    vals = ", ".join(f"({x}, {n1}, {n0})" for x, n1, n0 in rows)
    cte = f"SELECT * FROM (VALUES {vals}) AS t(x, n_pos, n_neg)"
    sql = sql_logistic_newton(cte, 3) + " ORDER BY round"
    oracle = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    for (ra, b0a, b1a), (rb, b0b, b1b) in zip(got, oracle):
        assert ra == rb
        assert b0a == pytest.approx(b0b, abs=2e-6)
        assert b1a == pytest.approx(b1b, abs=2e-6)


def test_rejects_single_distinct_x(spark):
    """One distinct x makes the Hessian singular — every beta would be
    NaN from round 1; the entry guard must fail loudly instead."""
    with pytest.raises(ValueError, match="distinct x"):
        logistic_newton(_grouped(spark, [(1.0, 3, 7)]), 2)


def test_saturated_domain_freezes_betas(spark):
    """ADVICE r12: perfectly separated data diverges until every
    6-decimal w-term sum rounds to 0 — det hits EXACTLY 0 in a late
    round (round 15 for this 2-point domain, verified against the pure
    mirror). Pre-fix Spark emitted NULL betas from the /0; the freeze
    must instead carry the last real betas forward, non-null."""
    rows = [(0.0, 0, 1), (1.0, 1, 0)]
    got = (
        logistic_newton(_grouped(spark, rows), 16).orderBy("round").collect()
    )
    assert len(got) == 16
    for r in got:
        assert r.b0 is not None and r.b1 is not None
        assert not math.isnan(r.b0) and not math.isinf(r.b0)
    # frozen tail: rounds 14..16 carry identical betas
    assert (got[14].b0, got[14].b1) == (got[13].b0, got[13].b1)
    assert (got[15].b0, got[15].b1) == (got[13].b0, got[13].b1)
    # pre-freeze rounds still move
    assert (got[12].b0, got[12].b1) != (got[13].b0, got[13].b1)


def test_saturated_sql_mirror_matches_spark(spark):
    """The DuckDB oracle replays the identical frozen trajectory — the
    CASE WHEN det = 0 branch fires the same way on both engines (the
    det comparison is on doubles built from identical decimal sums)."""
    import duckdb

    from vector_db_mvp_spark.operators.logit import sql_logistic_newton

    rows = [(0.0, 0, 1), (1.0, 1, 0)]
    got = [
        (r.round, r.b0, r.b1)
        for r in logistic_newton(_grouped(spark, rows), 16)
        .orderBy("round")
        .collect()
    ]
    vals = ", ".join(f"({x}, {n1}, {n0})" for x, n1, n0 in rows)
    cte = f"SELECT * FROM (VALUES {vals}) AS t(x, n_pos, n_neg)"
    sql = sql_logistic_newton(cte, 16) + " ORDER BY round"
    oracle = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert len(oracle) == 16
    for (ra, b0a, b1a), (rb, b0b, b1b) in zip(got, oracle):
        assert ra == rb
        assert b0b is not None and not math.isnan(b0b) and not math.isinf(b0b)
        assert b0a == pytest.approx(b0b, abs=2e-6)
        assert b1a == pytest.approx(b1b, abs=2e-6)


def _py_newton2(rows, rounds):
    b0 = b1 = b2 = 0.0
    out = []
    for _ in range(rounds):
        g0 = g1 = g2 = h00 = h01 = h02 = h11 = h12 = h22 = 0.0
        for x1, x2, n1, n0 in rows:
            n = n1 + n0
            p = round(1.0 / (1.0 + math.exp(-(b0 + b1 * x1 + b2 * x2))), 12)
            resid = n1 - n * p
            w = n * p * (1 - p)
            g0 += round(resid, 6)
            g1 += round(x1 * resid, 6)
            g2 += round(x2 * resid, 6)
            h00 += round(w, 6)
            h01 += round(w * x1, 6)
            h02 += round(w * x2, 6)
            h11 += round(w * x1 * x1, 6)
            h12 += round(w * x1 * x2, 6)
            h22 += round(w * x2 * x2, 6)
        det = (h00 * (h11 * h22 - h12 * h12)
               - h01 * (h01 * h22 - h12 * h02)
               + h02 * (h01 * h12 - h11 * h02))
        d0 = (g0 * (h11 * h22 - h12 * h12)
              - h01 * (g1 * h22 - h12 * g2)
              + h02 * (g1 * h12 - h11 * g2))
        d1 = (h00 * (g1 * h22 - h12 * g2)
              - g0 * (h01 * h22 - h12 * h02)
              + h02 * (h01 * g2 - g1 * h02))
        d2 = (h00 * (h11 * g2 - g1 * h12)
              - h01 * (h01 * g2 - g1 * h02)
              + g0 * (h01 * h12 - h11 * h02))
        if det != 0.0:
            b0 = round(b0 + d0 / det, 12)
            b1 = round(b1 + d1 / det, 12)
            b2 = round(b2 + d2 / det, 12)
        out.append((round(b0, 6), round(b1, 6), round(b2, 6)))
    return out


_ROWS2 = [
    (1.0, 0.0, 5, 45),
    (2.0, 1.0, 12, 38),
    (3.0, 0.0, 20, 30),
    (4.0, 1.0, 33, 17),
    (5.0, 0.0, 41, 9),
    (2.0, 0.0, 8, 42),
]


def _grouped2(spark, rows):
    return spark.createDataFrame(
        rows, "x1 double, x2 double, n_pos long, n_neg long"
    )


def test_newton2_matches_pure_python_trajectory(spark):
    from vector_db_mvp_spark.operators.logit import logistic_newton2

    expect = _py_newton2(_ROWS2, 4)
    got = [
        (r.b0, r.b1, r.b2)
        for r in logistic_newton2(_grouped2(spark, _ROWS2), 4)
        .orderBy("round")
        .collect()
    ]
    for g, e in zip(got, expect):
        assert g == pytest.approx(e, abs=2e-6)


def test_newton2_sql_mirror_matches_spark(spark):
    import duckdb

    from vector_db_mvp_spark.operators.logit import (
        logistic_newton2,
        sql_logistic_newton2,
    )

    got = [
        (r.round, r.b0, r.b1, r.b2)
        for r in logistic_newton2(_grouped2(spark, _ROWS2), 3)
        .orderBy("round")
        .collect()
    ]
    vals = ", ".join(f"({a}, {b}, {c}, {d})" for a, b, c, d in _ROWS2)
    cte = f"SELECT * FROM (VALUES {vals}) AS t(x1, x2, n_pos, n_neg)"
    sql = sql_logistic_newton2(cte, 3) + " ORDER BY round"
    oracle = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert len(oracle) == 3
    for g, o in zip(got, oracle):
        assert g[0] == o[0]
        for a, b in zip(g[1:], o[1:]):
            assert a == pytest.approx(b, abs=2e-6)


def test_newton2_entry_guards(spark):
    from vector_db_mvp_spark.operators.logit import logistic_newton2

    with pytest.raises(ValueError, match="rounds"):
        logistic_newton2(_grouped2(spark, _ROWS2), 0)
    # < 3 distinct points
    with pytest.raises(ValueError, match="singular"):
        logistic_newton2(
            _grouped2(spark, [(1.0, 0.0, 1, 1), (2.0, 1.0, 1, 1)]), 2
        )
    # single-valued feature (x2 constant)
    with pytest.raises(ValueError, match="singular"):
        logistic_newton2(
            _grouped2(
                spark,
                [(1.0, 5.0, 1, 1), (2.0, 5.0, 1, 1), (3.0, 5.0, 1, 1)],
            ),
            2,
        )


def test_newton2_recovers_both_directions(spark):
    """x1 drives positives up, x2 drives them down: signs must recover."""
    from vector_db_mvp_spark.operators.logit import logistic_newton2

    rows = []
    for x1 in range(1, 6):
        for x2 in (0.0, 1.0):
            z = 0.8 * x1 - 1.5 * x2 - 2.0
            pr = 1.0 / (1.0 + math.exp(-z))
            rows.append((float(x1), x2, int(round(pr * 100)),
                         100 - int(round(pr * 100))))
    fit = (
        logistic_newton2(_grouped2(spark, rows), 5)
        .orderBy("round")
        .collect()[-1]
    )
    assert fit.b1 > 0 > fit.b2


# ---- r14: Poisson leg (log link, count response) -----------------------


def _pgrouped(spark, rows):
    return spark.createDataFrame(rows, "x double, n long, y_sum long")


def test_poisson_recovers_saturated_two_point_fit(spark):
    """With exactly two x values the Poisson GLM is saturated: the fitted
    means equal the group means, so b1 = (ln m2 - ln m1)/(x2 - x1) in
    closed form. Newton from the ln-mean init must land there."""
    import math

    from vector_db_mvp_spark.operators.logit import poisson_newton

    rows = [(0.0, 100, 1200), (1.0, 80, 2400)]  # means 12 and 30
    last = (
        poisson_newton(_pgrouped(spark, rows), 5)
        .orderBy("round")
        .collect()[-1]
    )
    b1_true = math.log(30.0) - math.log(12.0)
    b0_true = math.log(12.0)
    assert last.b1 == pytest.approx(b1_true, abs=1e-4)
    assert last.b0 == pytest.approx(b0_true, abs=1e-4)


def test_poisson_sql_mirror_matches_spark(spark):
    import duckdb

    from vector_db_mvp_spark.operators.logit import (
        poisson_newton,
        sql_poisson_newton,
    )

    rows = [(0.0, 50, 600), (0.05, 40, 700), (0.1, 30, 800), (0.2, 20, 900)]
    got = [
        (r.round, r.b0, r.b1)
        for r in poisson_newton(_pgrouped(spark, rows), 4)
        .orderBy("round")
        .collect()
    ]
    vals = ", ".join(f"({x}, {n}, {y})" for x, n, y in rows)
    cte = f"SELECT * FROM (VALUES {vals}) AS t(x, n, y_sum)"
    sql = sql_poisson_newton(cte, 4) + " ORDER BY round"
    oracle = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert len(got) == len(oracle) == 4
    for (ra, b0a, b1a), (rb, b0b, b1b) in zip(got, oracle):
        assert ra == rb
        assert b0a == pytest.approx(b0b, abs=2e-6)
        assert b1a == pytest.approx(b1b, abs=2e-6)


def test_poisson_entry_guards(spark):
    from vector_db_mvp_spark.operators.logit import poisson_newton

    with pytest.raises(ValueError, match="rounds"):
        poisson_newton(_pgrouped(spark, [(0.0, 5, 10), (1.0, 5, 20)]), 0)
    with pytest.raises(ValueError, match="distinct x"):
        poisson_newton(_pgrouped(spark, [(2.0, 5, 10), (2.0, 7, 30)]), 2)
