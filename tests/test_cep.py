"""CEP chain matching (operators/cep.py): latest-chain semantics pins."""

from __future__ import annotations

import datetime as dt

from vector_db_mvp_spark.operators.cep import chain_matches


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(minutes=m), u, t, 0.0, "{}")
        for i, (u, m, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )


def _run(spark, rows, hop="INTERVAL 1 HOUR"):
    df = chain_matches(
        _ev(spark, rows), stages=("view", "click", "purchase"), hop=hop
    )
    return [
        (r["user_id"], r["a_ts"].minute, r["b_ts"].minute, r["c_ts"].minute,
         r["chain_secs"])
        for r in df.orderBy("user_id", "c_ts").collect()
    ]


def test_basic_chain(spark):
    got = _run(spark, [(1, 0, "view"), (1, 10, "click"), (1, 20, "purchase")])
    assert got == [(1, 0, 10, 20, 1200)]


def test_latest_chain_wins(spark):
    # Two complete chains before one purchase: the LATEST click (min 40,
    # chained to the latest view before it, min 30) is the match.
    got = _run(spark, [
        (1, 0, "view"), (1, 10, "click"),
        (1, 30, "view"), (1, 40, "click"),
        (1, 50, "purchase"),
    ])
    assert got == [(1, 30, 40, 50, 1200)]


def test_every_purchase_matches_independently(spark):
    # One chain, two purchases -> two match rows (ALL-matches semantics,
    # unlike first-anchor funnels).
    got = _run(spark, [
        (1, 0, "view"), (1, 10, "click"),
        (1, 20, "purchase"), (1, 30, "purchase"),
    ])
    assert got == [(1, 0, 10, 20, 1200), (1, 0, 10, 30, 1800)]


def test_hop_bound_enforced_per_hop(spark):
    # view -> click gap over the hop bound: click carries no chain.
    assert _run(spark, [
        (1, 0, "view"), (1, 90, "click"), (1, 100, "purchase"),
    ]) == []
    # click -> purchase gap over the bound: no match either.
    assert _run(spark, [
        (1, 0, "view"), (1, 10, "click"), (1, 100, "purchase"),
    ]) == []


def test_order_matters_not_presence(spark):
    # click before any view never chains.
    assert _run(spark, [
        (1, 0, "click"), (1, 10, "view"), (1, 20, "purchase"),
    ]) == []


def test_keys_are_independent(spark):
    got = _run(spark, [
        (1, 0, "view"), (2, 10, "click"), (1, 20, "purchase"),
        (2, 0, "view"), (2, 20, "purchase"),
    ])
    assert got == [(2, 0, 10, 20, 1200)]
