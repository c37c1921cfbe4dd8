"""Incremental aggregate maintenance (operators/rollup_state.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.rollup_state import (
    RollupState,
    aggregate_partial,
    finalize,
    merge_states,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "k string, value double")


@pytest.fixture()
def state(spark, tmp_path):
    return RollupState(spark, str(tmp_path / "rollup"), ["k"], "value")


def test_incremental_equals_full_recompute(spark, state):
    base = _events(spark, [("a", 1.0), ("a", 2.0), ("b", 3.0)])
    delta = _events(spark, [("a", 4.0), ("c", 5.0)])
    state.init(base)
    assert state.apply_batch(delta, "b1") is True
    got = {r.k: (r.n_events, r.sum_value) for r in state.metrics().collect()}
    full = finalize(
        aggregate_partial(base.unionByName(delta), ["k"], "value"), ["k"]
    )
    want = {r.k: (r.n_events, r.sum_value) for r in full.collect()}
    assert got == want
    assert got["c"] == (1, 5.0)  # group born in the delta


def test_replay_is_noop(spark, state):
    state.init(_events(spark, [("a", 1.0)]))
    delta = _events(spark, [("a", 1.0)])
    assert state.apply_batch(delta, "b1") is True
    assert state.apply_batch(delta, "b1") is False  # marker blocks replay
    assert state.metrics().collect()[0].n_events == 2


def test_merge_is_commutative(spark):
    a = aggregate_partial(_events(spark, [("a", 1.0), ("b", 2.0)]), ["k"], "value")
    b = aggregate_partial(_events(spark, [("a", 3.0)]), ["k"], "value")
    ab = {tuple(r) for r in merge_states(a, b, ["k"]).collect()}
    ba = {tuple(r) for r in merge_states(b, a, ["k"]).collect()}
    assert ab == ba


def test_torn_apply_never_corrupts(spark, state, monkeypatch):
    """A crash mid-apply (before the swap) must leave the old state
    readable and the batch unmarked (retryable)."""
    state.init(_events(spark, [("a", 1.0)]))

    import vector_db_mvp_spark.operators.rollup_state as rs_mod

    def boom(*a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(rs_mod.os, "rename", boom)
    with pytest.raises(RuntimeError):
        state.apply_batch(_events(spark, [("a", 9.0)]), "b1")
    monkeypatch.undo()
    # Old state intact, marker absent -> retry succeeds and lands once.
    assert state.metrics().collect()[0].n_events == 1
    assert state.apply_batch(_events(spark, [("a", 9.0)]), "b1") is True
    assert state.metrics().collect()[0].n_events == 2
