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
    """A crash at the commit point (the atomic pointer flip) must leave the
    old (state, markers) pair fully intact and the batch retryable — the
    new version directory is written but unreferenced."""
    state.init(_events(spark, [("a", 1.0)]))

    import vector_db_mvp_spark.operators.rollup_state as rs_mod

    def boom(*a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(rs_mod.os, "replace", boom)
    with pytest.raises(RuntimeError):
        state.apply_batch(_events(spark, [("a", 9.0)]), "b1")
    monkeypatch.undo()
    # Old state intact, marker absent -> retry succeeds and lands once.
    assert state.metrics().collect()[0].n_events == 1
    assert state.apply_batch(_events(spark, [("a", 9.0)]), "b1") is True
    assert state.metrics().collect()[0].n_events == 2


def test_state_and_marker_commit_atomically(spark, state, tmp_path):
    """The pointer file carries BOTH the live state dir and the applied
    set, flipped in one os.replace — there is no window where the merged
    state exists without its marker (double-apply on retry) or vice versa
    (dropped batch). Also: superseded version dirs are GC'd with ONE
    retained predecessor (reader-vs-GC grace window: a concurrent batch
    reader that resolved the pointer just before the flip may still be
    scanning the previous version's files — operators/rollup_state.py
    _commit)."""
    import json
    import os

    state.init(_events(spark, [("a", 1.0)]), batch_id="b0")
    assert state.apply_marker_exists("b0")  # init committed its marker too
    state.apply_batch(_events(spark, [("a", 2.0)]), "b1")
    ptr = json.load(open(state._pointer(), encoding="utf-8"))
    assert set(ptr["applied"]) == {"b0", "b1"}
    assert ptr["dir"] == "state_v1"
    live = {
        d for d in os.listdir(state.path)
        if d.startswith("state_v") and os.path.isdir(os.path.join(state.path, d))
    }
    assert live == {"state_v0", "state_v1"}  # v0 retained for in-flight readers
    # a further commit advances the retention window: v0 is now GC'd
    state.apply_batch(_events(spark, [("a", 3.0)]), "b2")
    live = {
        d for d in os.listdir(state.path)
        if d.startswith("state_v") and os.path.isdir(os.path.join(state.path, d))
    }
    assert live == {"state_v1", "state_v2"}
    # replays of any applied batch are no-ops
    assert state.apply_batch(_events(spark, [("a", 2.0)]), "b1") is False
    assert state.metrics().collect()[0].n_events == 3
