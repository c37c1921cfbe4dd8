"""Streaming CEP chain matching (streaming/cep_stream.py).

The load-bearing pin: driving the handler over ts-ordered micro-batches
produces EXACTLY the batch ``chain_matches`` output, for every split of
the stream — including splits that cut between A and B, between B and C,
and mid-chain replacements.
"""

from __future__ import annotations

import datetime as dt

from vector_db_mvp_spark.operators.cep import chain_matches
from vector_db_mvp_spark.streaming.cep_stream import CepIngest

BASE = dt.datetime(2024, 1, 1)
SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)


def _rows(events):
    return [
        (i, BASE + dt.timedelta(minutes=m), u, t, 0.0, "{}")
        for i, (u, m, t) in enumerate(events)
    ]


# A realistic little tape: two users, multiple chains, a mid-stream chain
# replacement, an early unmatched click, and two purchases off one chain.
TAPE = [
    (1, 0, "click"),      # click before any view: never chains
    (1, 5, "view"),
    (1, 10, "click"),
    (2, 12, "view"),
    (1, 20, "purchase"),  # match (5, 10, 20)
    (1, 30, "view"),
    (2, 35, "click"),
    (1, 40, "click"),
    (2, 45, "purchase"),  # match (12, 35, 45)
    (1, 50, "purchase"),  # match (30, 40, 50) — latest chain replaced
    (1, 55, "purchase"),  # match (30, 40, 55) — same chain, second C
]


def _batch_expected(spark):
    ev = spark.createDataFrame(_rows(TAPE), SCHEMA)
    return sorted(
        map(tuple, chain_matches(
            ev, stages=("view", "click", "purchase"), hop="INTERVAL 1 HOUR"
        ).collect())
    )


def _stream_got(spark, tmp_path, cuts, tag):
    rows = _rows(TAPE)
    bounds = [0, *cuts, len(rows)]
    handler = CepIngest(
        spark,
        str(tmp_path / f"state_{tag}"),
        str(tmp_path / f"matches_{tag}"),
        stages=("view", "click", "purchase"),
        hop="INTERVAL 1 HOUR",
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
    )
    for bid, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        handler(spark.createDataFrame(rows[lo:hi], SCHEMA), bid)
    return sorted(map(tuple, handler.matches().collect()))


def test_stream_equals_batch_across_splits(spark, tmp_path):
    expected = _batch_expected(spark)
    assert len(expected) == 4
    for tag, cuts in enumerate(([4], [2, 7], [1, 3, 5, 9], [6])):
        got = _stream_got(spark, tmp_path, cuts, tag)
        assert got == expected, (cuts, got)


def test_replayed_epoch_is_noop(spark, tmp_path):
    rows = _rows(TAPE)
    handler = CepIngest(
        spark,
        str(tmp_path / "state_r"),
        str(tmp_path / "matches_r"),
        stages=("view", "click", "purchase"),
        hop="INTERVAL 1 HOUR",
        checkpoint_dir=str(tmp_path / "ckpt_r"),
    )
    handler(spark.createDataFrame(rows[:6], SCHEMA), 0)
    handler(spark.createDataFrame(rows[6:], SCHEMA), 1)
    once = sorted(map(tuple, handler.matches().collect()))
    handler(spark.createDataFrame(rows[6:], SCHEMA), 1)  # re-delivery
    assert sorted(map(tuple, handler.matches().collect())) == once


def test_state_is_one_row_per_key(spark, tmp_path):
    handler = CepIngest(
        spark,
        str(tmp_path / "state_s"),
        str(tmp_path / "matches_s"),
        stages=("view", "click", "purchase"),
        hop="INTERVAL 1 HOUR",
        checkpoint_dir=str(tmp_path / "ckpt_s"),
    )
    rows = _rows(TAPE)
    for bid, chunk in enumerate((rows[:5], rows[5:])):
        handler(spark.createDataFrame(chunk, SCHEMA), bid)
    st = handler.state.read()
    assert st.count() == 2  # two users, one state row each
    assert st.groupBy("user_id").count().filter("count > 1").count() == 0
