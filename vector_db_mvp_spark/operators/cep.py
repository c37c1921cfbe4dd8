"""Complex-event-processing chain matching in pure window aggregates.

MATCH_RECOGNIZE-style ``A -> B -> C`` detection (every match, not just the
first per key) without a per-row automaton: latest-chain semantics — each
terminal event is matched to the LATEST preceding B event that itself
chains to ITS latest preceding A, each hop within a time bound.

The trick that keeps it in codegen: a conditional running MAX carries the
latest A timestamp; a second running MAX over a ``(b_ts, a_ts)`` STRUCT
carries the latest *valid partial chain* atomically (struct ordering is
lexicographic on the leading field, so max = latest B — and the A that
validated it rides along in the second field). Both windows share one
partition/order spec, so the physical plan is a single exchange + a single
sort feeding two Window operators: O(n log n) per partition, no joins, no
Python, no driver state.

Scale: per-key partitions (user sessions) are bounded and high-cardinality,
so the keyed sort is skew-free at any corpus size — the same shape as the
throttling/sessionization windows. Generalizes to k stages by stacking
k-1 struct-max windows over the same sort.

Reference capability anchor: the reference's timeline surface orders
events per session (session_service.py); chain matching is the detection
extension of that same per-key time ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chain_matches(
    events: DataFrame,
    *,
    stages: tuple[str, str, str],
    hop: str = "INTERVAL 7 DAY",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """All latest-chain matches of ``stages`` = (A, B, C) per ``key_col``.

    Output: (key, a_ts, b_ts, c_ts, chain_secs) — one row per C event whose
    latest valid (A -> B) chain ends within ``hop`` before it.
    """
    a_t, b_t, c_t = stages
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_a = F.max(F.when(F.col(type_col) == a_t, F.col(ts_col))).over(w_prev)
    e1 = events.withColumn("_last_a", last_a)
    chain = F.when(
        (F.col(type_col) == b_t)
        & F.col("_last_a").isNotNull()
        & (F.col(ts_col) <= F.col("_last_a") + F.expr(hop)),
        F.struct(F.col(ts_col).alias("b_ts"), F.col("_last_a").alias("a_ts")),
    )
    e2 = e1.withColumn("_chain", chain)
    e3 = e2.withColumn("_lastchain", F.max("_chain").over(w_prev))
    return e3.filter(
        (F.col(type_col) == c_t)
        & F.col("_lastchain").isNotNull()
        & (F.col(ts_col) <= F.col("_lastchain.b_ts") + F.expr(hop))
    ).select(
        F.col(key_col),
        F.col("_lastchain.a_ts").alias("a_ts"),
        F.col("_lastchain.b_ts").alias("b_ts"),
        F.col(ts_col).alias("c_ts"),
        # exact integer micros: unix_timestamp would TRUNCATE sub-second
        # parts while DuckDB's epoch() ROUNDS them (oracle drift of ±1 s)
        F.expr(
            f"(unix_micros(cast({ts_col} as timestamp))"
            " - unix_micros(cast(_lastchain.a_ts as timestamp)))"
            " div 1000000"
        ).alias("chain_secs"),
    )
