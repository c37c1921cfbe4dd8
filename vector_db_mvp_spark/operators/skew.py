"""Skew mitigation: salted joins and salted two-phase aggregation.

AQE's skew-join (`spark.sql.adaptive.skewJoin.enabled`, on in session.py)
already splits oversized sort-merge partitions at runtime, and map-side
partial aggregation absorbs groupBy skew for algebraic aggregates. Explicit
salting remains the right tool where those don't reach:

- a skewed *shuffled hash / streaming* join AQE can't re-plan;
- holistic aggregates (``collect_list``/``collect_set``/exact distinct)
  whose per-key state all lands on one reducer;
- a hot key so large that even one AQE split of it exceeds executor memory.

``salted_join`` replicates the small side ``salt_buckets`` times and spreads
the big side's hot keys uniformly across the replicas, so the join's shuffle
key is (key, salt) — the hot key's rows now land on ``salt_buckets``
reducers instead of one. Results are exactly those of the unsalted join
(asserted in tests/test_skew.py); cost is small-side amplification, which is
why the small side must actually be small (same precondition as broadcast).

``salted_two_phase_agg`` shuffles once on (key, salt) for the heavy partial
aggregation, then once more on key over ``salt_buckets`` partial rows per
key to merge — the manual form of partial/final aggregation for aggregates
Spark cannot partial automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def _with_salt(df: DataFrame, salt_buckets: int) -> DataFrame:
    """Deterministic uniform salt: hash of the whole row modulo buckets.
    Row-content hashing (not ``rand()``) keeps the plan re-executable —
    retried tasks and resumed stages salt identically."""
    return df.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )


def _replicated(df: DataFrame, salt_buckets: int) -> DataFrame:
    """Small side cross-producted with salts 0..B-1 (B-fold amplification)."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join equal to ``big.join(small, on, how)`` with the big side's
    skew spread over ``salt_buckets`` reducers. Supported ``how``: inner and
    the left-flavored joins (left/left_outer/left_semi/left_anti) — the
    replicated small side would multiply right-preserved rows."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    b = _with_salt(big, salt_buckets)
    s = _replicated(small, salt_buckets)
    return b.join(s, keys + [SALT_COL], how).drop(SALT_COL)


def salted_two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(...) in two shuffles for skew-prone holistic
    aggregates: phase 1 groups by (keys, salt) computing ``partial_aggs``
    (each must alias its output), phase 2 groups by keys merging them with
    ``final_aggs`` over the ≤ ``salt_buckets`` partial rows per key."""
    salted = _with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
