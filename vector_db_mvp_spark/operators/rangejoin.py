"""Range (interval) join — the remaining [north-star] J3 join flavor
(SURVEY.md §2.3: the reference has only its parent-child equi-join; a
parity engine over event data needs point-in-interval matching).

Semantics: match left "point" rows to right "interval" rows where
``lo <= point <= hi`` (no equi-key required).

Naive Spark compiles a pure inequality join to BroadcastNestedLoopJoin —
O(|L|·|R|) and a non-starter at 100 TB. The scalable plan is **bin-and-join**:
quantize time into fixed-width bins, explode each interval into the bins it
covers (``sequence()`` — bounded because intervals are bounded), tag each
point with its single bin, hash-join on the bin id, then apply the exact
range predicate. Each pair is examined once per covered bin and deduped by
construction (a point lives in exactly one bin), so the join degenerates to
an equi-join whose key cardinality you control with ``bin_width``: pick it
near the typical interval length and each interval explodes into O(1) bins.
One shuffle on the bin key; AQE splits skewed bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width_seconds: int,
) -> DataFrame:
    """Inner join of point rows to interval rows with
    ``lo <= point <= hi`` (timestamp columns), via bin-and-join.

    Output: all columns of ``points`` + all columns of ``intervals``.
    Column names must not collide (alias before calling)."""
    # Integer `div`, not `/`: float division + cast would misbin at the
    # edges of double precision and for pre-epoch timestamps.
    w = int(bin_width_seconds)
    p = points.withColumn("_bin", F.expr(f"unix_timestamp({point_col}) div {w}"))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"unix_timestamp({lo_col}) div {w}"),
                F.expr(f"unix_timestamp({hi_col}) div {w}"),
            )
        ),
    )
    return (
        p.join(i, "_bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("_bin")
    )
