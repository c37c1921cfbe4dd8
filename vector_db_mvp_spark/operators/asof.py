"""As-of (temporal) join — a [north-star] J3 operator (SURVEY.md §2.3: the
reference has no join beyond its parent-child denormalization; a
capability-parity engine for event data needs the time-series workhorse).

Semantics: for every left row, attach the single most recent right row with
``right.on <= left.on`` within the same ``by`` group (backward as-of,
inclusive — the same contract as DuckDB ``ASOF JOIN`` and pandas
``merge_asof``).

Implementation is pure DataFrame algebra — no UDF, no per-key loop:
tag both sides, union them, and take a running ``last(..., ignorenulls)``
over a (by, time)-sorted window; left rows then carry the latest right
payload seen at-or-before their timestamp. Physical plan: ONE shuffle on the
``by`` key + an in-partition sort — the minimal possible for this operator
(any engine must co-locate groups and order by time), so it scales to 100 TB
exactly like a sort-merge join. Ties on (by, on): right rows sort before
left rows (inclusive match), and among equal right rows the carried columns
break ties deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: list[str] | str = "user_id",
    right_cols: list[str],
    suffix: str = "_right",
    inner: bool = False,
) -> DataFrame:
    """Backward as-of join. ``right_cols`` are the right-side payload columns
    to carry (each emitted as ``<name><suffix>``; right's ``on`` is always
    carried as ``<on><suffix>``). ``inner=True`` drops left rows with no
    match (DuckDB ASOF JOIN default); otherwise they keep NULL payloads
    (ASOF LEFT JOIN)."""
    by = [by] if isinstance(by, str) else list(by)
    carried = [on + suffix] + [c + suffix for c in right_cols]

    r = right.select(
        *by,
        F.col(on),
        F.col(on).alias(on + suffix),
        *[F.col(c).alias(c + suffix) for c in right_cols],
    ).withColumn("_is_left", F.lit(0))
    l = left.withColumn("_is_left", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # Right rows at the same timestamp sort before left rows (inclusive
    # as-of); equal right rows are ordered by their payload for determinism.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc(), *[F.col(c).asc() for c in carried])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # All carried columns fill in ONE projection over the same window (a
    # sequential withColumn would re-resolve the ordering against already-
    # filled columns).
    filled = u.select(
        *[c for c in u.columns if c not in carried],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    )
    out = filled.filter(F.col("_is_left") == 1).drop("_is_left")
    if inner:
        out = out.filter(F.col(on + suffix).isNotNull())
    return out
