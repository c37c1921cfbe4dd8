"""Slowly-changing-dimension Type 2 merge: dimension history maintenance.

Given the current dimension snapshot and a batch of updated rows, produce
the SCD2 history table: changed rows get their old version closed
(``valid_to = batch_ts``) and a new open version appended; unchanged rows
pass through open. The MERGE-shaped core of every warehouse dimension
pipeline, expressed as one outer-join-free plan:

* ``updates`` is the small side (a batch) — broadcast into the dimension
  scan; the dimension never shuffles;
* each dimension row expands to its closed old version (when changed) and
  the open current version via a generate-style union of two projections
  over the SAME joined frame — one scan, no self-join;
* rows are only "changed" when a tracked attribute actually differs —
  compared NULL-safely, so NULL→value and value→NULL transitions are real
  changes (an update row carries the full new attribute vector; a NULL in
  it means "set NULL", absence of the key means "no update") — and
  re-applying the same batch is a no-op (idempotent merges);
* ``updates`` must be unique on the key (a batch is a snapshot of new
  values, not a changelog): duplicates would fan out dimension rows
  through the join, so they are rejected eagerly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    attrs: list[str],
    batch_ts: str,
    valid_from_init: str = "1970-01-01",
    assert_unique_updates: bool = True,
) -> DataFrame:
    """Return the post-merge SCD2 history: one row per (key, version) with
    ``valid_from`` / ``valid_to`` (null = open). ``dim`` is the pre-merge
    open snapshot; ``updates`` carries the same key + attrs columns and
    must be unique on ``key`` (checked eagerly unless
    ``assert_unique_updates=False`` — the batch side is small by contract,
    so the check is one action over the broadcast frame, never the dim)."""
    if assert_unique_updates:
        dup = (
            updates.groupBy(key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"updates batch has duplicate key {key}={dup[0][0]!r}; "
                "an SCD2 batch must carry one new-value row per key"
            )
    upd = F.broadcast(
        updates.select(
            key,
            F.lit(True).alias("_u_present"),
            *[F.col(a).alias(f"_u_{a}") for a in attrs],
        )
    )
    joined = dim.join(upd, key, "left")
    # NULL-safe change detection guarded by update presence: a NULL stored
    # attribute updated to a value (or vice versa) is a real change; keys
    # absent from the batch are never "changed".
    changed: Column = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(f"_u_{a}").eqNullSafe(F.col(a))
    changed = F.coalesce(F.col("_u_present"), F.lit(False)) & changed
    ts = F.lit(batch_ts).cast("timestamp")
    init = F.lit(valid_from_init).cast("timestamp")

    closed_old = joined.filter(changed).select(
        key,
        *attrs,
        init.alias("valid_from"),
        ts.alias("valid_to"),
    )
    open_new = joined.select(
        key,
        *[
            F.when(changed, F.col(f"_u_{a}")).otherwise(F.col(a)).alias(a)
            for a in attrs
        ],
        F.when(changed, ts).otherwise(init).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return closed_old.unionByName(open_new)
