"""Event-time streaming analytics (SURVEY.md §2.9 ST7 [north-star]): the
Structured Streaming twin of the batch ``events_hourly`` query, with
watermarked late-data handling the reference has no concept of.

At scale this runs against Kafka/file streams; tests drive it with a file
source + ``availableNow`` trigger so the exact same plan is exercised
batch-equivalently."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType


def as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Coerce ``ts_col`` to ``TimestampType`` so it is a legal watermark column.

    Spark 4.x infers parquet timestamps without a zone as ``TIMESTAMP_NTZ``
    (spark.sql.parquet.inferTimestampNTZ.enabled defaults to true) and
    ``withWatermark`` rejects NTZ event time
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).  The cast is a no-op when the
    column is already ``timestamp``, so every streaming entry point funnels
    through here before declaring a watermark."""
    if isinstance(df.schema[ts_col].dataType, TimestampType):
        return df
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def windowed_event_counts(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window counts per event_type with a watermark.

    The same aggregation expressions as the batch twin
    (workload/relational.py q_events_hourly); ``withWatermark`` bounds state:
    windows older than max(event time) - watermark are finalized and evicted
    — the knob that keeps state finite on an unbounded 100 TB/day stream.
    """
    return (
        as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def view_purchase_attribution(
    views: DataFrame,
    purchases: DataFrame,
    *,
    watermark: str = "1 hour",
    within: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds (ST7 companion): each
    purchase matched to the views by the same user in the preceding
    ``within`` interval — the classic click/view attribution join.

    Both inputs carry a watermark and the join predicate bounds purchase
    time to [view time, view time + within], which is what lets Spark evict
    buffered rows: a view older than watermark + within can never match a
    future purchase, so per-key state stays finite on an unbounded stream.
    Batch semantics are identical (the pytest twin runs the same function on
    bounded DataFrames), mirroring the batch as-of join
    (operators/asof.py) with which it shares the purchase/view workload."""
    v = as_event_time(views, ts_col).withWatermark(ts_col, watermark).select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col(ts_col).alias("view_ts"),
    )
    p = as_event_time(purchases, ts_col).withWatermark(ts_col, watermark).select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return v.join(
        p,
        [
            v["user_id"] == p["user_id"],
            F.col("purchase_ts") >= F.col("view_ts"),
            F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {within}"),
        ],
        "inner",
    ).select(
        v["user_id"],
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def user_running_counts(events: DataFrame, *, ts_col: str = "ts", watermark: str = "30 minutes") -> DataFrame:
    """Stateful per-user event counting via applyInPandasWithState (ST2: the
    explicit-state analog of the reference's InteractiveState counters)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("n_events", LongType(), False),
        ]
    )
    state_schema = StructType([StructField("n", LongType(), False)])

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return (
        as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
