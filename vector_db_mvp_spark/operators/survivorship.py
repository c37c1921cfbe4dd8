"""Entity-resolution survivorship: merge matched records into golden records.

The dedup family resolves WHICH rows are the same entity (fuzzy blocking ->
pair verify -> connected components); this module does the remaining step a
master-data pipeline needs — construct the single canonical record per
entity by merging attributes across its members under explicit,
deterministic survivorship rules:

- ``min`` / ``max``     : extreme value over the cluster (e.g. best price,
  largest size) — plain aggregates.
- ``mode``              : most frequent value, ties broken by the smaller
  value. Classic MDM "majority consensus" — made deterministic so a SQL
  oracle can reproduce it (DuckDB's ``mode()`` leaves ties unspecified, so
  the oracle spells out the same count + row_number construction).

All rules are expressed as two-level keyed aggregations (value-count per
(entity, value), then a rank window partitioned by entity) — no collects,
no funnels; the per-entity partitions are cluster-sized (tiny) at any
corpus scale, so the windows are skew-free.

Reference capability anchor: the reference keeps one canonical row per
document id and last-write-wins on update (vector_store.py upsert);
survivorship generalizes "canonical row" to fuzzy-matched entity groups
(SURVEY.md "LLM-pipeline operators" — curation needs a keeper policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def golden_record(
    df: DataFrame,
    *,
    entity_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """One row per ``entity_col`` value: attributes merged under ``rules``
    (col -> 'min' | 'max' | 'mode'), plus ``n_records`` = member count.

    Mode tie-break: among equally frequent values the SMALLEST wins —
    count-desc, value-asc ordering, fully deterministic under any
    partitioning.
    """
    aggs = [F.count(F.lit(1)).alias("n_records")]
    mode_cols: list[str] = []
    for col, rule in rules.items():
        if rule == "min":
            aggs.append(F.min(col).alias(col))
        elif rule == "max":
            aggs.append(F.max(col).alias(col))
        elif rule == "mode":
            mode_cols.append(col)
        else:
            raise ValueError(f"unknown survivorship rule {rule!r} for {col!r}")

    out = df.groupBy(entity_col).agg(*aggs)

    # Each mode is its own (entity, value)-keyed count + entity-keyed rank:
    # the first shuffle does map-side partial aggregation (value counts
    # combine before moving), and the rank window's partitions hold at most
    # |distinct values in one cluster| rows — bounded by cluster size.
    for col in mode_cols:
        w = Window.partitionBy(entity_col).orderBy(
            F.desc("_cnt"), F.col(col).asc()
        )
        mode_frame = (
            df.groupBy(entity_col, col)
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(entity_col, col)
        )
        out = out.join(mode_frame, entity_col)

    # Column order: entity, n_records, then rules order.
    return out.select(entity_col, "n_records", *rules.keys())
