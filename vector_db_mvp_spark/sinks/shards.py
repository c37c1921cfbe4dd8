"""Training-shard export: deterministic shard assignment + manifest + write.

The last step of a corpus build materializes the curated dataset as N
equal-ish shards that trainers stream independently (WebDataset/Megatron
convention). Requirements at 100 TB:

- **Deterministic assignment.** shard = md5-bucket of the document id — the
  same content-independent hash-bucket primitive as
  ``operators/textops.deterministic_split``: stable across runs, machines,
  and engines (no RNG, no ``spark_partition_id``), so an incremental re-run
  routes every doc to the same shard and any md5-capable engine can verify
  membership bit-for-bit.
- **One file per shard.** ``repartition(n_shards, shard_id)`` then
  ``partitionBy("shard_id")`` — each writer task owns exactly one shard's
  rows, so the layout is ``shard_id=K/part-*.parquet`` with one file per
  shard, no post-hoc compaction. (Hash-partitioning by the shard column
  maps each shard to one task; two shards may share a task only if
  ``spark.sql.shuffle.partitions`` < n_shards, which repartition's explicit
  numPartitions prevents.)
- **Manifest before trust.** ``shard_manifest`` aggregates per-shard doc
  counts and byte/token totals in one pass (map-side combine); a trainer
  checks the manifest, not the directory listing.

Balance note: md5 buckets give each shard a Binomial(N, 1/n) share — at
training scale (millions of docs per shard) the deviation is fractions of a
percent. Token-balanced (rather than count-balanced) sharding would sort by
size and round-robin — that needs the packing operator's prefix sum; this
sink deliberately keeps assignment content-independent instead so shard
membership survives re-runs over a changed corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame, *, id_col: str = "doc_id", n_shards: int = 16
) -> DataFrame:
    """Add ``shard_id`` = first-8-hex-digits(md5(id)) mod n_shards."""
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )
    return df.withColumn("shard_id", shard)


def shard_manifest(
    assigned: DataFrame,
    *,
    id_col: str = "doc_id",
    size_col: str | None = None,
) -> DataFrame:
    """Per-shard (shard_id, n_docs, min_id, max_id[, total_size]) in one
    partially-aggregated pass."""
    aggs = [
        F.count("*").alias("n_docs"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias("total_size"))
    return assigned.groupBy("shard_id").agg(*aggs).orderBy("shard_id")


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    n_shards: int = 16,
    size_col: str | None = None,
    format: str = "parquet",
    sort_within_by: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``path/shard_id=K/`` (one writer task per shard) plus
    ``path/_manifest`` (parquet). Returns the manifest DataFrame.

    ``sort_within_by`` sorts rows inside each shard before writing (no
    extra shuffle — a per-partition sort after the shard repartition), so
    parquet row-group min/max statistics on that column are tight and a
    later filtered read skips row groups instead of scanning the shard.
    """
    assigned = assign_shards(df, id_col=id_col, n_shards=n_shards)
    out = assigned.repartition(n_shards, F.col("shard_id"))
    if sort_within_by is not None:
        out = out.sortWithinPartitions(sort_within_by)
    (
        out.write.mode("overwrite")
        .partitionBy("shard_id")
        .format(format)
        .save(path)
    )
    spark = df.sparkSession
    manifest = shard_manifest(
        spark.read.format(format).load(path), id_col=id_col, size_col=size_col
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_manifest")
    )
    return manifest
