"""Training-shard export sink (sinks/shards.py)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from vector_db_mvp_spark.sinks.shards import (
    assign_shards,
    shard_manifest,
    write_training_shards,
)
from vector_db_mvp_spark.sources.testdata import load_table


def test_assignment_is_deterministic_and_total(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a1 = assign_shards(docs, n_shards=8).select("doc_id", "shard_id")
    a2 = assign_shards(docs, n_shards=8).select("doc_id", "shard_id")
    assert a1.exceptAll(a2).count() == 0
    bounds = a1.agg(F.min("shard_id"), F.max("shard_id")).collect()[0]
    assert 0 <= bounds[0] and bounds[1] <= 7
    # every doc appears exactly once
    assert a1.count() == docs.count()
    assert a1.select("doc_id").distinct().count() == docs.count()


def test_write_one_file_per_shard_and_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        docs, out, n_shards=4, size_col="n_chars"
    ).collect()

    # layout: shard_id=K dirs, exactly ONE parquet data file each
    for k in range(4):
        files = glob.glob(os.path.join(out, f"shard_id={k}", "*.parquet"))
        assert len(files) == 1, f"shard {k}: {files}"

    # roundtrip: reading the tree back yields every row exactly once
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()

    # manifest totals agree with the data
    by_shard = {r["shard_id"]: r for r in manifest}
    got = {
        r["shard_id"]: (r["n"], r["s"])
        for r in back.groupBy("shard_id")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    for k, row in by_shard.items():
        assert got[int(k)] == (row["n_docs"], row["total_size"])

    # the persisted manifest matches the returned one and is NOT read back
    # as data (underscore-prefixed dir is invisible to the parquet reader)
    stored = spark.read.parquet(os.path.join(out, "_manifest"))
    assert sorted(map(tuple, stored.collect())) == sorted(map(tuple, manifest))
    assert "shard_id=0" not in {os.path.basename(p) for p in glob.glob(os.path.join(out, "_manifest", "*"))}


def test_sorted_shards_have_tight_rowgroup_stats(spark, sf_dir, tmp_path):
    """sort_within_by gives each parquet row group tight min/max stats on
    the sort column — the storage-layout half of predicate skipping."""
    import pyarrow.parquet as pq

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = str(tmp_path / "sorted")
    write_training_shards(docs, out, n_shards=4, sort_within_by="doc_id")
    for k in range(4):
        f = glob.glob(os.path.join(out, f"shard_id={k}", "*.parquet"))[0]
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(len(md.schema))]
        col_idx = names.index("doc_id")
        prev_max = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            assert st.min <= st.max
            if prev_max is not None:
                assert st.min >= prev_max  # sorted: ranges never overlap
            prev_max = st.max


def test_incremental_rerun_routes_docs_to_same_shard(spark, sf_dir):
    # shard membership must be a pure function of doc_id: adding rows to the
    # corpus never moves an existing doc to a different shard
    docs = load_table(spark, sf_dir, "documents")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_map = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shards(docs, n_shards=8).collect()
    }
    half_map = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shards(half, n_shards=8).collect()
    }
    assert all(full_map[d] == s for d, s in half_map.items())
