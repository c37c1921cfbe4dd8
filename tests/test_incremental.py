"""Incremental near-dup detection vs persisted state
(operators/incremental.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.dedup import minhash_lsh_pairs
from vector_db_mvp_spark.operators.incremental import (
    build_dedup_state,
    incremental_minhash_pairs,
)
from vector_db_mvp_spark.sources.testdata import load_table

CFG = dict(n=5, num_hashes=16, bands=4)


def _pairs(df):
    return sorted(map(tuple, df.select("id1", "id2", "jaccard").collect()))


def test_incremental_equals_full_recompute_restricted(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 10 < 8)
    batch = docs.filter(F.col("doc_id") % 10 >= 8)

    state = str(tmp_path / "state")
    build_dedup_state(existing, state, **CFG)
    got = _pairs(incremental_minhash_pairs(spark, state, batch, tau=0.4, **CFG))

    full = minhash_lsh_pairs(docs, tau=0.4, **CFG)
    want = _pairs(
        full.filter((F.col("id1") % 10 >= 8) | (F.col("id2") % 10 >= 8))
    )
    assert got == want
    # and it found something (the fixture has near-dups across the split)
    assert len(got) > 0


def test_batch_append_then_next_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    part_a = docs.filter(F.col("doc_id") % 3 == 0)
    part_b = docs.filter(F.col("doc_id") % 3 == 1)
    part_c = docs.filter(F.col("doc_id") % 3 == 2)

    state = str(tmp_path / "state")
    build_dedup_state(part_a, state, **CFG)
    build_dedup_state(part_b, state, mode="append", **CFG)

    got = _pairs(incremental_minhash_pairs(spark, state, part_c, tau=0.4, **CFG))
    full = minhash_lsh_pairs(docs, tau=0.4, **CFG)
    want = _pairs(
        full.filter((F.col("id1") % 3 == 2) | (F.col("id2") % 3 == 2))
    )
    assert got == want


def test_bucketed_state_same_pairs_no_state_side_exchange(spark, sf_dir, tmp_path):
    from vector_db_mvp_spark.operators.incremental import (
        incremental_minhash_pairs_table,
        publish_dedup_state_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 10 < 8)
    batch = docs.filter(F.col("doc_id") % 10 >= 8)
    prefix = "dedupstate_test"
    try:
        publish_dedup_state_table(existing, prefix, str(tmp_path / "wh"))
        out = incremental_minhash_pairs_table(spark, prefix, batch, tau=0.4)

        # identical result to the path-based state
        state = str(tmp_path / "plainstate")
        build_dedup_state(existing, state, **CFG)
        want = _pairs(incremental_minhash_pairs(spark, state, batch, tau=0.4, **CFG))
        assert _pairs(out) == want

        # plan: the batch-vs-state join sort-merges and the state-side
        # branch (Sort -> Filter -> FileScan of the bucketed table) has NO
        # exchange — the bucket layout provides the partitioning. The full
        # pipeline checkpoints the candidate frame (truncating its plan
        # from `out`), so the shape is asserted on candidate_band_join —
        # the exact sub-plan _incremental_pairs executes.
        from vector_db_mvp_spark.operators.dedup import (
            _band_rows,
            _shingle_digests,
            _spread_tokens,
        )
        from vector_db_mvp_spark.operators.incremental import candidate_band_join

        batch_bands = _band_rows(
            _shingle_digests(_spread_tokens(batch, "text", "doc_id"), CFG["n"]),
            CFG["num_hashes"],
            CFG["bands"],
        )
        cand = candidate_band_join(
            batch_bands, spark.table(f"{prefix}_bands"), merge_hint=True
        )
        # executedPlan, not sparkPlan: EnsureRequirements (which inserts
        # the Sort/Exchange nodes being asserted) runs in the executed-plan
        # preparation phase.
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        k = plan.index(f"{prefix}_bands")
        state_branch = plan[plan[:k].rindex("Sort [band") : k]
        assert "Exchange" not in state_branch, state_branch
        assert "Bucketed: true" in plan[k : k + 300]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_bands")
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_post")


def test_compaction_shrinks_files_and_preserves_pairs(spark, sf_dir, tmp_path):
    import glob
    import os

    from vector_db_mvp_spark.operators.incremental import compact_dedup_state

    docs = load_table(spark, sf_dir, "documents")
    state = str(tmp_path / "state")
    # many appends -> fragmentation (each small append coalesces to ~1 file
    # under AQE, so fragmentation = number of appends)
    build_dedup_state(docs.filter(F.col("doc_id") % 8 == 0), state, **CFG)
    for m in range(1, 7):
        build_dedup_state(
            docs.filter(F.col("doc_id") % 8 == m), state, mode="append", **CFG
        )
    batch = docs.filter(F.col("doc_id") % 8 == 7)
    before = _pairs(incremental_minhash_pairs(spark, state, batch, tau=0.4, **CFG))
    n_before = len(glob.glob(os.path.join(state, "bands", "*.parquet")))

    assert compact_dedup_state(spark, state, target_files=4, min_files=4)
    n_after = len(glob.glob(os.path.join(state, "bands", "*.parquet")))
    assert n_after <= 4 < n_before
    after = _pairs(incremental_minhash_pairs(spark, state, batch, tau=0.4, **CFG))
    assert after == before
    # below the threshold: compaction is a no-op
    assert not compact_dedup_state(spark, state, target_files=4, min_files=32)


def test_state_build_is_skipped_when_present(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    state = str(tmp_path / "state")
    build_dedup_state(docs, state, **CFG)
    marker = os.path.join(state, "_STATE_OK")
    t0 = os.path.getmtime(marker)
    build_dedup_state(docs, state, **CFG)  # no-op
    assert os.path.getmtime(marker) == t0
