"""Incremental near-dup detection: new batch vs persisted corpus state.

At 100 TB you never re-MinHash the whole corpus because a 1 TB batch
arrived. The full pipeline (``dedup.minhash_lsh_pairs``) is O(corpus) per
run; this module makes the per-batch cost O(batch + candidates):

- **build** (once, then per-batch append): persist the corpus's dedup state
  — banded signature rows (doc, band, band_hash) and shingle postings
  (doc, shingle digest) — as parquet. MinHash signatures depend only on
  each document's own shingles (fixed Kirsch–Mitzenmacher family over one
  md5 digest per shingle — functions/text.py), so state rows
  never go stale when other documents arrive; a batch is ingested by
  appending its rows, no rewrite.
- **query** (per batch): shingle/band ONLY the new documents, join their
  bands against state ∪ batch bands (one shuffle keyed by band hash — the
  state side prunes to matching hashes, it is never scanned per-pair), and
  exact-Jaccard-verify candidates using postings of the candidate documents
  only (semi-join pushdown into the postings scan).

Equivalence guarantee (tested + oracle-checked): because band rows are
corpus-independent, ``incremental_minhash_pairs(existing, batch)`` returns
EXACTLY the pairs of a full recompute over existing ∪ batch restricted to
pairs touching the batch — same recall, same scores, bit-for-bit.

Honest local-bench note: at sf0.1 (5k docs) the batch path's fixed costs
(state reads, union, semi-join, two cache fills) make it comparable to the
full recompute — the corpus is too small for O(batch) vs O(corpus) to show.
What changes at scale: the per-batch work that grows with the corpus is ONE
columnar scan of the 8-byte band/posting state (no text re-shingling, no
signature recompute), and verification touches candidate documents only.
For 100 TB use :func:`publish_dedup_state_table` /
:func:`incremental_minhash_pairs_table`: the state lives as tables bucketed
on the join keys, so the candidate join sort-merges on the bucket layout
and the state side is never shuffled at all (plan-asserted in tests).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _band_rows, _jaccard_verify, _shingle_digests, _spread_tokens


def dedup_state_path(
    corpus_key: str, *, n: int, num_hashes: int, bands: int, root: str | None = None
) -> str:
    """Filesystem location of the dedup state for (corpus, config)."""
    root = root or os.environ.get(
        "SPARK_GRAFT_INDEX_DIR",
        os.path.join(tempfile.gettempdir(), "spark_graft_served_index"),
    )
    # "km2" versions the hash family (Kirsch–Mitzenmacher over per-shingle
    # md5s; km2 = the 56-bit-h2 family that fixed the km1 slot-degeneracy,
    # functions/text.py): state persisted under an older family must never
    # be reused — bands from different families silently never match.
    key = hashlib.md5(f"{corpus_key}|{n}|{num_hashes}|{bands}|km2".encode()).hexdigest()[:16]
    return os.path.join(root, f"dedupstate-{key}")


def build_dedup_state(
    docs: DataFrame,
    state_path: str,
    *,
    n: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "overwrite",
    force: bool = False,
) -> str:
    """Persist (or append, ``mode='append'``) the banded signatures and
    shingle postings for ``docs``. Skips work when the artifact exists
    unless ``force``."""
    done = os.path.join(state_path, "_STATE_OK")
    if os.path.exists(done) and not force and mode == "overwrite":
        return state_path
    # localCheckpoint, NOT cache+unpersist: the checkpoint blocks are freed
    # when the frame is garbage-collected, whereas Dataset.unpersist()
    # (measured, Spark 4.1) disturbs the session CacheManager enough that
    # UNRELATED later .cache() plans stop being reused — a one-time build
    # must not degrade every subsequent query in the session. The eager
    # barrier also shares the shingle pass across the two writes below and
    # blocks predicate re-inlining just like the cache boundary did.
    # second (post-level) checkpoint on top of the token barrier: the two
    # writes below are separate actions, so without it the shingle+digest
    # pass would run once per write.
    post = _shingle_digests(
        _spread_tokens(docs, text_col, id_col), n
    ).localCheckpoint(eager=True)
    _band_rows(post, num_hashes, bands).write.mode(mode).parquet(
        os.path.join(state_path, "bands")
    )
    (
        post.withColumnRenamed("m", "s")
        .write.mode(mode)
        .parquet(os.path.join(state_path, "postings"))
    )
    with open(done, "w") as f:
        f.write("ok")
    return state_path


def incremental_minhash_pairs(
    spark: SparkSession,
    state_path: str,
    new_docs: DataFrame,
    *,
    n: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    tau: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs (id1 < id2, exact Jaccard >= tau) touching at least
    one document of ``new_docs``, against the corpus persisted at
    ``state_path``. Cost is O(|batch| + candidates), not O(corpus).

    Contract: ``new_docs`` ids must not already exist in the state (the
    standard append-only ingestion invariant) — a re-ingested id would
    double its postings and skew the verify counts.

    recursiveFileLookup: the batch path writes the state flat; the
    streaming gate (streaming/neardup_stream.py) writes one subdirectory
    per epoch for idempotent replays — read both layouts."""
    return _incremental_pairs(
        spark.read.option("recursiveFileLookup", "true").parquet(
            os.path.join(state_path, "bands")
        ),
        spark.read.option("recursiveFileLookup", "true").parquet(
            os.path.join(state_path, "postings")
        ),
        new_docs,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        tau=tau,
        text_col=text_col,
        id_col=id_col,
    )


def candidate_band_join(
    new_bands: DataFrame, state_bands: DataFrame, *, merge_hint: bool = False
) -> DataFrame:
    """Candidate pairs (id1 < id2) from shared band hashes: batch-vs-state
    plus batch-vs-batch, unioned distinct.

    The two joins are kept SEPARATE on purpose: unioning the batch bands
    into the state frame first would erase the state table's bucket-derived
    partitioning and force both sides to shuffle. Split, the state side of
    the batch-vs-state join keeps its layout (zero exchange when bucketed
    — plan-asserted in tests/test_incremental.py on this function), and the
    batch self-join is O(batch) anyway. ``merge_hint`` forces sort-merge —
    set by the bucketed-table path; broadcast would win at fixture scale
    but not at 100 TB, where the batch's band table can exceed the
    broadcast threshold."""
    state_side = state_bands.hint("merge") if merge_hint else state_bands
    a, b = new_bands.alias("a"), state_side.alias("b")
    cand_state = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a._id") != F.col("b._id")),
    ).select(
        F.least(F.col("a._id"), F.col("b._id")).alias("id1"),
        F.greatest(F.col("a._id"), F.col("b._id")).alias("id2"),
    )
    a2, b2 = new_bands.alias("a"), new_bands.alias("b")
    cand_new = a2.join(
        b2,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
    return cand_state.unionByName(cand_new).distinct()


def _incremental_pairs(
    state_bands: DataFrame,
    state_post: DataFrame,
    new_docs: DataFrame,
    *,
    n: int,
    num_hashes: int,
    bands: int,
    tau: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    merge_hint: bool = False,
) -> DataFrame:
    """Core batch-vs-state pipeline over already-loaded state frames;
    candidate generation is :func:`candidate_band_join` (see its docstring
    for the join-shape rationale and the ``merge_hint`` contract)."""
    # The token barrier inside _spread_tokens blocks predicate re-inlining
    # (see operators/dedup.py); the digest pass above it is consumed via the
    # caches below, so no second checkpoint is needed on the query path.
    batch_post = _shingle_digests(_spread_tokens(new_docs, text_col, id_col), n)
    # scratch frames are EAGER localCheckpoints, not .cache(): a cached plan
    # stays registered in the session CacheManager until an explicit
    # unpersist (which Spark 4.1 makes hazardous — see build_dedup_state),
    # so a serve-many session leaks one cache entry per query invocation
    # (measured: +4 cached RDDs per call, unbounded growth). Checkpoint
    # blocks are dropped by the ContextCleaner as soon as the query's
    # DataFrames go out of scope.
    new_bands = _band_rows(batch_post, num_hashes, bands).localCheckpoint(eager=True)
    new_post = batch_post.withColumnRenamed("m", "s")

    cands = (
        candidate_band_join(new_bands, state_bands, merge_hint=merge_hint)
        # localCheckpoint, not .cache(): cands feeds the verify join AND the
        # candidate-id semi filter (without persistence the band joins
        # re-execute once per consumer — measured 2x wall time), and unlike
        # .cache() the blocks are dropped when the query's frames go out of
        # scope instead of leaking a CacheManager entry per invocation
        # (measured: +4 cached RDDs per call, unbounded CacheManager
        # growth in a serve-many session). The checkpoint truncates the
        # candidate-join plan from the returned frame; the SMJ/no-exchange
        # shape is asserted on :func:`candidate_band_join` directly.
        .localCheckpoint(eager=True)
    )

    # verify against postings of candidate documents only: the IN-filter on
    # doc id reaches the postings parquet scan as a pushed predicate via the
    # left-semi join, so the state postings are never fully materialized.
    cand_ids = (
        cands.select(F.col("id1").alias("_id"))
        .union(cands.select(F.col("id2").alias("_id")))
        .distinct()
    )
    # materialized: the filtered postings (candidate docs only — small) are
    # read by both sides of the common-shingle join and by the set-size
    # aggregation.
    post = (
        state_post.unionByName(new_post)
        .join(cand_ids, "_id", "left_semi")
        .localCheckpoint(eager=True)
    )
    return _jaccard_verify(cands, post, tau)


def compact_dedup_state(
    spark: SparkSession,
    state_path: str,
    *,
    target_files: int = 8,
    min_files: int = 32,
) -> bool:
    """Rewrite the append-only state into ``target_files`` files per table
    when fragmentation passes ``min_files`` — the small-files counterpart of
    the entity store's size-tiered compaction. Every micro-batch append adds
    a file set; unchecked, a year of batches means thousands of tiny files
    whose open/footer costs dominate the state scan. Returns True if a
    rewrite happened.

    The rewrite is publish-then-swap: compacted data lands in a sibling
    directory, the live directory is replaced only after the write
    succeeds — a reader mid-swap sees old or new state, never a mix.

    The streaming gate writes one subdirectory per epoch (idempotent
    replays); the file count and the read are recursive so those layouts
    compact too. Refuses (returns False) while any epoch subdirectory
    lacks its replay marker — folding an uncommitted crash remnant into
    the flat files would make the epoch's redelivery double-append
    (the substring-state compaction contract, operators/substring.py).
    """
    import shutil

    def _n_files(d: str) -> int | None:
        """Recursive parquet count; None = an unmarked epoch remnant."""
        total = 0
        for root_dir, _dirs, files in os.walk(d):
            base = os.path.basename(root_dir)
            if base.startswith("batch_"):
                key = base[len("batch_"):]
                if not os.path.exists(
                    os.path.join(state_path, f"_BATCH_{key}_OK")
                ):
                    return None
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    did = False
    for sub in ("bands", "postings"):
        live = os.path.join(state_path, sub)
        if not os.path.isdir(live):
            continue
        n = _n_files(live)
        if n is None:
            return False  # uncommitted crash remnant — do not fold
        if n < min_files:
            continue
        tmp = os.path.join(state_path, f"_{sub}_compacting")
        shutil.rmtree(tmp, ignore_errors=True)
        spark.read.option("recursiveFileLookup", "true").parquet(
            live
        ).repartition(target_files).write.mode("overwrite").parquet(tmp)
        old = os.path.join(state_path, f"_{sub}_old")
        shutil.rmtree(old, ignore_errors=True)
        os.rename(live, old)
        os.rename(tmp, live)
        shutil.rmtree(old, ignore_errors=True)
        did = True
    return did


def publish_dedup_state_table(
    docs: DataFrame,
    table_prefix: str,
    warehouse_dir: str,
    *,
    n: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[str, str]:
    """The 100 TB variant of :func:`build_dedup_state`: publish the state as
    BUCKETED tables — bands bucketed+sorted on ``(band, bh)`` (the candidate
    join keys), postings bucketed on ``_id`` (the verify key). The write pays the
    shuffle once; every subsequent batch joins against the state with no
    state-side exchange (asserted in tests/test_incremental.py).

    Returns the (bands_table, postings_table) names.
    """
    import os as _os

    # localCheckpoint for the same reason as build_dedup_state: a one-time
    # publish must not leave CacheManager entries or (via unpersist) degrade
    # unrelated cached plans for the rest of the session.
    post = _shingle_digests(
        _spread_tokens(docs, text_col, id_col), n
    ).localCheckpoint(eager=True)
    bands_t, post_t = f"{table_prefix}_bands", f"{table_prefix}_post"
    (
        _band_rows(post, num_hashes, bands)
        .write.bucketBy(buckets, "band", "bh")
        .sortBy("band", "bh")
        .option("path", _os.path.join(warehouse_dir, bands_t))
        .mode("overwrite")
        .saveAsTable(bands_t)
    )
    (
        post.withColumnRenamed("m", "s")
        .write.bucketBy(buckets, "_id")
        .option("path", _os.path.join(warehouse_dir, post_t))
        .mode("overwrite")
        .saveAsTable(post_t)
    )
    return bands_t, post_t


def incremental_minhash_pairs_table(
    spark: SparkSession,
    table_prefix: str,
    new_docs: DataFrame,
    *,
    n: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    tau: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch-vs-state pairs against a bucketed state published by
    :func:`publish_dedup_state_table`: the candidate join sort-merges on the
    bucket layout, shuffling ONLY the batch side."""
    return _incremental_pairs(
        spark.table(f"{table_prefix}_bands"),
        spark.table(f"{table_prefix}_post"),
        new_docs,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        tau=tau,
        text_col=text_col,
        id_col=id_col,
        merge_hint=True,
    )
