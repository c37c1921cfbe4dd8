"""Exact substring dedup: document PAIRS sharing a verbatim token span of
at least L tokens, with the length of the longest shared span — the
ExactSubstr join of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022). The per-document coverage twin lives
in operators/textops.py (dup_span_metrics); this operator answers the
PAIRWISE question a dedup pipeline acts on ("which pairs verbatim-overlap,
and by how much"), extending the reference's corpus-level duplicate
reporting (vector_db_mvp app/routers/stats.py) to the span level.

Lee et al. build suffix arrays, which don't distribute; the Spark-shaped
exact restatement is a positional L-gram anchor join plus diagonal
run-length extension:

  1. positional L-gram postings (doc, pos, hash64) — one corpus pass;
  2. anchor prune: only hashes seen in >= 2 DISTINCT docs can witness a
     cross-doc span, so the pair join runs on the (much smaller)
     cross-doc postings subset — the dup_span_metrics prune;
  3. anchor join on the 8-byte hash with doc1 < doc2 -> aligned
     occurrence pairs (pa, pb);
  4. span extension WITHOUT re-reading text: two L-grams of the same pair
     at (pa, pb) and (pa+1, pb+1) overlap in L-1 tokens, so a maximal
     run of consecutive positions on one DIAGONAL (pa - pb constant) is
     exactly a maximal shared span of run_length + L - 1 tokens. Runs
     are gaps-and-islands per (pair, diagonal): grp = pa - row_number()
     ordered by pa, span = max(pa) - min(pa) + L.

Correctness: a shared verbatim span of s >= L tokens contains s - L + 1
consecutive aligned L-grams (every window matches), and conversely
chained matching windows overlap pairwise in L-1 tokens, so the union of
a diagonal run IS a verbatim match — the island arithmetic is exact
integer math, engine-independent, and a SQL oracle replays it verbatim.
Hash equality stands in for string equality (64-bit md5 prefix, same
collision stance as dup_span_metrics; both engines hash identically so
parity is unaffected).

Scale (100 TB): postings shuffle on the 8-byte hash, never the text; the
anchor join's per-hash cost is |occurrences|^2 — boilerplate L-grams are
the skew hazard, mitigated by (a) L large enough that stop-grams are rare
(12+ tokens of verbatim agreement is already a dedup signal, not a
collocation), (b) AQE skew-join splitting, and (c) ``max_postings``: drop
hashes whose TOTAL occurrence count exceeds the cap before the pair join
(the Lee et al. sampling compromise). A capped hash loses only the pairs
witnessed EXCLUSIVELY by boilerplate grams — a span containing any
sub-cap gram still surfaces (possibly split into shorter islands where a
dropped gram interrupts a diagonal run). The cap bounds per-hash join
fan-out at cap^2, turning the worst case (a license header shared by
millions of documents) from |corpus|^2 into a constant. The registered
gate instances run BOTH the uncapped operator (semantics exact) and a
capped instance whose oracle replays the same occurrence filter, so the
cap path is driver-checked too. The islands window is keyed by (pair,
diagonal) — balanced, no corpus-wide ordering anywhere.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import h64, shingles
from .dedup import _spread_tokens


def _postings(
    df: DataFrame, L: int, text_col: str, id_col: str
) -> DataFrame:
    """Positional L-gram postings (_id, _pos, _h), checkpointed. Rows
    depend only on each document's OWN text (the minhash state-appendix
    argument, operators/incremental.py), so persisted postings never go
    stale when other documents arrive — the incremental path appends."""
    toks = _spread_tokens(df, text_col, id_col)
    return (
        toks.select(
            F.col("_id"),
            F.posexplode(shingles(F.col("_t"), L)).alias("_pos", "_s"),
        )
        .select("_id", "_pos", h64(F.col("_s")).alias("_h"))
        .localCheckpoint(eager=True)
    )


def _pairs_from_matches(m: DataFrame, L: int) -> DataFrame:
    """(doc1, doc2, max_span_tokens, n_spans, n_shared_grams) from matched
    occurrence pairs m(d1, d2, pa, pb, _h) with d1 < d2 — the diagonal
    run-length island arithmetic shared by the full join and the
    incremental batch path (span = max(pa) - min(pa) + L; see module
    docstring for the overlap-chaining proof)."""
    runs = m.withColumn("_diag", F.col("pa") - F.col("pb")).withColumn(
        "_grp",
        F.col("pa")
        - F.row_number().over(
            Window.partitionBy("d1", "d2", "_diag").orderBy("pa")
        ),
    )
    spans = runs.groupBy("d1", "d2", "_diag", "_grp").agg(
        (F.max("pa") - F.min("pa") + F.lit(L)).alias("_span")
    )
    sp = spans.groupBy("d1", "d2").agg(
        F.max("_span").cast("long").alias("max_span_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
    )
    gr = m.groupBy("d1", "d2").agg(
        F.countDistinct("_h").cast("long").alias("n_shared_grams")
    )
    return (
        sp.join(gr, ["d1", "d2"])
        .select(
            F.col("d1").alias("doc1"),
            F.col("d2").alias("doc2"),
            "max_span_tokens",
            "n_spans",
            "n_shared_grams",
        )
        .orderBy("doc1", "doc2")
    )


def exact_substring_pairs(
    df: DataFrame,
    *,
    min_tokens: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int | None = None,
) -> DataFrame:
    """(doc1, doc2, max_span_tokens, n_spans, n_shared_grams) for every
    document pair sharing at least one verbatim span of >= ``min_tokens``
    tokens; doc1 < doc2, ordered. ``max_span_tokens`` is the longest
    shared span, ``n_spans`` the number of maximal aligned runs across
    all diagonals, ``n_shared_grams`` the distinct shared L-gram hashes.

    ``max_postings``: skew cap — hashes with more than this many total
    occurrences are dropped before the pair join (module docstring,
    mitigation (c)). None = exact semantics.
    """
    if min_tokens < 2:
        raise ValueError("exact_substring_pairs: min_tokens must be >= 2")
    L = min_tokens
    pos = _postings(df, L, text_col, id_col)
    dup_h = (
        pos.groupBy("_h")
        .agg(
            F.countDistinct("_id").alias("_nd"),
            F.count(F.lit(1)).alias("_no"),
        )
        .filter(
            (F.col("_nd") >= 2)
            & (
                F.lit(True)
                if max_postings is None
                else F.col("_no") <= max_postings
            )
        )
        .select("_h")
    )
    anchors = pos.join(dup_h, "_h")
    a = anchors.select("_h", F.col("_id").alias("d1"), F.col("_pos").alias("pa"))
    b = anchors.select(
        F.col("_h").alias("_hb"), F.col("_id").alias("d2"), F.col("_pos").alias("pb")
    )
    m = a.join(b, (a["_h"] == b["_hb"]) & (a["d1"] < b["d2"])).select(
        "d1", "d2", "pa", "pb", "_h"
    )
    return _pairs_from_matches(m, L)


# ---------------------------------------------------------------------------
# Incremental path: new batch vs persisted postings state
# ---------------------------------------------------------------------------


def substring_state_path(
    corpus_key: str, *, min_tokens: int, root: str | None = None
) -> str:
    """Filesystem location of the positional-postings state for
    (corpus, L). "v1" versions the posting layout (md5-prefix h64)."""
    root = root or os.environ.get(
        "SPARK_GRAFT_INDEX_DIR",
        os.path.join(tempfile.gettempdir(), "spark_graft_served_index"),
    )
    key = hashlib.md5(f"{corpus_key}|{min_tokens}|v1".encode()).hexdigest()[:16]
    return os.path.join(root, f"substrstate-{key}")


def build_substring_state(
    docs: DataFrame,
    state_path: str,
    *,
    min_tokens: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "overwrite",
    force: bool = False,
) -> str:
    """Persist (or append) the positional L-gram postings for ``docs``.
    Postings depend only on each document's own text, so ingestion is an
    append — the incremental_minhash_pairs state argument verbatim."""
    done = os.path.join(state_path, "_STATE_OK")
    if os.path.exists(done) and not force and mode == "overwrite":
        return state_path
    _postings(docs, min_tokens, text_col, id_col).write.mode(mode).parquet(
        os.path.join(state_path, "postings")
    )
    with open(done, "w") as f:
        f.write("ok")
    return state_path


def incremental_substring_pairs(
    spark: SparkSession,
    state_path: str,
    new_docs: DataFrame,
    *,
    min_tokens: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int | None = None,
) -> DataFrame:
    """Exact-substring pairs (same schema as :func:`exact_substring_pairs`)
    touching at least one document of ``new_docs``, against the corpus
    persisted at ``state_path`` — per-batch cost O(batch postings +
    matched occurrences), never a corpus re-shingle.

    ``max_postings`` mirrors :func:`exact_substring_pairs`: a hash whose
    TOTAL occurrence count (state + batch) exceeds the cap is dropped
    before the pair join. The count only needs the state postings that
    already matched a batch hash, so the cap costs one extra aggregation
    over the matched subset — still O(batch + matched), and capped
    incremental == capped full recompute restricted to batch-touching
    pairs (same total counts, same dropped hashes).

    Equivalence (oracle-checked): postings rows are corpus-independent,
    so batch-vs-(state ∪ batch) matches restricted to pairs touching the
    batch are EXACTLY the full recompute's matches so restricted — the
    island arithmetic then runs on identical inputs. Contract: new ids
    must not already exist in the state (append-only ingestion; a
    re-ingested id would duplicate its postings and corrupt positions).

    Scale: the state side is pruned by the hash equi-join (postings of
    matching L-grams only); at 100 TB use
    :func:`publish_substring_state_table` +
    :func:`incremental_substring_pairs_table` — the postings live
    bucketed on _h, so the batch join sort-merges with zero state-side
    exchange (the incremental.py table path, plan-asserted in
    tests/test_substring.py)."""
    # recursiveFileLookup: the batch path writes postings flat, the
    # streaming gate (streaming/substring_stream.py) writes one
    # subdirectory per epoch for idempotent replays — read both layouts.
    state = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(state_path, "postings")
    )
    return _pairs_vs_state(
        state,
        _postings(new_docs, min_tokens, text_col, id_col),
        min_tokens,
        max_postings,
        merge_hint=False,
    )


def _pairs_vs_state(
    state: DataFrame,
    batch: DataFrame,
    L: int,
    max_postings: int | None,
    *,
    merge_hint: bool,
) -> DataFrame:
    """Shared batch-vs-state body of the path and table incremental
    variants; ``state``/``batch`` are postings frames (_id, _pos, _h).
    ``merge_hint`` forces the hash equi-join to sort-merge so a bucketed
    state side keeps its layout (no broadcast of batch postings, no
    state-side exchange)."""
    if max_postings is not None:
        # Total (state + batch) occurrences per batch-touching hash; the
        # state side is pruned to matched hashes FIRST so the count scans
        # the matched subset, not the corpus. Checkpointed: three
        # consumers (the count and both join legs).
        state = state.join(
            batch.select("_h").distinct(), "_h", "left_semi"
        ).localCheckpoint(eager=True)
        occ = (
            state.select("_h")
            .unionByName(batch.select("_h"))
            .groupBy("_h")
            .agg(F.count(F.lit(1)).alias("_no"))
        )
        keep_h = occ.filter(F.col("_no") <= max_postings).select("_h")
        batch = batch.join(keep_h, "_h", "left_semi").localCheckpoint(
            eager=True
        )
        state = state.join(keep_h, "_h", "left_semi")
    a = batch.select("_h", F.col("_id").alias("db"), F.col("_pos").alias("pb_"))
    s = state.select(
        F.col("_h").alias("_hs"), F.col("_id").alias("ds"), F.col("_pos").alias("ps_")
    )
    if merge_hint:
        s = s.hint("merge")
    # batch-vs-state: orient (d1 < d2) and carry positions in pair order so
    # the diagonal arithmetic is orientation-consistent.
    vs_state = (
        a.join(s, (a["_h"] == s["_hs"]) & (a["db"] != s["ds"]))
        .select(
            F.least("db", "ds").alias("d1"),
            F.greatest("db", "ds").alias("d2"),
            F.when(F.col("db") < F.col("ds"), F.col("pb_"))
            .otherwise(F.col("ps_"))
            .alias("pa"),
            F.when(F.col("db") < F.col("ds"), F.col("ps_"))
            .otherwise(F.col("pb_"))
            .alias("pb"),
            "_h",
        )
    )
    b2 = batch.select(
        F.col("_h").alias("_hb"), F.col("_id").alias("d2"), F.col("_pos").alias("pb")
    )
    vs_batch = (
        batch.select("_h", F.col("_id").alias("d1"), F.col("_pos").alias("pa"))
        .join(b2, (F.col("_h") == F.col("_hb")) & (F.col("d1") < F.col("d2")))
        .select("d1", "d2", "pa", "pb", "_h")
    )
    return _pairs_from_matches(vs_state.unionByName(vs_batch), L)


def substring_table_prefix(corpus_key: str, *, min_tokens: int) -> str:
    """Deterministic session-table prefix for the bucketed postings of one
    (corpus, L) — mirrors :func:`substring_state_path` for the table
    layout ("t1" versions it)."""
    key = hashlib.md5(
        f"{corpus_key}|{min_tokens}|t1".encode()
    ).hexdigest()[:12]
    return f"substrstate_{key}"


def publish_substring_state_table(
    docs: DataFrame,
    table_prefix: str,
    warehouse_dir: str,
    *,
    min_tokens: int = 12,
    buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    force: bool = True,
) -> str:
    """The 100 TB variant of :func:`build_substring_state`: publish the
    positional L-gram postings as a table BUCKETED+SORTED on the 8-byte
    hash (the batch join key). The write pays the (_h) shuffle once;
    every subsequent batch's anchor join sort-merges against the bucket
    layout with NO state-side exchange (plan-asserted in
    tests/test_substring.py) — the publish_dedup_state_table pattern
    (operators/incremental.py) applied to the ExactSubstr postings.
    Returns the table name. ``force=False`` skips the build when the
    table already exists in this session's catalog (the
    publish_copurchase_edges idempotence pattern)."""
    name = f"{table_prefix}_postings"
    if not force and docs.sparkSession.catalog.tableExists(name):
        return name
    (
        _postings(docs, min_tokens, text_col, id_col)
        .write.bucketBy(buckets, "_h")
        .sortBy("_h")
        .option("path", os.path.join(warehouse_dir, name))
        .mode("overwrite")
        .saveAsTable(name)
    )
    return name


def incremental_substring_pairs_table(
    spark: SparkSession,
    table_prefix: str,
    new_docs: DataFrame,
    *,
    min_tokens: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int | None = None,
) -> DataFrame:
    """Batch-vs-state exact-substring pairs against a bucketed state
    published by :func:`publish_substring_state_table`: identical result
    to :func:`incremental_substring_pairs` (pytest-pinned), but the hash
    equi-join sort-merges on the bucket layout — only the batch side
    shuffles. With ``max_postings`` the capped branch prunes and
    checkpoints the matched state subset first (losing the layout for
    the small matched frame only); the zero-exchange pin applies to the
    uncapped path."""
    return _pairs_vs_state(
        spark.table(f"{table_prefix}_postings"),
        _postings(new_docs, min_tokens, text_col, id_col),
        min_tokens,
        max_postings,
        merge_hint=True,
    )


def compact_substring_state(
    spark: SparkSession,
    state_path: str,
    *,
    target_files: int = 8,
    min_files: int = 32,
) -> bool:
    """Rewrite the postings state into ``target_files`` flat files when
    fragmentation passes ``min_files`` — the compact_dedup_state pattern
    (operators/incremental.py) for the substring gate. The streaming gate
    writes one subdirectory per epoch (idempotent replays,
    streaming/substring_stream.py), so a long-lived stream accumulates
    directories whose listing/footer costs grow with epoch count; the
    compaction folds them back into a flat layout (recursiveFileLookup
    reads both, so readers never care which they get).

    Safety: refuses (returns False) while any epoch subdirectory lacks
    its replay marker — that remnant belongs to a crashed, uncommitted
    delivery, and folding it into the flat files would make the epoch's
    redelivery double-append (the handler's crash cleanup removes the
    SUBDIRECTORY, which would no longer hold the rows). Run it between
    stream runs, like the dedup-state compaction.

    The rewrite is publish-then-swap: compacted data lands in a sibling
    directory and the live directory is replaced only after the write
    succeeds — a reader mid-swap sees old or new state, never a mix.
    """
    import shutil

    live = os.path.join(state_path, "postings")
    if not os.path.isdir(live):
        return False
    n_files = 0
    for root_dir, _dirs, files in os.walk(live):
        base = os.path.basename(root_dir)
        if base.startswith("batch_"):
            key = base[len("batch_"):]
            if not os.path.exists(
                os.path.join(state_path, f"_BATCH_{key}_OK")
            ):
                return False  # uncommitted crash remnant — do not fold
        n_files += sum(1 for f in files if f.endswith(".parquet"))
    if n_files < min_files:
        return False
    tmp = os.path.join(state_path, "_postings_compacting")
    shutil.rmtree(tmp, ignore_errors=True)
    (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(live)
        .repartition(target_files)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    old = os.path.join(state_path, "_postings_old")
    shutil.rmtree(old, ignore_errors=True)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old, ignore_errors=True)
    return True
