"""Deduplication operators for large-scale training-data pipelines
(north-star surface; BASELINE.json "dedup, similarity search ... at 100 TB
scale"). Five strategies over a (id, text | embedding) corpus:

1. ``exact_dedup``            — hash-groupBy on a normalized-text fingerprint.
2. ``ngram_jaccard_pairs``    — word-n-gram shingle inverted-index join +
                                exact Jaccard verify. No cross join, ever:
                                candidate pairs come from the shingle join,
                                so cost is Σ_s df(s)² over shared shingles,
                                not N².
3. ``minhash_lsh_pairs``      — k-minhash signatures banded into b bands;
                                pairs sharing a band are verified with true
                                Jaccard. The classic sub-quadratic near-dup
                                pass: one shuffle on band keys.
4. ``simhash_pairs``          — 32-bit simhash, banded into 4 bytes
                                (pigeonhole: hamming <= 3 guarantees a shared
                                byte-band), verified with bit_count(xor).
5. ``embedding_neardup_pairs``— cosine-threshold self-join; exact variant for
                                oracle parity, LSH-bucketed variant as the
                                scale path.

Every operator is pure DataFrame ops (shuffles on content-derived keys,
map-side combine, AQE-friendly); skew from hot shingles/buckets is handled
by ``max_doc_freq`` stop-shingle pruning (mirrors stopword removal in
MinHash literature) which also mirrors into the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    h64,
    minhash_signature,
    shingles,
    simhash_from_hashes,
    token_hashes,
    tokens,
)
from ..functions.vector import cosine_similarity

NORM_TEXT = lambda c: F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")  # noqa: E731
SQL_NORM_TEXT = "regexp_replace(trim(lower({c})), '\\s+', ' ', 'g')"


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Hash-repartition on the id before CPU-heavy text work.

    A small parquet file arrives as ONE input split, so without this every
    shingling/hashing expression runs on a single core while the rest idle
    (measured: 8 s single-task shingling at sf0.1 on local[32]). The shuffle
    moves only (id, text) — cheap — and the same move is what a 1000-executor
    cluster needs anyway to spread row-group-skewed inputs."""
    return df.repartition(F.col(id_col))


def exact_dedup(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by md5(normalized text): (fingerprint, n_docs, keeper_id).
    keeper = min id (deterministic survivor selection)."""
    return (
        df.withColumn("fingerprint", F.md5(NORM_TEXT(F.col(text_col))))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def _shingled(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(_id, _sh: array<string>) — tokens materialized in their OWN projection
    first: inlined into shingles(), the tokenizing regex re-runs inside the
    per-shingle slice lambda (measured 6x slower at sf0.1)."""
    return df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_t")
    ).select("_id", shingles(F.col("_t"), n).alias("_sh"))


def _distinct_shingles(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, shingle) distinct pairs — the inverted-index postings."""
    return (
        _shingled(df, n, text_col, id_col)
        .select("_id", F.explode("_sh").alias("s"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    n: int = 5,
    tau: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Pairs (id1 < id2) with n-gram-shingle Jaccard >= tau.

    Plan: postings -> (optional stop-shingle prune at document frequency >
    max_doc_freq, the skew guard at scale) -> self equi-join on shingle ->
    count common -> join per-doc set sizes -> Jaccard filter. Jaccard uses
    FULL set sizes even when pruning candidates, so pruning only affects
    recall of candidate generation, never the reported score.
    """
    post = _distinct_shingles(_spread(df, id_col), n, text_col, id_col).cache()
    sizes = post.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    cand_post = post
    if max_doc_freq is not None:
        hot = (
            post.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("s")
        )
        cand_post = post.join(F.broadcast(hot), "s", "left_anti")
    a, b = cand_post.alias("a"), cand_post.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1 = sizes.select(F.col("_id").alias("id1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("_id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        common.join(s1, "id1").join(s2, "id2")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("n1") + F.col("n2") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= tau)
        .select("id1", "id2", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    n: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    tau: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified with exact Jaccard.

    rows_per_band = num_hashes / bands. Candidates = pairs agreeing on all
    rows of >= 1 band (join on (band_idx, band_hash) — one shuffle keyed by
    band content). Verification recomputes true Jaccard from the postings, so
    output pairs are exact — LSH affects recall only.
    """
    assert num_hashes % bands == 0
    # cache: the shingle set feeds BOTH the signature/banding path and the
    # exact-Jaccard verify path — without it shingling runs twice.
    # Filter AFTER the cache boundary: pushed down, the size(_sh) predicate
    # re-inlines the whole shingle expression below the exchange and runs it
    # on the single pre-shuffle input task (measured 8.8 s vs 3 s at sf0.1).
    toks = _shingled(_spread(df, id_col), n, text_col, id_col).cache()
    toks = toks.filter(F.size("_sh") > 0)
    band_rows = _band_rows(toks, num_hashes, bands)
    a, b_ = band_rows.alias("a"), band_rows.alias("b")
    cands = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .distinct()
    )
    # exact-Jaccard verify on candidates only
    post = toks.select("_id", F.explode("_sh").alias("s")).distinct()
    return _jaccard_verify(cands, post, tau)


def _band_rows(toks: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(_id, band, bh) banded-signature rows from (_id, _sh) shingle sets.

    Signatures depend only on the document's own shingles (fixed salted-md5
    hash family), so band rows are corpus-independent — the property the
    incremental path (operators/incremental.py) relies on: bands computed
    for a new batch are bit-identical to what a full recompute would emit.
    """
    r = num_hashes // bands
    # cache: sig feeds both sides of the band self-join through an explode —
    # uncached, the minhash transforms recompute per side and per band.
    sig = toks.select(
        "_id", minhash_signature(F.col("_sh"), num_hashes).alias("sig")
    ).cache()
    return sig.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws(",", *[F.col("sig")[b * r + j] for j in range(r)])).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bh")


def _jaccard_verify(cands: DataFrame, post: DataFrame, tau: float) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against shingle
    postings: (id1, id2, jaccard) for pairs with jaccard >= tau. Jaccard
    uses FULL per-doc set sizes, so candidate pruning upstream affects
    recall only, never the reported score."""
    sizes = post.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pa, pb = post.alias("pa"), post.alias("pb")
    common = (
        cands.join(pa, F.col("pa._id") == F.col("id1"))
        .join(pb, (F.col("pb._id") == F.col("id2")) & (F.col("pa.s") == F.col("pb.s")))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1 = sizes.select(F.col("_id").alias("id1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("_id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        common.join(s1, "id1").join(s2, "id2")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("n1") + F.col("n2") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= tau)
        .select("id1", "id2", "jaccard")
    )


def simhash_pairs(
    df: DataFrame,
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by 32-bit simhash hamming distance <= max_hamming.

    Banding: 4 byte-bands; pigeonhole guarantees any pair with hamming <= 3
    shares at least one unchanged byte, so the band join has full recall for
    the default threshold (requires max_hamming < 4)."""
    assert max_hamming < 4, "byte-banding recall guarantee needs hamming < bands"
    # Two projections (hash once, then 32 bit-votes) + cache: sh feeds both
    # sides of the band self-join through an explode — inlined/uncached the
    # md5 hashing reruns up to 8x (2 sides x 4 bands).
    sh = (
        _spread(df, id_col)
        .select(F.col(id_col).alias("_id"), token_hashes(tokens(F.col(text_col))).alias("_h"))
        .select("_id", simhash_from_hashes(F.col("_h")).alias("sh"))
        .cache()
    )
    band_rows = sh.select(
        "_id", "sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("sh"), 8 * b).bitwiseAND(F.lit(0xFF)).alias("bv"),
                )
                for b in range(4)
            ])
        ).alias("bb"),
    ).select("_id", "sh", "bb.band", "bb.bv")
    a, b_ = band_rows.alias("a"), band_rows.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    *,
    tau: float = 0.4,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    score_decimals: int | None = 6,
) -> DataFrame:
    """Exact cosine-threshold pair join (id1 < id2, cos >= tau).

    This is the O(N²) oracle-parity variant — correct at any N but quadratic;
    the scale path is ``embedding_neardup_pairs_lsh`` which buckets first."""
    from ..functions.vector import dot, l2_norm

    # Norms are precomputed once per row and cached: inlined, every one of
    # the N^2/2 pairs would recompute both norms (3x the flops), and the
    # nested-loop join would stream a single input partition on one core.
    # The formula stays dot/(n1*n2) with the zero-norm guard — bitwise the
    # oracle's _DUCK_COS, just with the norm subexpressions hoisted.
    rows = (
        df.filter(F.col(embedding_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.col(embedding_col).alias("_e"),
            l2_norm(F.col(embedding_col)).alias("_n"),
        )
        .repartition(F.col("_id"))
        .cache()
    )
    a, b = rows.alias("a"), rows.alias("b")
    cos = F.when(
        (F.col("a._n") == 0.0) | (F.col("b._n") == 0.0), F.lit(0.0)
    ).otherwise(dot(F.col("a._e"), F.col("b._e")) / (F.col("a._n") * F.col("b._n")))
    if score_decimals is not None:
        cos = F.round(cos, score_decimals)
    return (
        a.join(b, F.col("a._id") < F.col("b._id"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= tau)
        .select(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"), "cosine")
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    planes: list[list[list[float]]],
    *,
    tau: float = 0.4,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    native: bool = False,
) -> DataFrame:
    """Scale path: candidates = pairs sharing an LSH bucket in >= 1 table
    (shuffle keyed by (table, code) — sub-quadratic), then exact cosine
    verify. Recall < 1 by construction; measured against the exact variant in
    tests."""
    from ..functions.lsh import bucket_codes_native, bucket_codes_pandas

    codes = (
        bucket_codes_native(embedding_col, planes) if native
        else bucket_codes_pandas(planes, embedding_col)
    )
    # posexplode the codes expression directly — materializing via withColumn
    # first makes Catalyst re-inline it into both the Generate input and the
    # outer project, evaluating the hash twice per row (see lsh_topk_batch).
    coded = df.filter(F.col(embedding_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(embedding_col).alias("_e"),
        F.posexplode(codes).alias("table_id", "code"),
    )
    a, b = coded.alias("a"), coded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.col("a._e").alias("_e1"),
            F.col("b._e").alias("_e2"),
        )
        .dropDuplicates(["id1", "id2"])
        .withColumn("cosine", F.round(cosine_similarity(F.col("_e1"), F.col("_e2")), 6))
        .filter(F.col("cosine") >= tau)
        .select("id1", "id2", "cosine")
    )
