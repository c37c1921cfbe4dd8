"""Behavioral tests for dedup operators beyond the oracle gate: salt
independence of minhash, LSH-vs-exact recall for embedding near-dup, and
planted-duplicate detection in the fixture corpus."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_db_mvp_spark.functions.lsh import generate_planes
from vector_db_mvp_spark.functions.text import (
    minhash_signature_from_md5s,
    shingle_md5s,
    shingles,
    tokens,
)
from vector_db_mvp_spark.operators.dedup import (
    embedding_neardup_pairs,
    embedding_neardup_pairs_lsh,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from vector_db_mvp_spark.sources.testdata import load_table


def test_minhash_salts_are_independent(spark, sf_dir):
    """Regression for the binary-lambda index bug: the k signature entries
    must not be all identical (distinct hash functions per slot)."""
    docs = load_table(spark, sf_dir, "documents").limit(20)
    sig = docs.select(
        minhash_signature_from_md5s(
            shingle_md5s(shingles(tokens(F.col("text")), 5)), 8
        ).alias("sig")
    )
    rows = sig.collect()
    distinct_counts = [len(set(r["sig"])) for r in rows]
    assert all(c > 1 for c in distinct_counts), distinct_counts


def test_jaccard_finds_planted_neardups(spark, sf_dir):
    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=5, tau=0.6
    ).collect()
    assert len(pairs) >= 10  # fixture plants ~25 near-dup pairs
    assert all(p["jaccard"] >= 0.6 for p in pairs)


def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    """MinHash-LSH candidates, verified with true Jaccard, must recover
    (almost) all truly-similar pairs: banded 16/4 has >99% recall at
    jaccard >= 0.8."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(docs, n=5, tau=0.8).collect()
    }
    approx = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_pairs(docs, n=5, num_hashes=16, bands=4, tau=0.8).collect()
    }
    assert approx <= exact  # verify step guarantees no false positives
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.8, (recall, exact - approx)


def test_stop_shingle_pruning_guards_skew_without_changing_scores(spark):
    """max_doc_freq drops hot shingles from CANDIDATE generation (the skew
    guard: a shingle shared by k docs costs k^2 join rows) but Jaccard is
    still computed over FULL shingle sets — pruning may lose pairs held
    together only by hot shingles, never report a wrong score."""
    rows = [
        (0, "common common common common common alpha beta gamma delta one"),
        (1, "common common common common common alpha beta gamma delta two"),
        (2, "unrelated words entirely different text here for this doc yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=3, tau=0.1).collect()
    }
    pruned = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=3, tau=0.1, max_doc_freq=1).collect()
    }
    assert (0, 1) in full
    # pruning only shrinks the candidate set; surviving scores identical
    assert set(pruned) <= set(full)
    for k, v in pruned.items():
        assert v == full[k]


def _pruned_score_fixture(spark):
    """Four docs where shingle 'x y z' is hot (df=4, pruned at
    max_doc_freq=3) while pair (0,1) ALSO shares low-df shingles, so the
    pair survives pruning as a candidate but loses one common shingle from
    the pruned postings. Counting common from pruned postings (the ADVICE
    r7 flaw) undercounts (0,1)'s score; exact recount from full postings
    must not."""
    rows = [
        (0, "x y z a b c d e f g"),
        (1, "x y z a b c d e q r"),
        (2, "x y z completely different tokens over here now okay fine"),
        (3, "x y z other words that differ entirely from previous docs"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pruned_jaccard_scores_exact_for_surviving_pairs(spark):
    df = _pruned_score_fixture(spark)
    full = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=3, tau=0.05).collect()
    }
    pruned = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=3, tau=0.05, max_doc_freq=3).collect()
    }
    assert (0, 1) in pruned  # non-vacuous: the pair survives the prune
    assert set(pruned) <= set(full)
    for k, v in pruned.items():
        assert v == full[k], (k, v, full[k])


def test_pruned_containment_scores_exact_for_surviving_pairs(spark):
    from vector_db_mvp_spark.operators.dedup import ngram_containment_pairs

    df = _pruned_score_fixture(spark)
    full = {
        (r["id1"], r["id2"]): r["containment"]
        for r in ngram_containment_pairs(df, n=3, tau=0.05).collect()
    }
    pruned = {
        (r["id1"], r["id2"]): r["containment"]
        for r in ngram_containment_pairs(df, n=3, tau=0.05, max_doc_freq=3).collect()
    }
    assert (0, 1) in pruned
    assert set(pruned) <= set(full)
    for k, v in pruned.items():
        assert v == full[k], (k, v, full[k])


def test_prefix_filter_is_lossless(spark, sf_dir):
    """prefix_filter_jaccard_pairs must reproduce the brute-force join
    EXACTLY at every tau — the prefix prune is provably complete, so
    unlike MinHash banding there is no recall slack to tolerate."""
    from vector_db_mvp_spark.operators.dedup import prefix_filter_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    for tau in (0.3, 0.6, 0.9):
        exact = {
            (r["id1"], r["id2"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, n=5, tau=tau).collect()
        }
        pf = {
            (r["id1"], r["id2"]): r["jaccard"]
            for r in prefix_filter_jaccard_pairs(docs, n=5, tau=tau).collect()
        }
        assert pf == exact, (tau, set(exact) ^ set(pf))


def test_embedding_lsh_pairs_subset_of_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id1"], r["id2"]): r["cosine"]
        for r in embedding_neardup_pairs(emb, tau=0.3).collect()
    }
    planes = generate_planes(64, 8, 4, seed=42)
    approx = {
        (r["id1"], r["id2"]): r["cosine"]
        for r in embedding_neardup_pairs_lsh(emb, planes, tau=0.3).collect()
    }
    assert set(approx) <= set(exact)
    for k, v in approx.items():
        assert abs(v - exact[k]) < 1e-9


def test_simhash_exploded_agg_matches_expression_form(spark, sf_dir):
    """The operator computes simhash as exploded groupBy bit-vote sums (for
    whole-stage codegen); functions/text.py keeps the array-expression form
    that the DuckDB oracle (sql_simhash) mirrors. They must agree code-for-
    code — this is the bridge that keeps the oracle honest."""
    from vector_db_mvp_spark.functions.text import (
        SIMHASH_BITS,
        h64,
        simhash_from_hashes,
        token_hashes,
    )
    from vector_db_mvp_spark.operators.dedup import _spread_tokens

    docs = load_table(spark, sf_dir, "documents").limit(40)
    expr_form = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id",
            simhash_from_hashes(token_hashes(tokens(F.col("text")))).alias("sh"),
        ).collect()
    }
    tok_hashes = (
        _spread_tokens(docs, "text", "doc_id")
        .select("_id", F.explode("_t").alias("_tok"))
        .select("_id", h64(F.col("_tok")).alias("_h"))
    )
    votes = tok_hashes.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"_v{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    code = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"_v{i}") >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        code = term if code is None else code + term
    agg_form = {r["_id"]: r["sh"] for r in votes.select("_id", code.alias("sh")).collect()}
    assert agg_form == expr_form


def test_weighted_prefix_filter_is_lossless(spark, sf_dir):
    """weighted_jaccard_pairs' weighted prefix prune must reproduce the
    brute-force weighted join EXACTLY at every tau — same completeness
    contract as the unweighted prefix filter. The brute reference is the
    operator with the prefix stage bypassed (all postings as candidates)."""
    from pyspark.sql import functions as F

    from vector_db_mvp_spark.operators.dedup import (
        _distinct_shingles,
        _spread_tokens,
        weighted_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    post = _distinct_shingles(_spread_tokens(docs, "text", "doc_id"), 5)
    nd = post.agg(F.countDistinct("_id").alias("_nd"))
    wts = (
        post.groupBy("s").agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(nd))
        .select(
            "s",
            (F.floor(F.log(F.col("_nd") / F.col("_df")) * 1e6) + 1)
            .cast("long")
            .alias("_w"),
        )
    )
    wpost = post.join(wts, "s")
    tot = wpost.groupBy("_id").agg(F.sum("_w").alias("_wtot"))
    a, b = wpost.alias("a"), wpost.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .agg(F.sum("a._w").alias("_wi"))
    )
    t1 = tot.select(F.col("_id").alias("id1"), F.col("_wtot").alias("_w1"))
    t2 = tot.select(F.col("_id").alias("id2"), F.col("_wtot").alias("_w2"))
    scored = (
        inter.join(t1, "id1").join(t2, "id2")
        .withColumn(
            "wjaccard",
            F.round(F.col("_wi") / (F.col("_w1") + F.col("_w2") - F.col("_wi")), 6),
        )
    )
    for tau in (0.3, 0.6, 0.9):
        exact = {
            (r["id1"], r["id2"]): r["wjaccard"]
            for r in scored.filter(F.col("wjaccard") >= tau).collect()
        }
        pf = {
            (r["id1"], r["id2"]): r["wjaccard"]
            for r in weighted_jaccard_pairs(docs, n=5, tau=tau).collect()
        }
        assert pf == exact, (tau, set(exact) ^ set(pf))


def test_km_slots_not_degenerate(spark):
    """The round-11 hash-family fix (functions/text.py): with the old
    40-bit h2, ONE shingle minimized h1 + i*h2 for every slot i, so the
    16 signature slots agreed all-or-nothing between any two documents
    and the banding knob was void. Pin the repaired behavior: on docs
    with partial overlap, some pair must agree on a strict subset of
    slots (0 < k < 16)."""
    import random

    from pyspark.sql import functions as F

    from vector_db_mvp_spark.operators.dedup import (
        _km_hash_cols,
        _shingle_digests,
        _spread_tokens,
    )

    rng = random.Random(3)
    vocab = [f"w{j}" for j in range(60)]
    rows = [
        (i, " ".join(rng.sample(vocab, 30))) for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    post = _shingle_digests(_spread_tokens(docs, "text", "doc_id"), 1)
    sig = post.groupBy("_id").agg(
        *[
            F.min(h).alias(f"s{i}")
            for i, h in enumerate(_km_hash_cols(F.col("m"), 16))
        ]
    )
    a, b = sig.alias("a"), sig.alias("b")
    agree = sum(
        F.when(F.col(f"a.s{i}") == F.col(f"b.s{i}"), 1).otherwise(0)
        for i in range(16)
    )
    ks = {
        r.k
        for r in a.join(b, F.col("a._id") < F.col("b._id"))
        .select(agree.alias("k"))
        .distinct()
        .collect()
    }
    assert any(0 < k < 16 for k in ks), (
        f"slot agreement is all-or-nothing again (observed {sorted(ks)}) — "
        "the KM family has re-degenerated"
    )


def test_minhash_banding_recall_monotone(spark, sf_dir):
    """More rows per band => stricter candidate test => recall cannot
    rise. The registered quality instrument relies on this shape."""
    from vector_db_mvp_spark.operators.dedup import (
        minhash_candidates,
        ngram_jaccard_pairs,
    )
    from vector_db_mvp_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    truth = (
        ngram_jaccard_pairs(docs, n=5, tau=0.4)
        .select("id1", "id2")
        .localCheckpoint(eager=True)
    )
    hits = []
    for bands in (8, 4, 2):  # rows/band 2, 4, 8
        c = minhash_candidates(docs, n=5, num_hashes=16, bands=bands)
        hits.append(c.join(truth, ["id1", "id2"], "left_semi").count())
    assert hits[0] >= hits[1] >= hits[2]
