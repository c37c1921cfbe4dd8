"""BM25 keyword retrieval + RRF hybrid fusion (operators/bm25.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.bm25 import (
    bm25_scores,
    bm25_topk,
    rrf_fuse,
    with_rank,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark joins data with hash joins"),
        (2, "hash hash hash hash hash hash hash hash"),
        (3, "streams and windows only"),
        (4, "a very long document about many things none of them relevant " * 5),
        (5, "hash spark"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scores_only_matching_docs(corpus):
    out = bm25_scores(corpus, ["hash"]).collect()
    ids = {r.doc_id for r in out}
    assert ids == {1, 2, 5}  # docs 3/4 contain no query term
    assert all(r.score > 0 for r in out)


def test_tf_saturation(corpus):
    """BM25 tf saturates: 8 occurrences in a short doc must not score 8x
    a single occurrence (k1 bounds the tf term)."""
    s = {r.doc_id: r.score for r in bm25_scores(corpus, ["hash"]).collect()}
    assert s[2] > s[5] > 0
    assert s[2] < 8 * s[5]


def test_shorter_doc_wins_at_equal_tf(corpus):
    """Length normalization: same tf=1, shorter doc scores higher."""
    s = {r.doc_id: r.score for r in bm25_scores(corpus, ["spark"]).collect()}
    assert s[5] > s[1]


def test_idf_is_lucene_nonnegative(spark):
    """Term present in EVERY doc keeps a positive (not negative) idf:
    ln(1 + (N - df + .5)/(df + .5)) > 0 always."""
    df = spark.createDataFrame(
        [(i, "common filler") for i in range(4)], "doc_id long, text string"
    )
    out = bm25_scores(df, ["common"]).collect()
    assert len(out) == 4 and all(r.score > 0 for r in out)


def test_topk_order_and_ties(corpus):
    out = bm25_topk(corpus, ["hash", "spark"], 3).collect()
    assert len(out) == 3
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_empty_terms_rejected(corpus):
    with pytest.raises(ValueError):
        bm25_scores(corpus, [])


def test_rrf_fusion_math(spark):
    left = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    right = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    out = {
        r.doc_id: r.rrf_score
        for r in rrf_fuse(left, right, id_col="doc_id", k=10).collect()
    }
    # doc 2 appears in both lists -> sum of both reciprocal ranks.
    assert out[2] == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert out[1] == pytest.approx(1 / 61, abs=1e-6)
    assert out[3] == pytest.approx(1 / 62, abs=1e-6)
    assert max(out, key=lambda d: (out[d], -d)) == 2


def test_with_rank_is_dense_1_based(spark):
    df = spark.createDataFrame([(1, 0.5), (2, 0.9)], "doc_id long, score double")
    ranked = with_rank(df, [F.col("score").desc(), F.col("doc_id").asc()])
    got = {r.doc_id: r.rank for r in ranked.collect()}
    assert got == {2: 1, 1: 2}


def test_scores_match_reference_formula(corpus):
    """Pin the exact Okapi/Lucene formula for one (doc, term) pair."""
    s = {r.doc_id: r.score for r in bm25_scores(corpus, ["streams"]).collect()}
    # corpus stats computed by hand: N=5, df(streams)=1, doc 3 dl=4.
    dls = [6.0, 8.0, 4.0, 55.0, 2.0]
    avgdl = sum(dls) / 5
    idf = math.log(1 + (5 - 1 + 0.5) / (1 + 0.5))
    k1, b = 1.2, 0.75
    tfterm = (1 * (k1 + 1)) / (1 + k1 * (1 - b + b * 4.0 / avgdl))
    assert s[3] == pytest.approx(idf * tfterm, abs=1e-6)


def test_batch_matches_single_query(corpus):
    """bm25_topk_batch must reproduce bm25_topk exactly per query."""
    from vector_db_mvp_spark.operators.bm25 import bm25_topk_batch

    queries = {"qa": ["hash", "spark"], "qb": ["streams"]}
    batch = bm25_topk_batch(corpus, queries, 3).collect()
    for qid, terms in queries.items():
        single = bm25_topk(corpus, terms, 3).collect()
        got = [
            (r.doc_id, r.score)
            for r in sorted(
                (r for r in batch if r.query_id == qid), key=lambda r: r.rank
            )
        ]
        want = [(r.doc_id, r.score) for r in single]
        assert got == want, qid


def test_batch_rejects_empty(corpus):
    from vector_db_mvp_spark.operators.bm25 import bm25_topk_batch

    with pytest.raises(ValueError):
        bm25_topk_batch(corpus, {}, 3)
    with pytest.raises(ValueError):
        bm25_topk_batch(corpus, {"q": []}, 3)


def test_oracle_sql_escapes_quoted_terms():
    """A term carrying a single quote must not break or alter the generated
    DuckDB SQL (quote-escape injection)."""
    import duckdb

    from vector_db_mvp_spark.operators.bm25 import (
        sql_bm25_scores,
        sql_bm25_topk_batch,
    )

    sql = sql_bm25_scores(
        ["o'brien", "x"], table="d", toks_expr="string_split(text, ' ')"
    )
    assert "'o''brien'" in sql
    batch_sql = sql_bm25_topk_batch(
        {"q'1": ["o'brien"]}, 3, table="d", toks_expr="string_split(text, ' ')"
    )
    assert "'q''1'" in batch_sql and "'o''brien'" in batch_sql
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT 1 AS doc_id, 'o''brien x y' AS text")
    assert con.execute(sql).fetchall()[0][0] == 1  # parses and matches
    rows = con.execute(batch_sql).fetchall()
    assert rows and rows[0][0] == "q'1"
