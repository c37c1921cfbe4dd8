"""MMR diversity re-ranking (operators/mmr.py): greedy semantics, lambda
extremes, determinism, and batch-path parity with the single-query path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.mmr import mmr_rerank, mmr_rerank_batch, mmr_select

DIM = 4
# hand-built pool: a and a2 nearly identical (redundant), b orthogonal
A = [1.0, 0.0, 0.0, 0.0]
A2 = [0.999, 0.01, 0.0, 0.0]
B = [0.0, 1.0, 0.0, 0.0]


def test_lambda_one_is_plain_topk():
    pool = [(1, 0.9, A), (2, 0.8, A2), (3, 0.5, B)]
    got = mmr_select(pool, 2, lam=1.0)
    assert [i for i, _, _ in got] == [1, 2]


def test_diversity_displaces_redundant_candidate():
    # relevance order is a > a2 > b, but a2 is ~a duplicate: with a
    # diversity weight the orthogonal b must take slot 2.
    pool = [(1, 0.9, A), (2, 0.8, A2), (3, 0.5, B)]
    got = mmr_select(pool, 2, lam=0.5)
    assert [i for i, _, _ in got] == [1, 3]


def test_rank_order_and_scores_monotonic_context():
    pool = [(1, 0.9, A), (2, 0.8, A2), (3, 0.5, B)]
    got = mmr_select(pool, 3, lam=0.5)
    assert [r for _, r, _ in got] == [0, 1, 2]
    # first pick's mmr is lam*rel
    assert got[0][2] == pytest.approx(0.45)


def test_tie_breaks_to_lowest_id():
    pool = [(9, 0.7, A), (4, 0.7, A)]
    got = mmr_select(pool, 1, lam=1.0)
    assert got[0][0] == 4


def test_k_larger_than_pool_returns_pool():
    pool = [(1, 0.9, A), (2, 0.5, B)]
    assert len(mmr_select(pool, 10, lam=0.7)) == 2


def test_dataframe_path_matches_pure_python(spark):
    rows = [(1, 3, 0.9, A), (2, 7, 0.8, A2), (3, 1, 0.5, B)]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, score double, embedding array<float>"
    ).select("vec_id", "label", "embedding", "score")
    out = {
        r["vec_id"]: (r["mmr_rank"], r["mmr_score"], r["label"])
        for r in mmr_rerank(df, 2, lam=0.5).collect()
    }
    # float32 storage: recompute expectation from the float32-rounded pool
    pool = [(r["vec_id"], r["score"], r["embedding"]) for r in df.collect()]
    want = mmr_select(pool, 2, lam=0.5)
    assert set(out) == {i for i, _, _ in want}
    for i, rank, val in want:
        assert out[i][0] == rank
        assert out[i][1] == pytest.approx(val)
    assert out[1][2] == 3  # passthrough columns preserved


def test_batch_path_matches_single(spark):
    # two queries with distinct pools; batch output per query == single path
    pools = {
        10: [(1, 0.9, A), (2, 0.8, A2), (3, 0.5, B)],
        20: [(5, 0.7, B), (6, 0.65, A), (7, 0.6, A2)],
    }
    rows = [
        (qid, i, rel, emb) for qid, pool in pools.items() for i, rel, emb in pool
    ]
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, score double, embedding array<float>"
    )
    got = {
        (r["query_id"], r["vec_id"]): (r["mmr_rank"], r["mmr_score"])
        for r in mmr_rerank_batch(df, 2, lam=0.5).collect()
    }
    for qid, pool in pools.items():
        f32pool = [
            (r["vec_id"], r["score"], r["embedding"])
            for r in df.filter(F.col("query_id") == qid).collect()
        ]
        for i, rank, val in mmr_select(f32pool, 2, lam=0.5):
            assert got[(qid, i)][0] == rank
            assert got[(qid, i)][1] == pytest.approx(val)
