"""MLlib BRP-LSH ANN: cosine-compatibility on the unit sphere and recall
against exact brute force."""

from __future__ import annotations

import pytest

from vector_db_mvp_spark.operators.brp_lsh import brp_topk, build_brp_index
from vector_db_mvp_spark.operators.topk import topk_cosine
from vector_db_mvp_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_brp_recall_vs_brute(spark, emb):
    qv = [float(x) for x in emb.head()["embedding"]]
    exact = {r["vec_id"] for r in topk_cosine(emb, qv, 10).collect()}
    model, feat = build_brp_index(emb, bucket_length=2.0, num_hash_tables=4)
    approx = {r["vec_id"] for r in brp_topk(model, feat, qv, 10).collect()}
    # generous bucketLength on a small corpus -> near-exact; require >= 60%
    assert len(exact & approx) >= 6


def test_brp_score_is_cosine(spark, emb):
    """1 - d^2/2 on unit vectors must reproduce cosine similarity."""
    qv = [float(x) for x in emb.head()["embedding"]]
    model, feat = build_brp_index(emb, bucket_length=2.0, num_hash_tables=4)
    got = {r["vec_id"]: r["score"] for r in brp_topk(model, feat, qv, 5).collect()}
    want = {
        r["vec_id"]: r["score"]
        for r in topk_cosine(emb, qv, 200).collect()
        if r["vec_id"] in got
    }
    for vid, s in got.items():
        assert s == pytest.approx(want[vid], abs=1e-6)
