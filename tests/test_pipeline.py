"""QueryWorkflow-analog pipeline (SURVEY.md §3.2): stage sequence, metadata
flags, rerank hook + trim, and checkpointed resume (ST6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.engine import SearchEngine
from vector_db_mvp_spark.plans.pipeline import (
    DurableQueryPipeline,
    QueryPipeline,
    QueryRequest,
)
from vector_db_mvp_spark.storage.store import EntityStore


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    store = EntityStore(spark, str(tmp_path_factory.mktemp("pipe") / "store"), default_dim=4)
    lib = store.create_library("lib")
    doc = store.add_document(lib, "doc", category="guide")
    store.add_chunk(lib, doc, "north", [1.0, 0.0, 0.0, 0.0], meta_type="heading")
    store.add_chunk(lib, doc, "east", [0.0, 1.0, 0.0, 0.0], meta_type="paragraph")
    store.add_chunk(lib, doc, "northeast", [1.0, 1.0, 0.0, 0.0], meta_type="paragraph")
    eng = SearchEngine(store)
    eng._lib = lib
    return eng


def test_pipeline_vector_query(engine):
    resp = QueryPipeline(engine).run(
        QueryRequest(engine._lib, query_embedding=[1.0, 0.0, 0.0, 0.0], k=2)
    )
    rows = resp.hits.collect()
    assert [r["text"] for r in rows] == ["north", "northeast"]
    assert resp.metadata == {
        "validation": "passed",
        "embedding_generated": False,
        "reranked": True,  # flagged even for the identity hook (:351-356)
    }
    assert resp.index_used == "brute"
    assert resp.library_version == engine.store.library_version(engine._lib)


def test_pipeline_text_query_embeds(engine):
    resp = QueryPipeline(engine).run(QueryRequest(engine._lib, query_text="north", k=1))
    assert resp.metadata["embedding_generated"] is True
    assert resp.hits.count() == 1


def test_pipeline_validation_errors(engine):
    with pytest.raises(ValueError, match="query_text or query_embedding"):
        QueryPipeline(engine).run(QueryRequest(engine._lib))
    with pytest.raises(ValueError, match="k must be positive"):
        QueryPipeline(engine).run(QueryRequest(engine._lib, query_text="x", k=0))
    with pytest.raises(ValueError, match="index must be"):
        QueryPipeline(engine).run(QueryRequest(engine._lib, query_text="x", index="hnsw"))


def test_pipeline_reranker_hook_and_trim(engine):
    """A real (non-identity) reranker runs between search and the T4 trim."""

    def reverse_rerank(hits):
        return hits.orderBy(F.asc("score"), F.asc("chunk_id"))

    resp = QueryPipeline(engine, reranker=reverse_rerank).run(
        QueryRequest(engine._lib, query_embedding=[1.0, 0.0, 0.0, 0.0], k=2)
    )
    rows = resp.hits.collect()
    assert len(rows) == 2  # trimmed to k after rerank (T4)
    assert rows[0]["score"] <= rows[1]["score"]  # rerank order survived


def test_durable_pipeline_resumes(engine, tmp_path):
    req = QueryRequest(engine._lib, query_text="north", k=2, index="brute")
    ckpt = str(tmp_path / "ckpt")

    p1 = DurableQueryPipeline(engine, ckpt)
    r1 = p1.run(req)
    assert p1.executed == ["validate", "embed", "search", "rerank"]
    want = [(r["chunk_id"], r["score"]) for r in r1.hits.orderBy(F.desc("score")).collect()]

    # restart: every stage checkpointed -> nothing recomputes, same result
    p2 = DurableQueryPipeline(engine, ckpt)
    r2 = p2.run(req)
    assert p2.executed == []
    got = [(r["chunk_id"], r["score"]) for r in r2.hits.orderBy(F.desc("score")).collect()]
    assert got == want
    assert r2.metadata["embedding_generated"] is True  # replayed from checkpoint
    assert r2.index_used == "brute"


def test_durable_pipeline_partial_resume(engine, tmp_path):
    """Losing a mid-pipeline checkpoint re-runs that stage and the ones after,
    not the ones before (the Temporal retry-from-failed-activity shape)."""
    import shutil

    req = QueryRequest(engine._lib, query_embedding=[0.0, 1.0, 0.0, 0.0], k=1)
    ckpt = str(tmp_path / "ckpt2")
    p1 = DurableQueryPipeline(engine, ckpt)
    p1.run(req)

    shutil.rmtree(f"{ckpt}/search")  # simulate failure after embed
    p2 = DurableQueryPipeline(engine, ckpt)
    p2.run(req)
    assert p2.executed == ["search"]  # rerank checkpoint still valid
