"""Multi-stage query pipeline — the batch analog of the reference's Temporal
``QueryWorkflow`` (``app/temporal_workflows/query_workflow.py:277-340``;
SURVEY.md §3.2). Stages mirror the activity sequence:

  validate (:294-298, activity :171-195)
  -> embed iff text and no vector (:300-307, activity :198-208)
  -> search (:309-322, activity :211-245)
  -> rerank — identity placeholder hook (:324-329, activity :248-259;
     results flagged ``"reranked": True`` regardless, interactive analog
     :351-356) with a post-rerank trim to k (T4, interactive :346-349).

Where Temporal gives durability via activity retries + event history, the
Spark-native analog is **checkpointed stage outputs**: ``DurableQueryPipeline``
persists each stage's result (JSON for scalars, parquet for hits) and a rerun
resumes from the last completed stage (ST6: "batch job with checkpointed
intermediate tables; retries = job restart reading checkpoints"). At scale
those checkpoints are Delta tables and the restart is the cluster scheduler's
retry — no orchestrator required.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame

from ..engine import SearchEngine

Reranker = Callable[[DataFrame], DataFrame]

_VALID_INDEXES = {"brute", "lsh"}  # validate_query_activity (:188-190)


@dataclass
class QueryRequest:
    """Mirror of the reference's QueryRequest dataclass
    (query_workflow.py:19-29)."""

    library_id: str
    query_text: str | None = None
    query_embedding: list[float] | None = None
    k: int = 5
    index: str = "brute"
    lsh_tables: int = 8
    lsh_planes: int = 12
    filters: dict[str, Any] | None = None


@dataclass
class QueryResponse:
    """Mirror of QueryResponse (query_workflow.py:32-38): hits + index +
    library_version + per-stage metadata."""

    hits: DataFrame
    index: str
    index_used: str | None
    library_version: int
    metadata: dict[str, Any] = field(default_factory=dict)


def validate_request(req: QueryRequest) -> None:
    """validate_query_activity (query_workflow.py:171-195): require a query
    text or vector, positive k, and a known index name."""
    if req.query_text is None and req.query_embedding is None:
        raise ValueError("query_text or query_embedding required")
    if req.k <= 0:
        raise ValueError("k must be positive")
    if req.index not in _VALID_INDEXES:
        raise ValueError(f"index must be one of {sorted(_VALID_INDEXES)}")


class QueryPipeline:
    """validate -> embed -> search -> rerank as composable stages with an
    identity rerank hook (X2)."""

    def __init__(self, engine: SearchEngine, reranker: Reranker | None = None) -> None:
        self.engine = engine
        self.reranker = reranker  # None -> identity (query_workflow.py:248-259)

    # Stage 2: generate_embedding (:198-208) — only when text and no vector.
    def _embed(self, req: QueryRequest) -> tuple[list[float] | None, bool]:
        if req.query_embedding is not None or req.query_text is None:
            return req.query_embedding, False
        provider = self.engine.store.provider
        vec = provider.embed_text(req.query_text, self.engine.store.default_dim)
        return [float(x) for x in vec], True

    def run(self, req: QueryRequest) -> QueryResponse:
        validate_request(req)
        qvec, generated = self._embed(req)
        result = self.engine.search(
            req.library_id,
            query_embedding=qvec,
            query_text=None if qvec is not None else req.query_text,
            k=req.k,
            index=req.index,
            lsh_tables=req.lsh_tables,
            lsh_planes=req.lsh_planes,
            filters=req.filters,
        )
        hits = result.hits
        if self.reranker is not None:
            hits = self.reranker(hits)
        hits = hits.limit(req.k)  # T4 trim (interactive_workflow.py:346-349)
        return QueryResponse(
            hits=hits,
            index=result.index,
            index_used=result.index_used,
            library_version=result.library_version,
            metadata={
                "validation": "passed",
                "embedding_generated": generated,
                "reranked": True,  # flagged regardless (interactive :351-356)
            },
        )


class DurableQueryPipeline(QueryPipeline):
    """Checkpointed variant (ST6). Each stage writes its output under
    ``checkpoint_dir``; a rerun skips stages whose checkpoint exists.
    ``executed`` records which stages actually ran — the observability hook
    resume tests assert on."""

    def __init__(
        self,
        engine: SearchEngine,
        checkpoint_dir: str,
        reranker: Reranker | None = None,
    ) -> None:
        super().__init__(engine, reranker)
        self.dir = checkpoint_dir
        self.executed: list[str] = []
        os.makedirs(checkpoint_dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.dir, stage)

    def _done(self, stage: str) -> bool:
        p = self._path(stage)
        return os.path.exists(p + ".json") or os.path.exists(
            os.path.join(p, "_SUCCESS")
        )

    def _put_json(self, stage: str, payload: dict) -> None:
        tmp = self._path(stage) + ".json.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._path(stage) + ".json")

    def _get_json(self, stage: str) -> dict:
        with open(self._path(stage) + ".json") as f:
            return json.load(f)

    def run(self, req: QueryRequest) -> QueryResponse:
        spark = self.engine.store.spark

        if not self._done("validate"):
            validate_request(req)
            self._put_json("validate", {"request": asdict(req), "validation": "passed"})
            self.executed.append("validate")

        if not self._done("embed"):
            qvec, generated = self._embed(req)
            self._put_json("embed", {"query_embedding": qvec, "generated": generated})
            self.executed.append("embed")
        emb = self._get_json("embed")
        qvec, generated = emb["query_embedding"], emb["generated"]

        if not self._done("search"):
            result = self.engine.search(
                req.library_id,
                query_embedding=qvec,
                query_text=None if qvec is not None else req.query_text,
                k=req.k,
                index=req.index,
                lsh_tables=req.lsh_tables,
                lsh_planes=req.lsh_planes,
                filters=req.filters,
            )
            result.hits.write.mode("overwrite").parquet(self._path("search"))
            self._put_json(
                "search_meta",
                {
                    "index": result.index,
                    "index_used": result.index_used,
                    "library_version": result.library_version,
                },
            )
            self.executed.append("search")
        meta = self._get_json("search_meta")
        hits = spark.read.parquet(self._path("search"))

        if not self._done("rerank"):
            reranked = self.reranker(hits) if self.reranker is not None else hits
            reranked.limit(req.k).write.mode("overwrite").parquet(self._path("rerank"))
            self.executed.append("rerank")
        final = spark.read.parquet(self._path("rerank"))

        return QueryResponse(
            hits=final,
            index=meta["index"],
            index_used=meta["index_used"],
            library_version=meta["library_version"],
            metadata={
                "validation": "passed",
                "embedding_generated": generated,
                "reranked": True,
            },
        )
