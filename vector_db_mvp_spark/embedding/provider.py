"""Embedding provider surface (reference X1,
``app/adapters/embedding_providers/cohere_provider.py:6-29``).

The reference calls the Cohere REST API per text with a 10 s timeout and a
``dim`` parameter that is accepted but unused. Our engine keeps the same
pluggable-provider shape but treats embedding as a *batch* operation: an
Arrow-batched pandas UDF maps a text column to an embedding column, so at
100 TB embedding is an offline job writing an embeddings table, never a
per-row HTTP call inside a query (SURVEY.md §2.1 S4 scale note).

``HashEmbeddingProvider`` is the deterministic, network-free test provider:
text -> seeded RNG -> unit vector. Same text, same dim -> same vector, on any
executor, with no dependency beyond numpy.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Protocol

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


class EmbeddingProvider(Protocol):
    """Scalar provider protocol, signature-compatible with the reference
    (``embed_text(text, dim) -> list[float]``; reference ignores ``dim``,
    ours honors it)."""

    def embed_text(self, text: str, dim: int = 384) -> list[float]: ...


class HashEmbeddingProvider:
    """Deterministic text->vector: sha256(text) seeds a PCG64 stream drawn as
    N(0,1), L2-normalized. Collision-free enough for tests, stable forever."""

    def embed_text(self, text: str, dim: int = 384) -> list[float]:
        seed = int.from_bytes(hashlib.sha256(text.encode("utf-8")).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(dim)
        n = float(np.linalg.norm(v))
        if n != 0.0:
            v = v / n
        return [float(x) for x in v]


class FailingEmbeddingProvider:
    """Test double for the reference's swallow-on-failure re-embed path
    (``app/services/chunk_service.py:43-45``)."""

    def embed_text(self, text: str, dim: int = 384) -> list[float]:
        raise RuntimeError("embedding provider unavailable")


class HttpEmbeddingProvider:
    """REST text->vector adapter matching the reference Cohere provider
    shape (``cohere_provider.py:12-29``): POST ``{"texts": [text], "model":
    ..., "input_type": "search_document"}``, 10 s timeout (``:10``), missing
    API key -> ValueError (``:14-15``), non-2xx -> error (``raise_for_status``
    analog), and ``dim`` accepted but UNUSED — the endpoint's full dimension
    is returned as-is (``:12,29``).

    ``transport`` is an injectable callable ``(url, headers, body, timeout)
    -> (status, response_bytes)`` so the contract is testable without a
    network; the default uses stdlib urllib (no extra dependency). The
    provider holds no open connection, so it pickles cleanly into the
    pandas-UDF closure for batch embedding — though at scale embedding
    belongs in an offline job writing an embeddings table, not inline HTTP.
    """

    def __init__(
        self,
        url: str = "https://api.cohere.ai/v1/embed",
        api_key: str | None = None,
        model: str = "embed-english-v3.0",
        timeout: float = 10.0,
        transport=None,
    ) -> None:
        self.url = url
        self.api_key = api_key
        self.model = model
        self.timeout = timeout
        self.transport = transport

    def _urllib_transport(self, url, headers, body, timeout):
        import urllib.request

        req = urllib.request.Request(url, data=body, headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read()

    def embed_text(self, text: str, dim: int = 384) -> list[float]:
        import json

        if not self.api_key:
            raise ValueError("embedding API key not configured")
        body = json.dumps(
            {"texts": [text], "model": self.model, "input_type": "search_document"}
        ).encode("utf-8")
        headers = {
            "Authorization": f"Bearer {self.api_key}",
            "Content-Type": "application/json",
        }
        send = self.transport or self._urllib_transport
        status, payload = send(self.url, headers, body, self.timeout)
        if not 200 <= status < 300:
            raise RuntimeError(f"embedding endpoint returned {status}")
        return json.loads(payload)["embeddings"][0]  # dim intentionally unused


def embed_text_column(
    text: Column | str, dim: int = 384, provider: EmbeddingProvider | None = None
) -> Column:
    """Arrow-batched batch embedding of a text column. The provider instance
    is shipped by closure (must be picklable and executor-safe — true for
    HashEmbeddingProvider; an HTTP provider would hold per-executor clients).
    """
    prov = provider or HashEmbeddingProvider()

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield pd.Series(
                [None if t is None else prov.embed_text(t, dim) for t in s]
            )

    return _embed(F.col(text) if isinstance(text, str) else text)
