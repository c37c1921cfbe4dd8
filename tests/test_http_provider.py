"""HttpEmbeddingProvider contract parity with the reference Cohere adapter
(``app/adapters/embedding_providers/cohere_provider.py``), exercised through
a mocked transport — no network, no real endpoint."""

from __future__ import annotations

import json
import socket

import pytest

from vector_db_mvp_spark.embedding.provider import HttpEmbeddingProvider
from vector_db_mvp_spark.storage.store import EntityStore


def _ok_transport(vec):
    calls = []

    def send(url, headers, body, timeout):
        calls.append({"url": url, "headers": headers,
                      "body": json.loads(body), "timeout": timeout})
        return 200, json.dumps({"embeddings": [vec]}).encode()

    send.calls = calls
    return send


def test_request_shape_and_unused_dim():
    """The reference posts {texts, model, input_type} with a 10 s timeout and
    returns the endpoint's full vector no matter what ``dim`` was asked for
    (cohere_provider.py:10,12,29)."""
    send = _ok_transport([0.1, 0.2, 0.3, 0.4, 0.5])
    prov = HttpEmbeddingProvider(api_key="k", transport=send)
    out = prov.embed_text("hello", dim=2)
    assert out == [0.1, 0.2, 0.3, 0.4, 0.5]  # dim=2 ignored: full vector back
    call = send.calls[0]
    assert call["timeout"] == 10.0
    assert call["body"] == {"texts": ["hello"], "model": "embed-english-v3.0",
                            "input_type": "search_document"}
    assert call["headers"]["Authorization"] == "Bearer k"


def test_missing_key_and_http_error():
    with pytest.raises(ValueError):
        HttpEmbeddingProvider(api_key=None, transport=_ok_transport([1.0])).embed_text("x")
    err = HttpEmbeddingProvider(
        api_key="k", transport=lambda *a: (500, b"boom")
    )
    with pytest.raises(RuntimeError):
        err.embed_text("x")


def test_timeout_swallowed_through_update_chunk(spark, tmp_path):
    """S8 parity via the HTTP provider: a text update that triggers re-embed
    hits a timing-out endpoint -> failure is swallowed, old embedding kept
    (chunk_service.py:43-45)."""

    def timing_out(url, headers, body, timeout):
        raise socket.timeout(f"timed out after {timeout}s")

    store = EntityStore(
        spark, str(tmp_path / "s"),
        embedding_provider=HttpEmbeddingProvider(api_key="k", transport=timing_out),
        default_dim=2,
    )
    lib = store.create_library("l")
    doc = store.add_document(lib, "d")
    cid = store.add_chunk(lib, doc, "old text", [1.0, 0.0])

    store.update_chunk(lib, cid, text="new text", reembed_if_needed=True)
    row = store.get_chunk(lib, cid)
    assert row["text"] == "new text"
    assert list(row["embedding"]) == [1.0, 0.0]  # old embedding survives


def test_success_through_update_chunk(spark, tmp_path):
    store = EntityStore(
        spark, str(tmp_path / "s2"),
        embedding_provider=HttpEmbeddingProvider(
            api_key="k", transport=_ok_transport([0.5, 0.5])
        ),
        default_dim=2,
    )
    lib = store.create_library("l")
    doc = store.add_document(lib, "d")
    cid = store.add_chunk(lib, doc, "old", [1.0, 0.0])
    store.update_chunk(lib, cid, text="fresh", reembed_if_needed=True)
    assert list(store.get_chunk(lib, cid)["embedding"]) == [0.5, 0.5]
