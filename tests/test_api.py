"""Endpoint-facade tests mirroring the reference's endpoint-level CRUD suite
(``tests/test_crud.py`` there: lifecycle + 404/400 per entity) against the
Spark-backed VectorDbApi."""

from __future__ import annotations

import pytest

from vector_db_mvp_spark.api import ApiError, VectorDbApi
from vector_db_mvp_spark.engine import SearchEngine
from vector_db_mvp_spark.storage.store import EntityStore


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    store = EntityStore(spark, str(tmp_path_factory.mktemp("api") / "store"), default_dim=4)
    return VectorDbApi(SearchEngine(store))


def _status(excinfo) -> int:
    return excinfo.value.status


def test_library_crud_lifecycle(api):
    lib = api.create_library({"name": "lib-a", "description": "d"})
    assert lib["name"] == "lib-a" and lib["version"] == 0 and lib["documents"] == []
    got = api.get_library(lib["id"])
    assert got["id"] == lib["id"]
    upd = api.update_library(lib["id"], {"name": "lib-b"})
    assert upd["name"] == "lib-b" and upd["version"] == 1
    assert any(entry["id"] == lib["id"] for entry in api.list_libraries())
    api.delete_library(lib["id"])
    with pytest.raises(ApiError) as e:
        api.get_library(lib["id"])
    assert _status(e) == 404


def test_library_validation_and_404s(api):
    with pytest.raises(ApiError) as e:
        api.create_library({})
    assert _status(e) == 400
    with pytest.raises(ApiError) as e:
        api.update_library("nope", {"name": "x"})
    assert _status(e) == 404
    with pytest.raises(ApiError) as e:
        api.update_library("nope", {})
    assert _status(e) == 400  # validation precedes existence (libraries.py:36)
    with pytest.raises(ApiError) as e:
        api.delete_library("nope")
    assert _status(e) == 404


def test_document_crud_and_errors(api):
    lib = api.create_library({"name": "docs"})["id"]
    doc = api.add_document(lib, {"title": "t1", "metadata": {"category": "guide"}})
    assert doc["metadata"]["category"] == "guide" and doc["chunks"] == []
    upd = api.update_document(lib, doc["id"], {"title": "t2"})
    assert upd["title"] == "t2"
    assert len(api.list_documents(lib)) == 1
    with pytest.raises(ApiError) as e:
        api.update_document(lib, doc["id"], {})
    assert _status(e) == 400
    with pytest.raises(ApiError) as e:
        api.get_document(lib, "missing")
    assert _status(e) == 404 and e.value.detail == "Document not found"
    with pytest.raises(ApiError) as e:
        api.list_documents("missing-lib")
    assert _status(e) == 404 and e.value.detail == "Library not found"
    api.delete_document(lib, doc["id"])
    assert api.list_documents(lib) == []


def test_interactive_session_endpoints(api, tmp_path):
    """start -> signals -> process -> status/results, mirroring the
    interactive router contract (202-accept dicts, 400 validations, status
    shape of interactive_workflow.get_status)."""
    from vector_db_mvp_spark.api import InteractiveApi

    ia = InteractiveApi(api.engine, root=str(tmp_path / "ia"))
    wf = ia.start()["workflow_id"]

    with pytest.raises(ApiError) as e:
        ia.signal_add_library(wf, {})
    assert _status(e) == 400
    with pytest.raises(ApiError) as e:
        ia.signal_add_library("unknown-wf", {"name": "x"})
    assert _status(e) == 404

    assert ia.signal_add_library(wf, {"name": "stream-lib"}) == {
        "accepted": True, "message": "add_library signaled"
    }
    ia.process()
    st = ia.status(wf)
    lib = st["active_library_id"]
    assert st["created_library_ids"] == [lib]
    assert st["created_libraries_by_id"][lib] == "stream-lib"

    ia.signal_add_document(wf, {"lib_id": lib, "title": "doc"})
    ia.process()
    doc = ia.status(wf)["active_document_id"]
    ia.signal_add_chunk(wf, {"lib_id": lib, "doc_id": doc, "text": "north",
                             "embedding": [1.0, 0.0, 0.0, 0.0],
                             "metadata": {"type": "heading"}})
    ia.signal_add_chunk(wf, {"lib_id": lib, "doc_id": doc, "text": "east",
                             "embedding": [0.0, 1.0, 0.0, 0.0],
                             "metadata": {"type": "paragraph"}})
    ia.signal_set_query_params(wf, {"k": 1})
    ia.signal_start_query(wf, {"lib_id": lib,
                               "query_embedding": [1.0, 0.0, 0.0, 0.0]})
    ia.signal_finish(wf)
    ia.process()

    st = ia.status(wf)
    assert st["finished"] is True
    assert st["created_chunk_counts_by_doc"][doc] == 2  # A2 incremental count
    assert st["chunk_metadata_catalog_by_library"][lib]["type"] == [
        "heading", "paragraph"
    ]  # A3 catalog, observed order
    assert st["query_params"] == {"k": 1}
    assert st["timeline_tail"][-1] == "finish:ok"

    res = ia.results(wf)
    assert res["index_used"] == "brute"
    assert [h["text"] for h in res["hits"]] == ["north"]


def test_interactive_cancel_signal(api, tmp_path):
    """POST /{wf}/signal/cancel parity (interactive.py:189-199 +
    interactive_workflow.py:189-191,362): cancel marks the session finished;
    cancel on an already-closed workflow is idempotent success; unknown
    workflow is 404."""
    from vector_db_mvp_spark.api import InteractiveApi

    ia = InteractiveApi(api.engine, root=str(tmp_path / "ia-cancel"))
    wf = ia.start()["workflow_id"]

    with pytest.raises(ApiError) as e:
        ia.signal_cancel("unknown-wf")
    assert _status(e) == 404

    ia.signal_add_library(wf, {"name": "doomed"})
    assert ia.signal_cancel(wf) == {"accepted": True, "message": "cancel signaled"}
    ia.process()

    st = ia.status(wf)
    assert st["finished"] is True
    assert st["timeline_tail"][-1] == "cancel:ok"

    # double-cancel: idempotent accept, same as the reference's
    # already-closed branch — and no new command is enqueued
    seq_before = ia._seqs[wf]
    assert ia.signal_cancel(wf) == {"accepted": True, "message": "workflow already closed"}
    assert ia.signal_finish(wf) == {"accepted": True, "message": "workflow already closed"}
    assert ia._seqs[wf] == seq_before


def test_assemble_library_chunk_cap(api):
    """Driver OOM guard: nested responses collect at most
    max_chunks_per_response chunks (limit pushed into the plan) and flag
    truncation; the default (uncapped here) response shape is unchanged."""
    from vector_db_mvp_spark.api import VectorDbApi

    lib = api.create_library({"name": "big-lib"})["id"]
    doc = api.add_document(lib, {"title": "d"})["id"]
    for i in range(5):
        api.add_chunk(lib, doc, {"text": f"c{i}", "embedding": [float(i), 1.0, 0.0, 0.0]})

    full = api.get_library(lib)
    assert "truncated" not in full
    assert len(full["documents"][0]["chunks"]) == 5

    capped = VectorDbApi(api.engine, max_chunks_per_response=3).get_library(lib)
    assert capped["truncated"] is True
    assert len(capped["documents"][0]["chunks"]) == 3


def test_chunk_crud_cascade_and_search(api):
    lib = api.create_library({"name": "search-lib"})["id"]
    doc = api.add_document(lib, {"title": "d"})["id"]
    c1 = api.add_chunk(lib, doc, {"text": "north", "embedding": [1.0, 0.0, 0.0, 0.0]})
    api.add_chunk(lib, doc, {"text": "east", "embedding": [0.0, 1.0, 0.0, 0.0],
                             "metadata": {"type": "paragraph"}})
    assert len(api.list_chunks(lib, doc)) == 2

    upd = api.update_chunk(lib, doc, c1["id"], {"metadata": {"type": "heading"}})
    assert upd["metadata"]["type"] == "heading"
    with pytest.raises(ApiError) as e:
        api.update_chunk(lib, doc, c1["id"], {})
    assert _status(e) == 400

    res = api.search(lib, {"query_embedding": [1.0, 0.0, 0.0, 0.0], "k": 1})
    assert res["durable_execution"] is False and res["index_used"] == "brute"
    assert res["hits"][0]["text"] == "north"

    res0 = api.search(lib, {"query_embedding": [1.0, 0.0, 0.0, 0.0], "k": 0})
    assert res0["hits"] == [] and "index_used" not in res0  # k<=0 contract

    with pytest.raises(ApiError) as e:
        api.search(lib, {})
    assert _status(e) == 400 and "query_text or query_embedding" in e.value.detail
    with pytest.raises(ApiError) as e:
        api.search(lib, {"query_embedding": [1.0, 0.0, 0.0, 0.0], "index": "hnsw"})
    assert _status(e) == 400  # engine ValueError -> 400 (search.py:88-89)

    durable = api.search(
        lib, {"query_text": "north", "k": 2}, use_temporal=True
    )
    assert durable["durable_execution"] is True
    assert durable["execution_metadata"]["embedding_generated"] is True

    # cascade: deleting the document empties its chunks
    api.delete_document(lib, doc)
    with pytest.raises(ApiError) as e:
        api.list_chunks(lib, doc)
    assert _status(e) == 404
