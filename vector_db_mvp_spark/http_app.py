"""Mounted HTTP server: the reference's FastAPI route surface
(``app/main.py:8-14`` — routers ``libraries/documents/chunks/search/
interactive``) served over Flask, delegating every route to the
framework-free facade in ``api.py``.

The facade already carries the contract (validation order, 404/400 codes,
response shapes); this module is ONLY the mechanical route<->method map,
so the reference's own endpoint suite (``tests/test_crud.py`` there — 39
TestClient tests) runs against it verbatim via
``tests/test_reference_crud_parity.py``.

Flask is an optional dependency: import this module lazily and only when
serving HTTP. Spark-side behavior never depends on it.

Route map (prefixes from app/main.py:10-14):
  POST/GET       /vector_db/libraries                  (201 on create)
  GET/PUT/DELETE /vector_db/libraries/<lib>            (204 on delete)
  GET/POST       .../documents                          (201 on create)
  GET/PUT/DELETE .../documents/<doc>
  GET/POST       .../documents/<doc>/chunks             (201 on create)
  PUT/DELETE     .../documents/<doc>/chunks/<chunk>
  POST           .../search?use_temporal=
  POST           /interactive/start                     (202)
  GET            /interactive/<wid>/status|results
  POST           /interactive/<wid>/signal/<action>     (202)
  POST           /interactive/process   [extension: the Temporal worker's
                 drain step, which the reference runs out-of-band]
"""

from __future__ import annotations

from typing import Any

from .api import ApiError, InteractiveApi, VectorDbApi
from .engine import SearchEngine


def create_app(
    engine: SearchEngine,
    *,
    api: VectorDbApi | None = None,
    interactive: InteractiveApi | None = None,
):
    """Build the Flask app over a SearchEngine. Raises ImportError if Flask
    is not installed (HTTP serving is optional; everything else works
    without it)."""
    from flask import Flask, jsonify, request

    vapi = api or VectorDbApi(engine)
    iapi = interactive or InteractiveApi(engine)
    app = Flask("vector_db_mvp_spark")

    @app.errorhandler(ApiError)
    def _api_error(e: ApiError):
        # FastAPI's HTTPException body shape: {"detail": ...}
        return jsonify({"detail": e.detail}), e.status

    def _body() -> dict[str, Any]:
        return request.get_json(silent=True) or {}

    LIB = "/vector_db/libraries"

    @app.post(LIB)
    def create_library():
        return jsonify(vapi.create_library(_body())), 201

    @app.get(LIB)
    def list_libraries():
        return jsonify(vapi.list_libraries())

    @app.get(f"{LIB}/<lib_id>")
    def get_library(lib_id):
        return jsonify(vapi.get_library(lib_id))

    @app.put(f"{LIB}/<lib_id>")
    def update_library(lib_id):
        return jsonify(vapi.update_library(lib_id, _body()))

    @app.delete(f"{LIB}/<lib_id>")
    def delete_library(lib_id):
        vapi.delete_library(lib_id)
        return "", 204

    @app.get(f"{LIB}/<lib_id>/documents")
    def list_documents(lib_id):
        return jsonify(vapi.list_documents(lib_id))

    @app.post(f"{LIB}/<lib_id>/documents")
    def add_document(lib_id):
        return jsonify(vapi.add_document(lib_id, _body())), 201

    @app.get(f"{LIB}/<lib_id>/documents/<doc_id>")
    def get_document(lib_id, doc_id):
        return jsonify(vapi.get_document(lib_id, doc_id))

    @app.put(f"{LIB}/<lib_id>/documents/<doc_id>")
    def update_document(lib_id, doc_id):
        return jsonify(vapi.update_document(lib_id, doc_id, _body()))

    @app.delete(f"{LIB}/<lib_id>/documents/<doc_id>")
    def delete_document(lib_id, doc_id):
        vapi.delete_document(lib_id, doc_id)
        return "", 204

    @app.get(f"{LIB}/<lib_id>/documents/<doc_id>/chunks")
    def list_chunks(lib_id, doc_id):
        return jsonify(vapi.list_chunks(lib_id, doc_id))

    @app.post(f"{LIB}/<lib_id>/documents/<doc_id>/chunks")
    def add_chunk(lib_id, doc_id):
        return jsonify(vapi.add_chunk(lib_id, doc_id, _body())), 201

    @app.put(f"{LIB}/<lib_id>/documents/<doc_id>/chunks/<chunk_id>")
    def update_chunk(lib_id, doc_id, chunk_id):
        return jsonify(vapi.update_chunk(lib_id, doc_id, chunk_id, _body()))

    @app.delete(f"{LIB}/<lib_id>/documents/<doc_id>/chunks/<chunk_id>")
    def delete_chunk(lib_id, doc_id, chunk_id):
        vapi.delete_chunk(lib_id, doc_id, chunk_id)
        return "", 204

    @app.post(f"{LIB}/<lib_id>/search")
    def search(lib_id):
        use_temporal = request.args.get("use_temporal", "false").lower() in (
            "1", "true", "yes",
        )
        return jsonify(vapi.search(lib_id, _body(), use_temporal=use_temporal))

    @app.post("/interactive/start")
    def interactive_start():
        return jsonify(iapi.start()), 202

    @app.get("/interactive/<wid>/status")
    def interactive_status(wid):
        return jsonify(iapi.status(wid))

    @app.get("/interactive/<wid>/results")
    def interactive_results(wid):
        return jsonify(iapi.results(wid))

    _SIGNALS = {
        "add_library": lambda wid: iapi.signal_add_library(wid, _body()),
        "add_document": lambda wid: iapi.signal_add_document(wid, _body()),
        "add_chunk": lambda wid: iapi.signal_add_chunk(wid, _body()),
        "set_query_params": lambda wid: iapi.signal_set_query_params(wid, _body()),
        "start_query": lambda wid: iapi.signal_start_query(wid, _body()),
        "cancel": lambda wid: iapi.signal_cancel(wid),
        "finish": lambda wid: iapi.signal_finish(wid),
    }

    @app.post("/interactive/<wid>/signal/<action>")
    def interactive_signal(wid, action):
        fn = _SIGNALS.get(action)
        if fn is None:
            raise ApiError(404, "unknown signal")
        return jsonify(fn(wid)), 202

    @app.post("/interactive/process")
    def interactive_process():
        # Extension endpoint: in the reference the Temporal worker drains
        # signals out-of-band; here one availableNow micro-batch run does.
        iapi.process()
        return jsonify({"processed": True}), 200

    return app
