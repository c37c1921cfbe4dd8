"""Run the REFERENCE's own endpoint suite (39 TestClient tests,
/root/reference/tests/test_crud.py) VERBATIM against the Spark-backed
Flask server (vector_db_mvp_spark/http_app.py).

Nothing is copied: the reference test module is exec'd from its original
path with two import shims installed — ``fastapi.testclient.TestClient``
(adapted onto Flask's test client) and ``app.main.app`` (our mounted
app). Every assertion those tests make — status codes 201/200/204/400/
404, response field names and values, cascade deletes, exact embedding
round-trips — runs unmodified. This is the strongest executable parity
evidence for the CRUD surface (VERDICT r5 task 4).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import tempfile
import types

import pytest

pytest.importorskip("flask")

REF_TESTS = "/root/reference/tests/test_crud.py"

if os.path.exists(REF_TESTS):
    from vector_db_mvp_spark.engine import SearchEngine
    from vector_db_mvp_spark.http_app import create_app
    from vector_db_mvp_spark.session import get_spark
    from vector_db_mvp_spark.storage.store import EntityStore

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    _spark = get_spark("vector_db_mvp_spark-tests", shuffle_partitions=8)
    _store = EntityStore(
        _spark,
        os.path.join(tempfile.mkdtemp(prefix="ref-crud-parity-"), "store"),
        default_dim=4,
    )
    _flask_app = create_app(SearchEngine(_store))

    class _Response:
        """Adapter: flask.testing response -> the two members the reference
        tests use (status_code attribute, json() method)."""

        def __init__(self, resp) -> None:
            self.status_code = resp.status_code
            self._json = resp.get_json(silent=True)

        def json(self):
            return self._json

    class _ClientShim:
        """fastapi.testclient.TestClient's call surface over Flask's
        test client (only the methods the reference suite uses)."""

        def __init__(self, app) -> None:
            self._client = app.test_client()

        def get(self, url, **kw):
            return _Response(self._client.get(url, **kw))

        def post(self, url, json=None, **kw):
            return _Response(self._client.post(url, json=json, **kw))

        def put(self, url, json=None, **kw):
            return _Response(self._client.put(url, json=json, **kw))

        def delete(self, url, **kw):
            return _Response(self._client.delete(url, **kw))

    def _exec_reference_suite():
        """Exec the reference test module with the two shims installed,
        then drop the shims so nothing else sees fake modules."""
        shims = {}
        fastapi_mod = types.ModuleType("fastapi")
        testclient_mod = types.ModuleType("fastapi.testclient")
        testclient_mod.TestClient = _ClientShim
        fastapi_mod.testclient = testclient_mod
        app_pkg = types.ModuleType("app")
        main_mod = types.ModuleType("app.main")
        main_mod.app = _flask_app
        app_pkg.main = main_mod
        shims = {
            "fastapi": fastapi_mod,
            "fastapi.testclient": testclient_mod,
            "app": app_pkg,
            "app.main": main_mod,
        }
        saved = {k: sys.modules.get(k) for k in shims}
        sys.modules.update(shims)
        try:
            spec = importlib.util.spec_from_file_location(
                "reference_test_crud", REF_TESTS
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod
        finally:
            for k, prev in saved.items():
                if prev is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = prev

    _ref = _exec_reference_suite()
    # Re-export the reference's Test* classes so pytest collects them here.
    _EXPORTED = [
        name for name, obj in vars(_ref).items()
        if name.startswith("Test") and isinstance(obj, type)
    ]
    globals().update({name: getattr(_ref, name) for name in _EXPORTED})

    def test_reference_suite_was_loaded():
        assert len(_EXPORTED) >= 4, _EXPORTED
else:  # reference checkout absent (e.g. standalone use of this repo)
    @pytest.mark.skip(reason="reference test suite not present at /root/reference")
    def test_reference_suite_was_loaded():
        pass
