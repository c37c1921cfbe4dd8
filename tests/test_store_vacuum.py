from __future__ import annotations

import os

from vector_db_mvp_spark.storage.store import EntityStore


def test_vacuum_reclaims_old_versions(spark, tmp_path):
    store = EntityStore(spark, str(tmp_path / "store"))
    lib = store.create_library("l")
    doc = store.add_document(lib, "d")
    store.add_chunk(lib, doc, "a", [1.0, 0.0])
    n_dirs_before = sum(".v" in e for e in os.listdir(store.root))
    store.vacuum()
    n_dirs_after = sum(".v" in e for e in os.listdir(store.root))
    assert n_dirs_after == 3  # exactly one current dir per table
    assert n_dirs_after <= n_dirs_before
    # store still fully readable after vacuum
    assert store.read("chunks").count() == 1
    assert store.library_version(lib) == 2
