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
    # one current dir per dim table + one per library with chunks
    assert n_dirs_after == 3
    assert n_dirs_after <= n_dirs_before
    # store still fully readable after vacuum
    assert store.read("chunks").count() == 1
    assert store.library_version(lib) == 2


def test_chunk_writes_are_per_library(spark, tmp_path):
    """The O(library) write contract: a chunk write to one library must not
    rewrite any other library's chunk directory (at 100 TB, rewriting the
    whole fact table per insert is the difference between feasible and
    absurd)."""
    store = EntityStore(spark, str(tmp_path / "store2"), default_dim=2)
    lib1 = store.create_library("a")
    lib2 = store.create_library("b")
    d1 = store.add_document(lib1, "d1")
    d2 = store.add_document(lib2, "d2")
    store.add_chunk(lib1, d1, "x", [1.0, 0.0])
    store.add_chunk(lib2, d2, "y", [0.0, 1.0])
    before = store._chunks_map()

    store.add_chunk(lib1, d1, "x2", [0.5, 0.5])
    after = store._chunks_map()
    assert after[lib2] == before[lib2]  # untouched library: same directory
    assert after[lib1] != before[lib1]  # written library: new version dir
    # deleting a library only drops its map entry
    store.delete_library(lib1)
    assert store._chunks_map().keys() == {lib2}
    assert store.read("chunks").count() == 1
