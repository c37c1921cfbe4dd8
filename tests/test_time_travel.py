"""Commit-log time travel on the EntityStore (storage/store.py)."""

from __future__ import annotations

import pytest

from vector_db_mvp_spark.storage.store import EntityStore


@pytest.fixture()
def store(spark, tmp_path):
    return EntityStore(spark, str(tmp_path / "store"), default_dim=4)


def test_history_is_monotonic_and_grows_per_write(store):
    before = len(store.history("libraries"))
    store.create_library("a")
    store.create_library("b")
    hist = store.history("libraries")
    assert len(hist) == before + 2
    versions = [e["v"] for e in hist]
    assert versions == sorted(versions) and len(set(versions)) == len(versions)


def test_read_at_returns_old_snapshot(store):
    lib = store.create_library("a")
    v_after_create = store.history("libraries")[-1]["v"]
    store.update_library(lib, name="renamed")
    assert store.get_library(lib)["name"] == "renamed"
    old = store.read_at("libraries", v_after_create).collect()
    assert [r.name for r in old] == ["a"]


def test_chunk_snapshots_travel_too(store):
    lib = store.create_library("lib")
    doc = store.add_document(lib, "doc")
    store.add_chunk(lib, doc, "first", embedding=[0.0] * 4)
    v1 = store.history("chunks")[-1]["v"]
    store.add_chunk(lib, doc, "second", embedding=[0.0] * 4)
    assert store.read("chunks").count() == 2
    assert store.read_at("chunks", v1).count() == 1


def test_unknown_version_raises(store):
    with pytest.raises(KeyError):
        store.read_at("libraries", 10**6)


def test_vacuum_reclaims_old_snapshots(store):
    lib = store.create_library("a")
    v_old = store.history("libraries")[-1]["v"]
    store.update_library(lib, name="renamed")
    store.vacuum()
    with pytest.raises(FileNotFoundError):
        store.read_at("libraries", v_old).collect()
    # Current snapshot still reads fine.
    assert store.get_library(lib)["name"] == "renamed"


def test_vacuum_retention_keeps_n_snapshots(store):
    lib = store.create_library("a")
    v1 = store.history("libraries")[-1]["v"]
    store.update_library(lib, name="b")
    v2 = store.history("libraries")[-1]["v"]
    store.update_library(lib, name="c")
    store.vacuum(retain_last=2)
    # v2 (within retention) still reads; v1 (older) is gone.
    assert [r.name for r in store.read_at("libraries", v2).collect()] == ["b"]
    with pytest.raises(FileNotFoundError):
        store.read_at("libraries", v1).collect()
