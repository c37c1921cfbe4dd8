"""CRUD lifecycle against the EntityStore, mirroring the reference's
endpoint-level suite (``tests/test_crud.py:573-650`` full lifecycle; 404
paths per entity; version bump on every write path — SURVEY.md §5)."""

from __future__ import annotations

import pytest

from vector_db_mvp_spark.embedding.provider import FailingEmbeddingProvider
from vector_db_mvp_spark.storage.store import EntityStore, NotFoundError


@pytest.fixture()
def store(spark, tmp_path):
    return EntityStore(spark, str(tmp_path / "store"), default_dim=8)


def test_full_lifecycle(store):
    # create library -> version 0
    lib = store.create_library("travel", description="trips", tags="test,demo")
    assert store.library_version(lib) == 0

    # add document -> version 1
    doc = store.add_document(lib, "paris guide", category="travel")
    assert store.library_version(lib) == 1

    # add 2 chunks -> versions 2, 3
    c1 = store.add_chunk(lib, doc, "eiffel tower", [0.1, 0.2, 0.3, 0.4], meta_type="landmark")
    c2 = store.add_chunk(lib, doc, "louvre museum", [0.5, 0.6, 0.7, 0.8], meta_type="landmark")
    assert store.library_version(lib) == 3
    assert store.list_chunks(lib, doc).count() == 2

    # update chunk text (no embedding supplied -> re-embed via provider)
    before = store.get_chunk(lib, c1)
    store.update_chunk(lib, c1, text="eiffel tower at night", dim=4)
    after = store.get_chunk(lib, c1)
    assert after["text"] == "eiffel tower at night"
    assert after["embedding"] != before["embedding"]  # re-embedded
    assert after["updated_at"] >= before["updated_at"]
    assert store.library_version(lib) == 4

    # partial update whitelists
    store.update_document(lib, doc, title="paris travel guide")
    assert store.get_document(lib, doc)["title"] == "paris travel guide"
    assert store.get_document(lib, doc)["category"] == "travel"
    store.update_library(lib, description="city trips")
    row = store.get_library(lib)
    assert (row["name"], row["description"]) == ("travel", "city trips")
    assert store.library_version(lib) == 6

    # delete chunk -> one left
    store.delete_chunk(lib, c2)
    assert store.list_chunks(lib, doc).count() == 1
    assert store.library_version(lib) == 7

    # cascade: delete document drops its chunks
    store.delete_document(lib, doc)
    assert store.read("chunks").count() == 0
    with pytest.raises(NotFoundError):
        store.get_document(lib, doc)

    # cascade: delete library
    store.delete_library(lib)
    with pytest.raises(NotFoundError):
        store.get_library(lib)
    assert store.list_libraries().count() == 0


def test_not_found_paths(store):
    with pytest.raises(NotFoundError):
        store.get_library("nope")
    with pytest.raises(NotFoundError):
        store.update_library("nope", name="x")
    with pytest.raises(NotFoundError):
        store.delete_library("nope")
    lib = store.create_library("l")
    with pytest.raises(NotFoundError):
        store.add_chunk(lib, "missing-doc", "text")
    with pytest.raises(NotFoundError):
        store.get_chunk(lib, "missing-chunk")


def test_reembed_failure_keeps_old_embedding(spark, tmp_path):
    store = EntityStore(spark, str(tmp_path / "s2"))
    lib = store.create_library("l")
    doc = store.add_document(lib, "d")
    cid = store.add_chunk(lib, doc, "hello", [1.0, 0.0])
    store.provider = FailingEmbeddingProvider()
    # chunk_service.py:43-45: provider failure is swallowed; text updates,
    # embedding stays.
    store.update_chunk(lib, cid, text="goodbye")
    row = store.get_chunk(lib, cid)
    assert row["text"] == "goodbye"
    assert row["embedding"] == [1.0, 0.0]


def test_isolation_snapshot_reads(store):
    """DataFrame read before a write keeps its snapshot (the analog of the
    reference's deepcopy-on-read)."""
    lib = store.create_library("snap")
    doc = store.add_document(lib, "d")
    store.add_chunk(lib, doc, "a", [1.0, 0.0])
    snapshot = store.read("chunks")
    n_before = snapshot.count()
    store.add_chunk(lib, doc, "b", [0.0, 1.0])
    assert snapshot.count() == n_before  # old pointer, old data
    assert store.read("chunks").count() == n_before + 1


def test_add_chunks_bulk_one_generation_one_version(spark, tmp_path):
    """Bulk load: N chunks land as one versioned append (one library
    version bump), deterministic ids via id_col, and the result is
    indistinguishable from N add_chunk calls to every read path."""
    from pyspark.sql import functions as F

    from vector_db_mvp_spark.storage.store import EntityStore

    store = EntityStore(spark, str(tmp_path / "bulkstore"), default_dim=4)
    lib = store.create_library("lib")
    doc = store.add_document(lib, "doc")
    v0 = store.library_version(lib)
    src = spark.range(100).select(
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.array(
            F.col("id").cast("float"), F.lit(1.0), F.lit(0.0), F.lit(0.0)
        ).alias("embedding"),
        F.concat(F.lit("c"), F.col("id")).alias("cid"),
    )
    n = store.add_chunks_bulk(lib, doc, src, id_col="cid")
    assert n == 100
    assert store.library_version(lib) == v0 + 1  # ONE bump, not 100
    got = store.read_chunks_library(lib)
    assert got.count() == 100
    row = got.filter(F.col("chunk_id") == "c7").collect()[0]
    assert row["text"] == "text-7" and row["embedding"][0] == 7.0
    # point-read path sees bulk rows like any other chunk
    assert store.get_chunk(lib, "c7")["text"] == "text-7"
