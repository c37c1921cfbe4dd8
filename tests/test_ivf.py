"""IVF ANN: exactness at full probe, recall at partial probe, determinism."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vector_db_mvp_spark.operators.ivf import build_ivf_index, ivf_topk
from vector_db_mvp_spark.operators.topk import topk_cosine
from vector_db_mvp_spark.sources.testdata import load_table

K_CLUSTERS = 8


@pytest.fixture(scope="module")
def ivf(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = build_ivf_index(emb, K_CLUSTERS, seed=42)
    return assigned.cache(), centroids, emb


def test_full_probe_equals_brute(ivf):
    assigned, centroids, emb = ivf
    q = emb.filter(F.col("vec_id") == 3).head()["embedding"]
    exact = [(r["vec_id"], round(r["score"], 9)) for r in topk_cosine(emb, q, 10).collect()]
    full = [
        (r["vec_id"], round(r["score"], 9))
        for r in ivf_topk(assigned, centroids, q, 10, nprobe=K_CLUSTERS).collect()
    ]
    assert full == exact


def test_partial_probe_recall(ivf):
    assigned, centroids, emb = ivf
    hits = 0
    total = 0
    for qid in [0, 5, 9]:
        q = emb.filter(F.col("vec_id") == qid).head()["embedding"]
        exact = {r["vec_id"] for r in topk_cosine(emb, q, 10).collect()}
        approx = {
            r["vec_id"]
            for r in ivf_topk(assigned, centroids, q, 10, nprobe=3).collect()
        }
        assert approx <= {r["vec_id"] for r in topk_cosine(emb, q, 500).collect()}
        hits += len(exact & approx)
        total += len(exact)
    assert hits / total >= 0.5, f"recall {hits}/{total}"


def test_persisted_layout_prunes_partitions(spark, ivf, tmp_path):
    """The serving layout: partitionBy(cluster_id) on disk; an nprobe query
    must reach the scan as PartitionFilters (directory pruning), and results
    must equal querying the in-memory assignment."""
    from vector_db_mvp_spark.operators.ivf import (
        read_ivf_layout,
        write_ivf_layout,
    )

    assigned, centroids, emb = ivf
    path = str(tmp_path / "ivf")
    write_ivf_layout(assigned, centroids, path)
    disk, c2 = read_ivf_layout(spark, path)
    assert [[round(x, 9) for x in c] for c in c2] == [
        [round(x, 9) for x in c] for c in centroids
    ]

    q = emb.filter(F.col("vec_id") == 7).head()["embedding"]
    df = ivf_topk(disk, c2, q, 10, nprobe=3)
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("cluster_id" in ln for ln in part_lines), plan

    want = [(r["vec_id"], round(r["score"], 9))
            for r in ivf_topk(assigned, centroids, q, 10, nprobe=3).collect()]
    got = [(r["vec_id"], round(r["score"], 9)) for r in df.collect()]
    assert got == want


def test_build_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _, c1 = build_ivf_index(emb, 4, seed=42)
    _, c2 = build_ivf_index(emb, 4, seed=42)
    assert [[round(x, 9) for x in c] for c in c1] == [[round(x, 9) for x in c] for c in c2]
