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


def test_append_to_layout_is_incremental_and_exact(spark, sf_dir, tmp_path):
    """O(batch) IVF ingestion (append_to_ivf_layout): new vectors assigned
    to the EXISTING centroids land in the right cluster directories, the
    layout stays exact under full probe, partition pruning still holds,
    and the assignment matches the numpy nearest-centroid rule."""
    import numpy as np

    from vector_db_mvp_spark.operators.ivf import (
        append_to_ivf_layout,
        assign_cluster_expr,
        build_ivf_index,
        ivf_topk,
        read_ivf_layout,
        write_ivf_layout,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    base = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "ivf_layout")
    assigned, centroids = build_ivf_index(base, 8, seed=42)
    write_ivf_layout(assigned, centroids, path)

    append_to_ivf_layout(batch, path)
    served, cents2 = read_ivf_layout(spark, path)
    assert cents2 == centroids  # append never touches the sidecar
    assert served.count() == emb.count()

    # appended rows obey the nearest-centroid rule (numpy cross-check)
    c = np.asarray(centroids, dtype=np.float64)
    got = {r["vec_id"]: r["cluster_id"]
           for r in served.join(batch.select("vec_id"), "vec_id", "left_semi").collect()}
    for r in batch.limit(25).collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(v)
        u = v if n == 0 else v / n
        want = int(np.argmin((c**2).sum(axis=1) - 2.0 * (c @ u)))
        assert got[r["vec_id"]] == want

    # still exact under full probe, appended rows retrievable
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).take(1)[0]["embedding"]]
    full = {(r["vec_id"], round(r["score"], 6))
            for r in ivf_topk(served, centroids, qv, 10, nprobe=len(centroids),
                              score_decimals=6).collect()}
    brute = {(r["vec_id"], round(r["score"], 6))
             for r in topk_cosine(emb, qv, 10, score_decimals=6).collect()}
    assert full == brute

    # partition pruning still applies after append
    pruned = ivf_topk(served, centroids, qv, 10, nprobe=2, score_decimals=6)
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "cluster_id" in plan
