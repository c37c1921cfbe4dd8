"""IVF (inverted-file) approximate nearest neighbor — the MLlib batch-indexing
scale path (BASELINE.json "Approach: MLlib for batch indexing").

Build (offline, once per corpus version):
  KMeans (MLlib, seeded) over unit-normalized vectors -> C centroids;
  every row assigned to its nearest centroid -> the corpus is *partitioned by
  cluster id* on disk, so a query touches only nprobe/C of the data.

Query:
  rank centroids by cosine to the query (C is tiny — driver-side),
  scan only the nprobe best clusters (partition pruning on cluster_id),
  exact cosine re-rank, TakeOrderedAndProject top-k.

At 100 TB: C ~ sqrt(N) clusters, corpus written
``partitionBy("cluster_id")`` -> each query reads nprobe parquet directories;
the centroid table is a broadcast dimension. Recall tested against brute
force in tests/test_ivf.py; nprobe = C degrades gracefully to exact search.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity
from .topk import topk_cosine


def build_ivf_index(
    df: DataFrame,
    num_clusters: int,
    *,
    embedding_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> tuple[DataFrame, list[list[float]]]:
    """Fit seeded KMeans, assign rows to clusters.

    Returns (df + cluster_id column, centroid list). Uses unit-normalized
    vectors so Euclidean KMeans approximates spherical clustering (Euclidean
    on the unit sphere is monotone in cosine)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    from ..functions.vector import unit_normalize

    feat = df.filter(F.col(embedding_col).isNotNull()).withColumn(
        "_unit", unit_normalize(F.col(embedding_col))
    ).withColumn("_features", array_to_vector(F.col("_unit").cast("array<double>")))
    km = KMeans(k=num_clusters, seed=seed, maxIter=max_iter, featuresCol="_features")
    model = km.fit(feat)
    assigned = (
        model.transform(feat)
        .withColumnRenamed("prediction", "cluster_id")
        .drop("_features", "_unit")
    )
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def write_ivf_layout(
    assigned: DataFrame,
    centroids: list[list[float]],
    path: str,
) -> None:
    """Persist the IVF index in its serving layout: parquet partitioned by
    ``cluster_id`` (one directory per inverted list) + a centroids sidecar.
    At 100 TB this is the whole point of IVF — a query's nprobe clusters map
    to nprobe directories and the scan never touches the rest (verified by
    the PartitionFilters plan assertion in tests/test_ivf.py)."""
    import json
    import os

    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(path)
    tmp = os.path.join(path, "_centroids.json.tmp")
    with open(tmp, "w") as f:
        json.dump(centroids, f)
    os.replace(tmp, os.path.join(path, "_centroids.json"))


def read_ivf_layout(spark, path: str) -> tuple[DataFrame, list[list[float]]]:
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = json.load(f)
    return spark.read.parquet(path), centroids


def assign_cluster_expr(
    centroids: Sequence[Sequence[float]], *, embedding_col: str = "embedding"
) -> F.Column:
    """Nearest-centroid id as ONE native column: argmin over
    ||unit(x) - c||^2 = ||c||^2 - 2*unit(x)·c (the same Euclidean-on-unit-
    sphere rule MLlib KMeans.transform applies at build time, so appended
    rows land in the cluster a full rebuild would give them). Dots are
    sequential folds against literal centroid arrays — small enough for
    codegen (see workload/vector.py: inlined per-dim products blow the
    Janino method limit). First-min tie-break via array_position."""
    from ..functions.vector import dot, unit_normalize

    cn2 = [float(np.dot(np.asarray(c, dtype=np.float64), np.asarray(c, dtype=np.float64)))
           for c in centroids]
    xu = unit_normalize(F.col(embedding_col))
    dists = [
        F.lit(cn2[j]) - F.lit(2.0) * dot(xu, F.array(*[F.lit(float(x)) for x in c]))
        for j, c in enumerate(centroids)
    ]
    arr = F.array(*dists)
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


def append_to_ivf_layout(
    new_rows: DataFrame,
    path: str,
    *,
    embedding_col: str = "embedding",
) -> None:
    """O(batch) ingestion into a served IVF layout: assign the new vectors
    to the EXISTING centroids (native expression, no model object, no
    refit) and append their parquet files into the matching cluster_id
    directories. The mirror of the entity store's O(delta) generation
    appends — at 100 TB you re-fit centroids on a schedule, not per batch;
    between refits every batch lands with one map-only job. Queries see
    appended rows immediately (partition pruning is directory-based).

    Contract: ``new_rows`` ids must not already exist in the layout
    (append-only ingestion invariant, same as the dedup state)."""
    _, centroids = _read_centroids(path)
    assigned = new_rows.filter(F.col(embedding_col).isNotNull()).withColumn(
        "cluster_id", assign_cluster_expr(centroids, embedding_col=embedding_col)
    )
    assigned.write.mode("append").partitionBy("cluster_id").parquet(path)


def _read_centroids(path: str) -> tuple[str, list[list[float]]]:
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        return path, json.load(f)


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vector: Sequence[float],
    k: int,
    *,
    nprobe: int = 4,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    score_decimals: int | None = None,
) -> DataFrame:
    """Probe the nprobe centroids nearest to the query (cosine, computed
    driver-side over the tiny centroid set), then exact top-k inside them."""
    q = np.asarray(query_vector, dtype=np.float64)
    qn = np.linalg.norm(q)
    scores = []
    for cid, c in enumerate(centroids):
        cv = np.asarray(c, dtype=np.float64)
        cn = np.linalg.norm(cv)
        s = 0.0 if qn == 0.0 or cn == 0.0 else float(q @ cv / (qn * cn))
        scores.append((s, cid))
    probe = [cid for _, cid in sorted(scores, key=lambda t: (-t[0], t[1]))[:nprobe]]
    pruned = assigned.filter(F.col("cluster_id").isin(probe))
    return topk_cosine(
        pruned, list(map(float, q)), k,
        embedding_col=embedding_col, id_col=id_col, score_decimals=score_decimals,
    )
