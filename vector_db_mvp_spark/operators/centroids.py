"""Per-group embedding centroids — the element-wise mean vector of each
group's embeddings, plus group size.

This is the building block behind IVF coarse quantizers, cluster summaries,
per-source embedding drift monitors, and near-dup cluster medoid selection.
The reference has no grouped-vector aggregate (its aggregation surface is
scalar counts, SURVEY.md §2.4); at 100 TB a centroid pass is the standard
"one scan, tiny output" summary job.

Three implementations with one contract, parity-tested against each other:

- ``label_centroids``   (native, THE scale path): posexplode the embedding
  to (group, pos, value) and groupBy(group, pos). The shuffle carries
  N x d rows but partial aggregation (map-side combine) collapses each
  task's contribution to |groups| x d running (sum, count) pairs before the
  exchange, so the wire volume is O(tasks x groups x d) — independent of
  row count. Reassembly sorts each group's d (pos, mean) pairs back into an
  array. Zero Python.
- ``label_centroids_pandas`` (applyInPandas grouped map): one Arrow batch
  per group, ``np.mean(np.stack(...))``. Simpler, but the full group's
  vectors transit to Python — use when a follow-on computation needs the
  stacked matrix anyway (e.g. per-cluster PCA).
- ``centroid_udaf``     (pandas GROUPED_AGG UDAF, SURVEY §2.10 X4): the
  user-defined aggregate surface — ``df.groupBy(g).agg(centroid_udaf(col))``
  composes with other aggregates in one pass, which neither of the above
  can do. Arrow-batched, never per-row.

Determinism note: float addition is not associative, so partial-agg means
can differ from single-pass means in the last ulp; oracle comparisons round
to 6 dp (error ~1e-15, margin 5e-7 — see workload/vector.py contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

import pandas as pd


def label_centroids_long(
    df: DataFrame,
    *,
    group_col: str = "label",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Long-form centroids: one row per (group, pos) with the element mean
    and the group's vector count. This is the exchange-friendly shape — the
    assembled-array variant below is a pure reshape of this plan."""
    exploded = (
        df.filter(F.col(embedding_col).isNotNull())
        .select(
            F.col(group_col),
            F.posexplode(F.col(embedding_col).cast("array<double>")).alias(
                "pos", "_x"
            ),
        )
    )
    return exploded.groupBy(group_col, "pos").agg(
        F.avg("_x").alias("value"), F.count("_x").alias("n_vectors")
    )


def label_centroids(
    df: DataFrame,
    *,
    group_col: str = "label",
    embedding_col: str = "embedding",
) -> DataFrame:
    """(group, n_vectors, centroid array<double>) per group — native path."""
    long = label_centroids_long(
        df, group_col=group_col, embedding_col=embedding_col
    )
    return long.groupBy(group_col).agg(
        F.max("n_vectors").alias("n_vectors"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "value"))),
            lambda s: s["value"],
        ).alias("centroid"),
    )


def label_centroids_pandas(
    df: DataFrame,
    *,
    group_col: str = "label",
    embedding_col: str = "embedding",
) -> DataFrame:
    """applyInPandas grouped-map twin of ``label_centroids`` (same output
    contract). Each group's vectors arrive as one Arrow batch; numpy takes
    the column means."""
    import numpy as np

    out_schema = (
        f"{group_col} int, n_vectors long, centroid array<double>"
    )

    def _mean(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[embedding_col].to_numpy())
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_vectors": [len(pdf)],
                "centroid": [mat.mean(axis=0, dtype=np.float64).tolist()],
            }
        )

    return (
        df.filter(F.col(embedding_col).isNotNull())
        .select(group_col, F.col(embedding_col).cast("array<double>").alias(embedding_col))
        .groupBy(group_col)
        .applyInPandas(_mean, schema=out_schema)
    )


@F.pandas_udf(ArrayType(DoubleType()))
def centroid_udaf(v: pd.Series) -> list[float]:
    """Grouped-agg pandas UDAF: element-wise mean of an array column.

    The UDAF surface (SURVEY §2.10 X4) exists because it COMPOSES — e.g.
    ``df.groupBy("label").agg(centroid_udaf("embedding"),
    mean_norm_udaf("embedding"))`` computes several vector aggregates in one
    grouped pass. (Catalyst restricts a grouped-agg pandas UDF to composing
    with OTHER pandas aggregates — INVALID_PANDAS_UDF_PLACEMENT otherwise —
    so scalar companions like group size ride along as pandas UDAFs too.)
    Arrow ships each group's values as a pandas Series of lists.
    """
    import numpy as np

    vals = [x for x in v if x is not None]
    if not vals:
        return None
    return np.stack(vals).mean(axis=0, dtype=np.float64).tolist()


@F.pandas_udf(DoubleType())
def mean_norm_udaf(v: pd.Series) -> float:
    """Scalar companion UDAF: mean L2 norm of a group's vectors (a cheap
    dispersion/scale probe next to the centroid)."""
    import numpy as np

    vals = [x for x in v if x is not None]
    if not vals:
        return None
    return float(np.linalg.norm(np.stack(vals), axis=1).mean())
