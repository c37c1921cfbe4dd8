"""Implicit-feedback collaborative filtering via MLlib ALS — item
recommendation from the order history (customer x part purchase counts).

The packaged distributed matrix-factorization path, used like
operators/brp_lsh.py uses MLlib LSH: where a maintained scale-out
implementation beats hand-rolling (blocked ALS shuffles factor blocks, not
the full matrix). ALS factors are iterative least-squares solutions — NOT
SQL-replayable — so correctness is pinned by behavioral tests
(tests/test_als.py: strong co-purchase structure recovered, determinism
under a fixed seed) rather than a DuckDB oracle, the same verification
contract as the BRP-LSH adapter.

Scale notes: interactions are aggregated to (user, item, count) BEFORE the
fit — ALS sees |distinct pairs| rows, not raw lineitems; `coldStartStrategy
="drop"` keeps serving joins NaN-free; recommendations come from
``recommendForAllUsers`` (blocked cross-factor top-k, no full user x item
materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_interactions(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """(customer, part, n_purchases) implicit-feedback matrix from the
    order history — one aggregated shuffle over the fact join."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
    )


def fit_als(
    interactions: DataFrame,
    *,
    rank: int = 8,
    max_iter: int = 5,
    reg: float = 0.1,
    alpha: float = 10.0,
    seed: int = 42,
):
    """Fit implicit-preference ALS (Hu/Koren/Volinsky 2008) on the
    aggregated interaction matrix."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        alpha=alpha,
        implicitPrefs=True,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
        seed=seed,
    )
    return als.fit(interactions)


def recommend_items(model, k: int) -> DataFrame:
    """(user, item, score, rank) — top-k unseen-or-seen items per user from
    the factor model (blocked top-k, never a full user x item join)."""
    recs = model.recommendForAllUsers(k)
    return recs.select(
        "user",
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "user",
        F.col("rec.item").alias("item"),
        F.col("rec.rating").alias("score"),
        (F.col("pos") + 1).alias("rank"),
    )
