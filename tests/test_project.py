"""Random-projection sketch (operators/project.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.project import (
    projection_planes,
    random_projection,
)
from vector_db_mvp_spark.sources.testdata import load_table


def test_projection_matches_driver_math(spark):
    planes = projection_planes(4, 2, seed=7)
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0, 4.0])], "id long, embedding array<float>")
    row = random_projection(df, planes).collect()[0]
    for i, plane in enumerate(planes):
        want = 0.0
        for x, y in zip([1.0, 2.0, 3.0, 4.0], plane):
            want += x * y
        assert math.isclose(row[f"p{i}"], want, rel_tol=1e-9)


def test_projection_plan_is_shuffle_free(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = random_projection(emb, projection_planes(64, 8))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_projected_prefilter_topk_recall_and_plan(spark, sf_dir):
    from vector_db_mvp_spark.operators.project import projected_prefilter_topk
    from vector_db_mvp_spark.operators.topk import topk_cosine

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).take(1)[0]["embedding"]]
    planes = projection_planes(64, 16, seed=7)
    approx = projected_prefilter_topk(
        emb, planes, qv, 10, candidates=100, score_decimals=6
    )
    exact = topk_cosine(emb, qv, 10, score_decimals=6)
    got = {r["vec_id"] for r in approx.collect()}
    want = {r["vec_id"] for r in exact.collect()}
    # the fixture's top-10 cosine gaps (~1e-2) sit near a 16-dim sketch's
    # resolution floor; the bound is "well above the random-candidate
    # baseline" (100/500 candidates -> E[recall]=2/10), not near-exactness
    assert len(got & want) >= 4, (got, want)

    # the candidate cut is a TakeOrderedAndProject, not a global sort
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_projection_preserves_distance_energy(spark, sf_dir):
    # JL sanity via the energy identity: with unit-norm random planes,
    # E[|P(a-b)|^2] = (k/d) * |a-b|^2 — the mean sketch/full squared-distance
    # ratio over sampled pairs must sit near k/d. (Pearson correlation is the
    # wrong check here: the fixture's pairwise distances are near-constant,
    # so between-pair signal variance is tiny vs JL noise by construction.)
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.col("vec_id") < 40)
    )
    k, d = 16, 64
    rows = random_projection(emb, projection_planes(d, k, seed=7)).collect()
    import itertools

    ratios = []
    for a, b in itertools.combinations(rows[:20], 2):
        full = sum((x - y) ** 2 for x, y in zip(a["embedding"], b["embedding"]))
        sketch = sum((a[f"p{i}"] - b[f"p{i}"]) ** 2 for i in range(k))
        if full > 0:
            ratios.append(sketch / full)
    mean = sum(ratios) / len(ratios)
    assert abs(mean - k / d) < 0.5 * k / d, mean
    assert min(ratios) > 0
