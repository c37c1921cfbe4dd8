"""The shared co-purchase edge build: part pairs ordered together.

Six graph queries (copurchase_pairs, part_reachability,
part_cheapest_routes, part_triangles, part_degree_assortativity,
part_kcore) run over the SAME graph — parts are adjacent when some order
contains both — and the round-10 decade probes showed the edge build
dominating every one of them (the ~9x edge growth + IO band behind the
8–10x decade multiples). This module is the single definition all six
derive from, plus the 100 TB artifact path: publish the edges ONCE as a
table bucketed on src, so every downstream consumer (degree aggregation,
peel round, frontier join) reads a layout already partitioned on its key
and pays ZERO state-side exchange (plan-asserted in
tests/test_copurchase.py) — the publish_dedup_state_table pattern from
operators/incremental.py applied to graph edges.

Shape: distinct (order, part) first, so the self-join is co-partitioned
on orderkey (ONE shuffle feeds both sides) and quadratic only WITHIN an
order — baskets are bounded (~7 lines), so pair count stays linear in
orders at any corpus size. The groupBy(src, dst) that weights the pairs
collapses duplicates map-side before its shuffle; symmetrization is a
union of disjoint orientations (src < dst on one leg, > on the other),
so the result is distinct BY CONSTRUCTION — no post-union dedup shuffle.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table


def copurchase_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, n_orders) with src < dst: each part pair and the number
    of orders containing both — the weighted half-graph every co-purchase
    query derives from."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select("l_orderkey", "l_partkey").distinct()
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized distinct edge list (src, dst) of the co-purchase graph.
    Distinct by construction: the weighted half-graph is unique on
    (src, dst) with src < dst, and the swapped leg only produces
    src > dst rows — the union cannot collide."""
    p = copurchase_weighted(spark, sf_dir).select("src", "dst")
    return p.union(p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def copurchase_table_name(sf_dir: str) -> str:
    """Deterministic session-table name for the published edges of one
    corpus ("v1" versions the layout: symmetrized weighted, bucketed on
    src)."""
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|v1".encode()).hexdigest()[:12]
    return f"copurchase_edges_{key}"


def publish_copurchase_edges(
    spark: SparkSession,
    sf_dir: str,
    *,
    buckets: int = 8,
    force: bool = False,
) -> str:
    """Publish the symmetrized WEIGHTED edges (src, dst, n_orders) as a
    table bucketed+sorted on src — the build-once/serve-many artifact.
    The write pays the (src) shuffle once; every consumer keyed on src
    (degree counts, peel rounds, share joins, frontier expansion) then
    aggregates and joins on the bucket layout with no state-side exchange.
    Idempotent per (sf_dir): skips the build when the table already
    exists unless ``force``. Returns the table name."""
    name = copurchase_table_name(sf_dir)
    if spark.catalog.tableExists(name) and not force:
        return name
    p = copurchase_weighted(spark, sf_dir)
    sym = p.unionByName(
        p.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "n_orders"
        )
    )
    # EXTERNAL table (explicit path under the shared index root): the
    # session catalog is in-memory, so a managed table's leftover
    # warehouse directory from an earlier session would collide; an
    # external path overwrites cleanly and lives beside the other
    # build-once artifacts (served indexes, dedup state).
    root = os.environ.get(
        "SPARK_GRAFT_INDEX_DIR",
        os.path.join(tempfile.gettempdir(), "spark_graft_served_index"),
    )
    (
        sym.write.bucketBy(buckets, "src")
        .sortBy("src")
        .option("path", os.path.join(root, name))
        .mode("overwrite")
        .saveAsTable(name)
    )
    return name
