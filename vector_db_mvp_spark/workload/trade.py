"""The shared customer<->supplier trade edge build.

Three graph queries (supplier_pagerank, supplier_ppr, trade_hits) run
over the SAME bipartite graph — customer c traded with supplier s when
some order of c contains a lineitem of s — and the decade probes show
the lineitem ⋈ orders edge build dominating all of them (trade_hits
5.07x, supplier_ppr 7.85x are the edge-build IO band). This module is
the single definition, the workload/copurchase.py consolidation applied
to the trade family.

Shape: distinct on the RAW INT key pair first (the shuffle carries two
longs, not two ~8-char strings — measured 1.65 s -> 1.05 s at sf0.1 when
this was first done inside q_supplier_pagerank), then stringify with
disjoint prefixes ('c'/'s'): prefixed-concat is injective on the key
pair, and the prefixes make the symmetrized union distinct BY
CONSTRUCTION (a 'c…'->'s…' edge can never collide with its 's…'->'c…'
mirror), so consumers pass assume_distinct and skip the edge-dedup
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table


def trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct directed (src='c<custkey>', dst='s<suppkey>') pairs —
    the bipartite customer->supplier edge list (HITS consumes this
    orientation directly)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )


def trade_edges_symmetric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized distinct (src, dst) — the undirected walk graph the
    PageRank family consumes. Distinct by construction (disjoint 'c'/'s'
    prefixes), so callers pass assume_distinct=True."""
    p = trade_pairs(spark, sf_dir)
    return p.unionAll(
        p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
