"""Physical-plan regression tests — the scale contract, checked.

Correctness tests prove WHAT each query returns; these prove HOW. Each
assertion pins a plan property that keeps the query viable at 100 TB:
filters reaching the parquet scan, top-k compiling to TakeOrderedAndProject
(per-partition heap, not a global sort), dimension joins broadcasting (fact
table never shuffles for them), and aggregates running partial-before-
exchange. A regression here is a performance bug even when results stay
correct."""

from __future__ import annotations

import pytest

from vector_db_mvp_spark.workload import QUERIES


def plan_of(spark, name, sf_dir, mode="formatted"):
    df = QUERIES[name](spark, sf_dir)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    # Other test modules may have .cache()d fixture tables; a cached relation
    # plans as InMemoryTableScan and hides the parquet scan these tests probe.
    spark.catalog.clearCache()
    cache: dict[str, str] = {}

    def get(name: str) -> str:
        if name not in cache:
            cache[name] = plan_of(spark, name, sf_dir)
        return cache[name]

    return get


def test_filter_pushdown_reaches_scan(plans):
    """Predicates must appear as PushedFilters on the parquet scan, not as
    post-scan Filter-only nodes — at 100 TB this is row-group pruning."""
    assert "LessThanOrEqual(l_shipdate" in plans("pricing_summary")
    assert "EqualTo(o_orderkey,42)" in plans("point_lookup")
    assert "EqualTo(c_mktsegment,BUILDING)" in plans("top_revenue_orders")
    assert "IsNotNull(embedding)" in plans("topk_cosine_brute")


def test_topk_is_take_ordered_not_global_sort(plans):
    """ORDER BY score DESC LIMIT k must compile to TakeOrderedAndProject
    (O(N log k), no shuffle of N rows) — the reference full-sorts then
    slices (brute_force.py:45-47); regressing to a global Sort would too."""
    for q in ["topk_cosine_brute", "topk_cosine_k100", "lsh_topk", "top_revenue_orders"]:
        assert "TakeOrderedAndProject" in plans(q), q


def test_star_joins_broadcast(plans):
    """Dimension joins broadcast: the fact side must never shuffle for them."""
    assert "BroadcastHashJoin" in plans("top_revenue_orders")
    assert "BroadcastHashJoin" in plans("region_nation_revenue")
    # anti join against the filtered orders side also broadcasts locally
    p = plans("customers_without_orders")
    assert "Anti" in p and "SortMergeJoin" not in p


def test_aggregate_is_partial_then_final(plans):
    """Declarative aggs give map-side partial aggregation: >=2 HashAggregate
    nodes (partial + final) around one exchange — the shuffle carries groups,
    not rows."""
    p = plans("pricing_summary")
    assert p.count("HashAggregate") >= 2


def test_column_pruning(plans):
    """The scan must read only referenced columns (ReadSchema pruned):
    pricing_summary touches 6 of lineitem's 16 columns."""
    p = plans("pricing_summary")
    read = next(line for line in p.splitlines() if "ReadSchema" in line)
    assert "l_comment" not in read and "l_partkey" not in read
    assert "l_quantity" in read


def test_whole_stage_codegen_on_hot_path(spark, sf_dir):
    """Score/filter/agg expressions must run inside whole-stage codegen
    spans (JVM, no Python in the loop). AQE hides codegen markers from the
    formatted/simple modes, so ask the codegen explain directly."""
    for q in ["pricing_summary", "topk_cosine_brute"]:
        p = plan_of(spark, q, sf_dir, mode="codegen")
        assert "WholeStageCodegen" in p, q


def test_batch_lsh_single_hash_pass_per_side(spark, sf_dir):
    """Regression for the withColumn+posexplode re-inlining pathology: the
    code-hash UDF must run ONCE per side (corpus, queries) — materializing
    the codes column before exploding made Catalyst evaluate it twice per
    row (2x Arrow transfer of the whole corpus). Simple mode: one mention
    per physical node (formatted lists each node twice)."""
    plan = plan_of(spark, "lsh_batch_topk", sf_dir, mode="simple")
    assert plan.count("ArrowEvalPython") == 2  # one per side, not two
    # tiny query side broadcasts; the corpus never shuffles for the join
    assert "BroadcastHashJoin" in plan


def test_served_index_reads_precomputed_codes(plans):
    """The served ANN path must read lsh_codes off the parquet scan — no
    query-time hashing of any kind."""
    plan = plans("lsh_topk_served")
    assert "ArrowEvalPython" not in plan
    scan = plan[plan.index("Scan parquet"):]
    assert "lsh_codes" in scan


def test_asof_and_range_joins_never_nested_loop(spark, sf_dir):
    """The as-of join compiles to union+window (no join node at all) and the
    range join to an equi hash join on time bins — neither may degrade to
    CartesianProduct / BroadcastNestedLoopJoin, the O(N*M) shapes that are
    instant death at 100 TB."""
    for q in ("asof_purchase_view", "range_join_events"):
        plan = plan_of(spark, q, sf_dir, mode="simple")
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q
    range_plan = plan_of(spark, "range_join_events", sf_dir, mode="simple")
    assert "BroadcastHashJoin" in range_plan  # bin-key equi join carries the range predicate


def test_q7_shape_broadcasts_both_dimension_chains(plans):
    """nation_trade_volume routes the fact row through TWO dimension chains
    (supplier->nation, customer->nation); both must broadcast — the only
    sort-merge-eligible join is lineitem x orders."""
    p = plans("nation_trade_volume")
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_disjunctive_clause_pushes_per_side_filters(plans):
    """Q19-shape OR of conjuncts: Catalyst must derive per-side disjuncts
    and push them into each scan (PushedFilters with Or), keeping the join
    an equi hash join."""
    p = plans("disjunctive_part_revenue")
    assert "Or(" in p  # pushed disjunction on at least one scan
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_global_scalar_subquery_broadcasts(plans):
    """Q22 shape: the 1-row global average must broadcast (nested-loop on a
    1-row side is fine and expected); the no-orders check stays an anti
    join; customer never cartesian-joins anything bigger than 1 row."""
    p = plans("idle_rich_customers")
    assert "Anti" in p
    assert "CartesianProduct" not in p


def test_minhash_shingling_behind_structural_boundary(spark, sf_dir):
    """dedup_minhash_lsh: shingling must be materialized ONCE behind an eager
    checkpoint. A lazy cache boundary let the size(_sh) filter push down and
    re-inline the whole tokenize+shingle expression below the exchange onto
    one pre-shuffle task — the 3.3 s vs 8.1 s bench flap on identical code.
    After the fix the downstream plan reads the checkpointed RDD and contains
    zero tokenize expressions."""
    plan = plan_of(spark, "dedup_minhash_lsh", sf_dir)
    assert "split(trim(lower(" not in plan  # tokenize ran at checkpoint time
    assert "ExistingRDD" in plan  # consumers scan the checkpointed shingles


def test_spread_tokens_keeps_explicit_parallelism(spark, sf_dir):
    """_spread uses an EXPLICIT partition count: repartition(col) without one
    is an AQE-coalescible exchange, and with the small shuffled bytes AQE
    merged it back to ONE partition — serializing all shingle/hash CPU work
    (the other half of the bench flap). A user-specified count is never
    coalesced; this pins the materialized token checkpoint's partitioning."""
    from vector_db_mvp_spark.operators.dedup import _spread_tokens
    from vector_db_mvp_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = _spread_tokens(docs, "text", "doc_id")
    expected = spark.sparkContext.defaultParallelism
    assert toks.rdd.getNumPartitions() == expected


def test_bm25_prunes_terms_and_heaps_topk(plans):
    """BM25: the query-term prune must exist as a filter (map-side, before
    the (doc,term) aggregate) and the final top-k must be a heap, not a
    global sort. df/corpus-stats joins are broadcast — the tokenized fact
    stream never shuffles for them."""
    p = plans("bm25_search")
    assert "array_contains" in p
    assert "TakeOrderedAndProject" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_kmeans_assignment_is_shuffle_free(spark, sf_dir):
    """The k-means assign step folds the centroid table into one projection:
    no join, no Exchange anywhere in its plan (operators/pq.py ADC
    precedent). The update step may shuffle; the per-row scoring never."""
    from vector_db_mvp_spark.operators.kmeans import assign_clusters
    from vector_db_mvp_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    df = assign_clusters(emb, [[0.0] * 64, [1.0] * 64])
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_copurchase_join_is_equi_not_nested_loop(plans):
    """The basket self-join must bind on the orderkey equality (hash or
    sort-merge by size) — never a nested-loop over all pairs — and the
    final top-30 must be a heap."""
    p = plans("copurchase_pairs")
    assert "NestedLoop" not in p and "Cartesian" not in p
    assert "TakeOrderedAndProject" in p


def test_gapfill_join_is_equi_not_nested_loop(plans):
    p = plans("events_gapfill")
    assert "NestedLoop" not in p and "Cartesian" not in p


def test_triangle_and_skyline_shapes(plans):
    """Wedge join binds on equality (no nested loop); the skyline frontier
    runs the distributed strict-prefix running-min (operators/rank.py):
    the window is partitioned by range bucket — NO single-partition
    exchange anywhere in the plan (the per-price HashAggregate sits behind
    the operator's checkpoint barrier and is exercised by the oracle)."""
    tri = plans("part_triangles")
    assert "NestedLoop" not in tri and "Cartesian" not in tri
    assert "TakeOrderedAndProject" in tri
    sky = plans("parts_skyline")
    assert "Exchange SinglePartition" not in sky
    assert "Window" in sky


def test_scd2_has_no_self_join_or_shuffle_on_dim(plans):
    """SCD2 merge: updates broadcast; the dimension is scanned, never
    sort-merge-joined against itself."""
    p = plans("scd2_customers")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_salted_agg_is_two_phase(plans):
    """The salted aggregation must show BOTH aggregate phases (partial on
    (key, salt), final on key) — collapsing to one groupBy would silently
    drop the skew mitigation."""
    p = plans("salted_event_totals")
    assert p.count("HashAggregate") >= 3  # partial+final per phase


def test_headline_plans_have_no_data_funnel(spark, sf_dir):
    """Fleet-wide funnel check: no headline query may contain an
    ``Exchange SinglePartition`` that is NOT (a) the benign partial->final
    keyless global aggregate (one partial row per partition crosses it at
    any corpus size) or (b) a window over a provably BOUNDED aggregate
    frame, listed here with its bound. New queries that trip this either
    get the two-phase treatment (operators/rank.py) or join the bounded
    list with a justification."""
    bounded = {
        "monthly_growth": "|months| rows after the daily partial agg",
        "revenue_moving_avg": "|days in 1996| rows after the daily agg",
        "revenue_seasonal_decomposition": "|days| rows after the daily agg "
        "(trend + weekday-class windows both run on the aggregated frame)",
        "event_type_dow_chi2": "|event types|x7 contingency frame — the "
        "marginal/N windows and the pinned-order fold all run on it",
        "temperature_mix": "#sources quota frame",
        "char_budget_mix": "#groups water-fill frame (5 langs); the "
        "corpus-sized selection window is keyed by group",
    }
    from bench import HEADLINE

    offenders = {}
    for name in HEADLINE:
        if name in bounded:
            continue
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        lines = plan.splitlines()
        hits = [
            (lines[i - 1] if i else "").strip()[:80]
            for i, l in enumerate(lines)
            if "Exchange SinglePartition" in l
            and "HashAggregate(keys=[]" not in (lines[i - 1] if i else "")
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, offenders
