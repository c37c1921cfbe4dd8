"""Positional-index phrase search: exact multi-word phrase matching.

BM25 (operators/bm25.py) ranks by bag-of-words relevance; a search surface
also needs EXACT phrase queries ("value table" as consecutive words, not
co-occurrence). The classic engine structure is a positional inverted
index: postings of (doc, position) per term, phrase matches found by
intersecting term postings with aligned offsets — term k's postings
shifted by -k, then equi-joined on (doc, position).

Spark realization: one tokenize pass (posexplode — positions for free),
a disjunctive term filter that keeps ONLY the phrase's terms (the
inverted-index prune: postings lists, not the corpus, enter the joins),
then len(phrase)-1 equi-joins keyed on (doc, shifted position). Each join
is posting-list-sized — for realistic phrases orders of magnitude smaller
than the corpus — and keyed by high-cardinality (doc, pos), so the plan
is skew-free and never quadratic. Occurrences per doc fall out of the
final groupBy count.

At 100 TB the tokenize pass dominates; a served deployment would persist
the filtered postings like operators/served.py persists LSH codes —
the join topology here is unchanged by that swap.

Reference capability anchor: the reference's keyword search surface
(search_service.py substring path); this is its positional generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phrase_search(
    docs: DataFrame,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = " ",
) -> DataFrame:
    """(id, n_occurrences) for every document containing ``phrase`` as
    consecutive tokens (``text`` split on ``delimiter``). Overlapping
    occurrences count individually (positional semantics)."""
    terms = phrase.split()
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delimiter)).alias("pos", "tok"),
    ).filter(F.col("tok").isin(terms))  # inverted-index prune
    acc = (
        toks.filter(F.col("tok") == terms[0])
        .select(F.col(id_col), F.col("pos"))
    )
    for k, term in enumerate(terms[1:], start=1):
        nxt = toks.filter(F.col("tok") == term).select(
            F.col(id_col), (F.col("pos") - k).alias("pos")
        )
        acc = acc.join(nxt, [id_col, "pos"])
    return acc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def boolean_search(
    docs: DataFrame,
    must: list[str],
    must_not: list[str] = (),
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boolean keyword retrieval: documents containing EVERY ``must`` term
    and NONE of the ``must_not`` terms, with the total occurrence count of
    the must terms as a ranking signal — the classic inverted-index
    AND/NOT query (the retrieval primitive under BM25's scoring, see
    operators/bm25.py; reference capability anchor: search_service.py's
    metadata-filtered retrieval, the text-side analog).

    Plan: one token explode pruned to the query's terms (postings-sized,
    never corpus-sized — the phrase_search prune), one per-doc conditional
    aggregation, one filter. A doc with must terms but no must_not rows
    aggregates their counts to 0, so NOT needs no anti-join; docs matching
    nothing never enter the aggregation at all.
    """
    must = list(must)
    must_not = list(must_not)
    if not must:
        raise ValueError("boolean_search: at least one must term required")
    overlap = set(must) & set(must_not)
    if overlap:
        raise ValueError(f"boolean_search: terms both must and must_not: {overlap}")
    from ..functions.text import tokens

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok").isin(must + must_not))
    counts = toks.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"_c{i}")
            for i, t in enumerate(must)
        ],
        F.sum(
            F.when(F.col("tok").isin(must_not), 1).otherwise(0)
            if must_not
            else F.lit(0)
        ).alias("_cnot"),
    )
    keep = F.col("_cnot") == 0
    hits = None
    for i in range(len(must)):
        keep = keep & (F.col(f"_c{i}") > 0)
        hits = F.col(f"_c{i}") if hits is None else hits + F.col(f"_c{i}")
    return counts.filter(keep).select(
        F.col(id_col), hits.cast("long").alias("hits")
    )


def proximity_search(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    window: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NEAR/k retrieval: documents where ``term_a`` and ``term_b`` occur
    within ``window`` token positions of each other, with the qualifying
    pair count and the minimum distance as ranking signals — the classic
    proximity operator between exact phrase (distance == fixed offsets)
    and boolean AND (distance == anywhere).

    Plan: one tokenize pass pruned to the two query terms (postings-sized,
    the phrase_search prune), then the positions band-join via the
    range_join_events bin trick — term A's postings explode into the
    {b-1, b, b+1} bins of width ``window`` and equi-join term B's single
    bin on (doc, bin), so the join stays hash-keyed on high-cardinality
    keys at ANY posting density (a raw |posA − posB| <= w theta-join would
    be a per-doc nested loop). Each qualifying position pair is emitted
    exactly once (B's bin is unique). At 100 TB the tokenize pass
    dominates, as with phrase_search.
    """
    if window < 1:
        raise ValueError("proximity_search: window must be >= 1")
    if term_a == term_b:
        raise ValueError("proximity_search: terms must differ")
    from ..functions.text import tokens

    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    ).filter(F.col("tok").isin([term_a, term_b]))
    pa = toks.filter(F.col("tok") == term_a).select(
        F.col(id_col), F.col("pos").alias("pa")
    )
    pb = toks.filter(F.col("tok") == term_b).select(
        F.col(id_col), F.col("pos").alias("pb")
    )
    w = F.lit(window)

    def _bin(c):
        # floor BEFORE the integer cast: a plain cast truncates toward
        # zero, mis-binning positions below the window width.
        return F.floor(c / w).cast("long")

    pa_binned = pa.withColumn(
        "_bin",
        F.explode(
            F.array_distinct(
                F.array(
                    _bin(F.col("pa") - w), _bin(F.col("pa")), _bin(F.col("pa") + w)
                )
            )
        ),
    )
    pb_binned = pb.withColumn("_bin", _bin(F.col("pb")))
    # No distinct needed: B carries ONE bin per posting and A's bins are
    # array_distinct-ed, so each qualifying (pa, pb) pair joins exactly once.
    pairs = (
        pa_binned.join(pb_binned, [id_col, "_bin"])
        .filter(F.abs(F.col("pa") - F.col("pb")) <= w)
        .select(id_col, "pa", "pb")
    )
    return pairs.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min(F.abs(F.col("pa") - F.col("pb"))).cast("long").alias("min_distance"),
    )
