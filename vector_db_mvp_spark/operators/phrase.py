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
