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
