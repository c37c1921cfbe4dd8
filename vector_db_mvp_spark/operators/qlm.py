"""Query-likelihood language-model retrieval with Dirichlet smoothing
(Zhai & Lafferty, SIGIR'01) — the probabilistic-IR companion to Okapi
BM25 (operators/bm25.py). The reference engine serves vector top-k only;
a production retrieval stack pairs dense search with lexical rankers,
and QL-Dirichlet is the standard second lexical family beside BM25.

score(d) = Σ_{q∈Q} log( (tf(q,d) + μ·p(q|C)) / (|d| + μ) )

rewritten postings-first:

score(d) = K  −  |Q|·log(|d| + μ)  +  Σ_{q: tf(q,d)>0} [ log(tf + μ·p_q) − log(μ·p_q) ]
with K = Σ_q log(μ·p_q)   (doc-independent).

so the per-document work is (a) one length term and (b) adjustments ONLY
for (doc, term) pairs that actually match — the same map-side-pruned
exploded-token stream as BM25: for a q-term query ~all tokens are
discarded before any shuffle, the aggregation moves O(q · matching docs)
rows, and docs matching nothing still rank (purely by length, as
Dirichlet smoothing dictates) without ever being joined.

Determinism contract (driver hash-compare vs DuckDB): every log() is
rounded to 12 decimals at the point it enters a sum, sums are
decimal(38,12) (exact, order-independent), the final score is rounded
to 6. Query terms absent from the corpus (p_q = 0) are dropped — the
OOV convention of smoothed LM rankers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def ql_dirichlet_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mu: float = 2000.0,
) -> DataFrame:
    """Per-document Dirichlet query-likelihood score for ``query_terms``.
    Returns (id_col, n_matched, score) for EVERY document — smoothing
    scores all of them; ``n_matched`` is the number of distinct query
    terms present. Score rounded to 6 decimals."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    d3812 = "decimal(38,12)"
    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.col("_toks"),
        F.size("_toks").cast("long").alias("_dl"),
    )
    doc_len = toks.select(id_col, "_dl").localCheckpoint(eager=True)

    terms = F.array(*[F.lit(t) for t in query_terms])
    matched = (
        toks.select(F.col(id_col), F.explode("_toks").alias("term"))
        .filter(F.array_contains(terms, F.col("term")))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("_tf"))
        .localCheckpoint(eager=True)  # feeds cf, the adj join, n_matched
    )

    # Corpus stats: |C| over all tokens; cf only for the (pre-pruned)
    # query terms. p_q = cf/|C| is one deterministic double division.
    c_tot = doc_len.agg(F.sum("_dl").cast("double").alias("_c"))
    cf = (
        matched.groupBy("term")
        .agg(F.sum("_tf").cast("double").alias("_cf"))
        .crossJoin(F.broadcast(c_tot))
        .select(
            "term",
            (F.lit(mu) * F.col("_cf") / F.col("_c")).alias("_mup"),
        )
    )

    # K = Σ_q log(μ·p_q): |Q|-row exact decimal sum, one broadcast scalar;
    # n_terms counts only in-corpus terms (OOV dropped).
    qconst = cf.agg(
        F.sum(F.round(F.log("_mup"), 12).cast(d3812)).cast(d3812).alias("_k"),
        F.count(F.lit(1)).cast("long").alias("_nq"),
    )

    adj = (
        matched.join(F.broadcast(cf), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum(
                (
                    F.round(F.log(F.col("_tf").cast("double") + F.col("_mup")), 12)
                    - F.round(F.log("_mup"), 12)
                ).cast(d3812)
            )
            .cast(d3812)
            .alias("_adj"),
        )
    )

    return (
        doc_len.join(adj, id_col, "left")
        .crossJoin(F.broadcast(qconst))
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias("n_matched"),
            F.round(
                (
                    # _k is a SUM over cf: if EVERY query term is OOV, cf is
                    # empty and the sum is NULL — coalesce to 0 so the score
                    # degrades to the length-only term (OOV-drop convention)
                    # instead of going NULL across the whole corpus.
                    F.coalesce(F.col("_k"), F.lit(0).cast(d3812))
                    + F.coalesce(F.col("_adj"), F.lit(0).cast(d3812))
                    # narrow factors: decimal(6,0) x decimal(18,12) keeps
                    # the product at scale 12 exactly (a (38,12)x(38,12)
                    # multiply would silently drop to scale 6 under
                    # Spark's precision-loss rule)
                    - F.col("_nq").cast("decimal(6,0)")
                    * F.round(
                        F.log(F.col("_dl").cast("double") + F.lit(mu)), 12
                    ).cast("decimal(18,12)")
                ).cast("double"),
                6,
            ).alias("score"),
        )
    )


def sql_ql_dirichlet_scores(
    query_terms: list[str],
    *,
    toks_expr: str,
    id_col: str = "doc_id",
    table: str = "documents",
    mu: float = 2000.0,
) -> str:
    """DuckDB mirror of :func:`ql_dirichlet_scores`. ``toks_expr`` is the
    house tokenizer SQL over ``table``'s text column."""
    from ..sqltext import sql_str

    term_list = ", ".join(sql_str(t) for t in query_terms)
    return f"""
WITH toks AS (
  SELECT {id_col}, {toks_expr} AS t FROM {table}
),
doc_len AS (SELECT {id_col}, CAST(len(t) AS BIGINT) AS dl FROM toks),
matched AS (
  SELECT {id_col}, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT {id_col}, unnest(t) AS term FROM toks)
  WHERE term IN ({term_list})
  GROUP BY 1, 2
),
c_tot AS (SELECT CAST(SUM(dl) AS DOUBLE) AS c FROM doc_len),
cf AS (
  SELECT term, {mu} * CAST(SUM(tf) AS DOUBLE) / ANY_VALUE(c_tot.c) AS mup
  FROM matched CROSS JOIN c_tot
  GROUP BY 1
),
qconst AS (
  SELECT CAST(SUM(CAST(round(ln(mup), 12) AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS k,
         CAST(COUNT(*) AS BIGINT) AS nq
  FROM cf
),
adj AS (
  SELECT m.{id_col},
         CAST(COUNT(*) AS BIGINT) AS n_matched,
         CAST(SUM(CAST(round(ln(CAST(m.tf AS DOUBLE) + cf.mup), 12)
                       - round(ln(cf.mup), 12) AS DECIMAL(38,12)))
              AS DECIMAL(38,12)) AS adj
  FROM matched m JOIN cf ON m.term = cf.term
  GROUP BY 1
)
SELECT d.{id_col},
       CAST(COALESCE(a.n_matched, 0) AS BIGINT) AS n_matched,
       round(CAST(q.k
                  + COALESCE(a.adj, CAST(0 AS DECIMAL(38,12)))
                  - CAST(q.nq AS DECIMAL(6,0))
                    * CAST(round(ln(CAST(d.dl AS DOUBLE) + {mu}), 12)
                           AS DECIMAL(18,12))
             AS DOUBLE), 6) AS score
FROM doc_len d
LEFT JOIN adj a ON d.{id_col} = a.{id_col}
CROSS JOIN qconst q
"""
