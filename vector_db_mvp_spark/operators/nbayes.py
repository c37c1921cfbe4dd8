"""Multinomial Naive Bayes text classification as a pure DataFrame
program — train and apply in one declarative plan, with an exact unrolled
SQL twin. The LLM-pipeline use case: cheap supervised labeling (language,
domain, quality tier) at corpus scale, the step after the heuristic
n-gram language ID (operators/textops.py) when weak labels exist.

Semantics (classic Laplace-smoothed multinomial NB):
  score(d, l) = log P(l) + Σ_{w ∈ d} n_w(d) · log( (c(w,l) + 1) / (tot_l + V) )

computed postings-first via the identity

  score(d, l) = log P(l) − N_d·log(tot_l + V) + Σ_{w: c(w,l)>0} n_w(d)·log(c(w,l) + 1)

(the +1-smoothed zero-count terms contribute log(1) = 0, so the token
join touches ONLY (word, lang) pairs seen in training — postings-sized,
never |test tokens| × |langs|).

Scale design (100 TB corpus): the model is two aggregates over the
training split (per-(lang, word) counts and per-lang totals — one
shuffle each, map-side combined); V and priors are tiny broadcast
scalars; applying is one exploded-token aggregation per test doc joined
against the model on (word, lang). Model size is |vocab|·|langs| — for
web-scale vocabularies the production knob is a min-count vocabulary
floor; the gate instance keeps the full vocab so the oracle is exact.

Determinism contract: every log() is rounded to 12 decimals entering a
sum; weighted sums are exact decimal(38,12); argmax ties break to the
lexicographically first label on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

D3812 = "decimal(38,12)"


def _tok_counts(df: DataFrame, keys: list[str], text_col: str) -> DataFrame:
    return (
        df.select(*keys, F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy(*keys, "w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def nb_model(
    train: DataFrame,
    *,
    label_col: str = "lang",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Train the model: returns (base, model) frames —
    base = (_l, _logprior, _logden) one row per label;
    model = (_l, w, _logc) postings, one row per (label, training word).
    Both carry only 12-pinned decimals, so they serialize exactly
    (publish-once/serve-many: :func:`publish_nb_model`)."""
    tr = _tok_counts(train, [label_col], text_col).localCheckpoint(eager=True)
    # Per-lang token totals and the global training vocabulary size.
    tot = tr.groupBy(label_col).agg(F.sum("n").cast("long").alias("tot"))
    vocab = tr.select("w").distinct().agg(F.count(F.lit(1)).cast("long").alias("v"))
    priors = train.groupBy(label_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    n_train = train.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    # Per-lang base pieces: log prior and log(tot_l + V), both 12-pinned.
    base = (
        tot.join(priors, label_col)
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_train))
        .select(
            F.col(label_col).alias("_l"),
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("n_all").cast("double")),
                12,
            )
            .cast(D3812)
            .alias("_logprior"),
            # decimal(18,12): narrow enough that N_d (decimal(9,0)) times
            # this stays exact at scale 12 — a (38,12)x(38,12) multiply
            # would silently drop to scale 6 under Spark's
            # precision-loss rule.
            F.round(
                F.log((F.col("tot") + F.col("v")).cast("double")), 12
            )
            .cast("decimal(18,12)")
            .alias("_logden"),
        )
    )
    # Model postings: log(c(w,l) + 1), 12-pinned.
    model = tr.select(
        F.col(label_col).alias("_l"),
        "w",
        F.round(F.log((F.col("n") + 1).cast("double")), 12)
        .cast("decimal(18,12)")
        .alias("_logc"),
    )
    return base, model


def nb_score(
    test: DataFrame,
    base: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained model: returns (id_col, predicted, score, margin)
    — argmax label, its log-score (rounded to 6), and the margin over
    the runner-up label (the standard low-confidence routing signal;
    exact decimal difference, rounded to 6). Postings-only evidence
    join; per-doc windows are tiny (|labels| rows)."""
    te = _tok_counts(test, [id_col], text_col).localCheckpoint(eager=True)
    n_d = te.groupBy(id_col).agg(F.sum("n").cast("long").alias("_nd"))
    # Matched-token evidence per (doc, lang): postings join on w.
    ev = (
        te.join(model, "w")
        .groupBy(id_col, "_l")
        .agg(
            F.sum(F.col("n").cast("decimal(9,0)") * F.col("_logc"))
            .cast(D3812)
            .alias("_ev")
        )
    )
    scored = (
        n_d.crossJoin(F.broadcast(base))
        .join(ev, [id_col, "_l"], "left")
        .select(
            id_col,
            "_l",
            (
                F.col("_logprior")
                - F.col("_nd").cast("decimal(9,0)") * F.col("_logden")
                + F.coalesce(F.col("_ev"), F.lit(0).cast(D3812))
            ).alias("_score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_score"), F.asc("_l"))
    ranked = scored.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_next", F.lead("_score").over(w)
    )
    return ranked.filter(F.col("_rk") == 1).select(
        id_col,
        F.col("_l").alias("predicted"),
        F.round(F.col("_score").cast("double"), 6).alias("score"),
        F.round(
            (F.col("_score") - F.coalesce(F.col("_next"), F.col("_score")))
            .cast("double"),
            6,
        ).alias("margin"),
    )


def publish_nb_model(
    base: DataFrame, model: DataFrame, path: str
) -> None:
    """Persist a trained model (build-once/serve-many — the
    operators/served.py contract applied to a classifier): two parquet
    frames of 12-pinned decimals, exact through the round-trip."""
    import os

    base.write.mode("overwrite").parquet(os.path.join(path, "base"))
    model.write.mode("overwrite").parquet(os.path.join(path, "model"))


def load_nb_model(spark, path: str) -> tuple[DataFrame, DataFrame]:
    import os

    return (
        spark.read.parquet(os.path.join(path, "base")),
        spark.read.parquet(os.path.join(path, "model")),
    )


def nb_predictions(
    train: DataFrame,
    test: DataFrame,
    *,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train multinomial NB on ``train`` and classify ``test``.
    Returns (id_col, label_col, predicted, score) — one row per test doc
    with its true label, argmax label, and the winning log-score
    (rounded to 6). Composition of :func:`nb_model` + :func:`nb_score`."""
    base, model = nb_model(train, label_col=label_col, text_col=text_col)
    best = nb_score(test, base, model, id_col=id_col, text_col=text_col)
    truth = test.select(id_col, label_col)
    return best.join(truth, id_col).select(
        id_col, label_col, "predicted", "score"
    )


def sql_nb_predictions(
    *,
    train_where: str,
    test_where: str,
    toks_expr: str,
    label_col: str = "lang",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB mirror of :func:`nb_predictions`. ``train_where`` /
    ``test_where`` are predicates splitting ``table``; ``toks_expr`` is
    the house tokenizer SQL."""
    return f"""
WITH tr AS (
  SELECT {label_col} AS l, w, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT {label_col}, unnest({toks_expr}) AS w
        FROM {table} WHERE {train_where})
  WHERE w <> '' GROUP BY 1, 2
),
tot AS (SELECT l, CAST(SUM(n) AS BIGINT) AS tot FROM tr GROUP BY 1),
vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tr),
priors AS (
  SELECT {label_col} AS l, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM {table} WHERE {train_where} GROUP BY 1
),
n_train AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all
            FROM {table} WHERE {train_where}),
base AS (
  SELECT tot.l,
         CAST(round(ln(CAST(p.n_docs AS DOUBLE) / CAST(n_train.n_all AS DOUBLE)), 12)
              AS DECIMAL(38,12)) AS logprior,
         CAST(round(ln(CAST(tot.tot + vocab.v AS DOUBLE)), 12)
              AS DECIMAL(18,12)) AS logden
  FROM tot JOIN priors p ON tot.l = p.l
  CROSS JOIN vocab CROSS JOIN n_train
),
model AS (
  SELECT l, w,
         CAST(round(ln(CAST(n + 1 AS DOUBLE)), 12) AS DECIMAL(18,12)) AS logc
  FROM tr
),
te AS (
  SELECT {id_col}, w, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT {id_col}, unnest({toks_expr}) AS w
        FROM {table} WHERE {test_where})
  WHERE w <> '' GROUP BY 1, 2
),
n_d AS (SELECT {id_col}, CAST(SUM(n) AS BIGINT) AS nd FROM te GROUP BY 1),
ev AS (
  SELECT te.{id_col}, m.l,
         CAST(SUM(CAST(te.n AS DECIMAL(9,0)) * m.logc) AS DECIMAL(38,12)) AS ev
  FROM te JOIN model m ON te.w = m.w
  GROUP BY 1, 2
),
scored AS (
  SELECT n_d.{id_col}, base.l,
         base.logprior
         - CAST(n_d.nd AS DECIMAL(9,0)) * base.logden
         + COALESCE(ev.ev, CAST(0 AS DECIMAL(38,12))) AS score
  FROM n_d CROSS JOIN base
  LEFT JOIN ev ON ev.{id_col} = n_d.{id_col} AND ev.l = base.l
),
best AS (
  SELECT {id_col}, l, score,
         ROW_NUMBER() OVER (PARTITION BY {id_col}
                            ORDER BY score DESC, l ASC) AS rk
  FROM scored
)
SELECT b.{id_col}, t.{label_col}, b.l AS predicted,
       round(CAST(b.score AS DOUBLE), 6) AS score
FROM best b
JOIN (SELECT {id_col}, {label_col} FROM {table} WHERE {test_where}) t
  ON b.{id_col} = t.{id_col}
WHERE b.rk = 1
"""
