"""Round-2 curation operators: contamination check, repetition metrics,
tf-idf keywords, corpus top-ngrams, stratified sampling
(operators/textops.py, operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.sampling import stratified_sample
from vector_db_mvp_spark.operators.textops import (
    contamination_check,
    deterministic_split,
    repetition_metrics,
    tfidf_keywords,
    top_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# contamination_check
# ---------------------------------------------------------------------------


def test_contamination_detects_shared_ngram(spark):
    # find a (train, val) id pair under the default split, then give the
    # val doc a 3-gram lifted verbatim from the train doc
    split = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(
            _docs(spark, [(i, "x") for i in range(40)])
        ).collect()
    }
    train_id = next(i for i in sorted(split) if split[i] == "train")
    val_id = next(i for i in sorted(split) if split[i] == "val")
    df = _docs(
        spark,
        [
            (train_id, "the quick brown fox jumps"),
            (val_id, "quick brown fox sat down"),
        ],
    )
    got = {
        r["doc_id"]: r
        for r in contamination_check(df, n=3).collect()
    }
    assert set(got) == {val_id}  # only val docs are audited
    row = got[val_id]
    # val doc has 3 distinct 3-grams; exactly one ("quick brown fox") is in train
    assert row["n_ngrams"] == 3
    assert row["n_contaminated"] == 1
    assert abs(row["contamination_rate"] - round(1 / 3, 6)) < 1e-9


def test_contamination_zero_for_disjoint_and_short_docs(spark):
    split = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(
            _docs(spark, [(i, "x") for i in range(40)])
        ).collect()
    }
    val_ids = [i for i in sorted(split) if split[i] == "val"]
    df = _docs(
        spark,
        [(val_ids[0], "completely fresh unseen words here"), (val_ids[1], "too short")],
    )
    got = {r["doc_id"]: r for r in contamination_check(df, n=3).collect()}
    assert got[val_ids[0]]["n_contaminated"] == 0
    assert got[val_ids[0]]["contamination_rate"] == 0.0
    # doc shorter than n has no n-grams but still appears with zeros
    assert got[val_ids[1]]["n_ngrams"] == 0
    assert got[val_ids[1]]["contamination_rate"] == 0.0


# ---------------------------------------------------------------------------
# repetition_metrics
# ---------------------------------------------------------------------------


def test_repetition_metrics_on_crafted_doc(spark):
    # "a b a b a b": bigrams = [a b, b a, a b, b a, a b] -> 5 total, 2 distinct
    df = _docs(spark, [(1, "a b a b a b")])
    row = repetition_metrics(df).collect()[0]
    assert row["n_bigrams"] == 5
    assert abs(row["dup_bigram_frac"] - round(1 - 2 / 5, 6)) < 1e-9
    assert abs(row["top_bigram_frac"] - round(3 / 5, 6)) < 1e-9
    # trigrams: [a b a, b a b, a b a, b a b] -> 4 total, 2 distinct
    assert abs(row["dup_trigram_frac"] - 0.5) < 1e-9


def test_repetition_metrics_no_repeats_and_short_doc(spark):
    df = _docs(spark, [(1, "all words here differ"), (2, "one")])
    got = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert got[1]["dup_bigram_frac"] == 0.0
    assert got[1]["top_bigram_frac"] == round(1 / 3, 6)  # every bigram unique
    assert got[2]["n_bigrams"] == 0
    assert got[2]["dup_trigram_frac"] == 0.0


# ---------------------------------------------------------------------------
# tfidf_keywords / top_ngrams
# ---------------------------------------------------------------------------


def test_tfidf_ranks_distinctive_terms_first(spark):
    df = _docs(
        spark,
        [
            (1, "common common zebra"),
            (2, "common common common yak"),
            (3, "common common"),
        ],
    )
    got = {
        (r["doc_id"], r["rank"]): r["term"]
        for r in tfidf_keywords(df, top=1).collect()
    }
    # "common" appears in every doc -> idf = ln(1) = 0; unique terms win
    assert got[(1, 1)] == "zebra"
    assert got[(2, 1)] == "yak"
    # doc 3 has only zero-idf terms; rank-1 still exists deterministically
    assert got[(3, 1)] == "common"


def test_top_ngrams_ordering_and_limit(spark):
    df = _docs(spark, [(1, "x y x y"), (2, "x y z"), (3, "p q")])
    rows = top_ngrams(df, n=2, k=2).collect()
    assert [(r["ngram"], r["n_occurrences"]) for r in rows] == [
        ("x y", 3),
        ("p q", 1),  # count-1 ties broken lexically: "p q" first
    ]


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


def test_stratified_sample_quota_and_determinism(spark, sf_dir):
    from vector_db_mvp_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    s1 = stratified_sample(docs, group_col="lang", id_col="doc_id", quota=5)
    sizes = {
        r["lang"]: r["n"]
        for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    orig = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in sizes.items():
        assert n == min(5, orig[lang])
    # bit-stable: second run selects the identical id set
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    s2 = stratified_sample(docs, group_col="lang", id_col="doc_id", quota=5)
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2


def test_stratified_sample_keeps_schema(spark):
    df = spark.createDataFrame(
        [(1, "g1", "t"), (2, "g1", "t"), (3, "g2", "t")],
        "doc_id long, grp string, text string",
    )
    out = stratified_sample(df, group_col="grp", id_col="doc_id", quota=1)
    assert out.columns == df.columns
    assert out.count() == 2


def test_phrase_search_positional_semantics(spark):
    from vector_db_mvp_spark.operators.phrase import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "a b c a b"),        # two matches of "a b"
            (2, "a a a"),            # overlapping "a a": positions 0,1 -> 2
            (3, "b a"),              # reversed order: no match
            (4, "a x b"),            # non-adjacent: no match
            (5, "x a b c y"),        # 3-term phrase match
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(docs, "a b").collect()
    }
    assert got == {1: 2, 5: 1}
    got2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(docs, "a a").collect()
    }
    assert got2 == {2: 2}  # overlapping occurrences count individually
    got3 = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(docs, "a b c").collect()
    }
    assert got3 == {1: 1, 5: 1}


def test_boolean_search_and_not_semantics(spark):
    import pytest

    from vector_db_mvp_spark.operators.phrase import boolean_search

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha"),        # both musts, no not -> hits 3
            (2, "alpha beta gamma"),        # contains the NOT term -> out
            (3, "alpha alpha"),             # missing beta -> out
            (4, "beta"),                    # missing alpha -> out
            (5, "delta epsilon"),           # matches nothing -> out
            (6, "beta alpha"),              # order irrelevant -> hits 2
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["hits"]
        for r in boolean_search(
            docs, must=["alpha", "beta"], must_not=["gamma"]
        ).collect()
    }
    assert got == {1: 3, 6: 2}
    # no must_not: NOT filter vacuous
    got2 = {
        r["doc_id"]: r["hits"]
        for r in boolean_search(docs, must=["alpha", "beta"]).collect()
    }
    assert got2 == {1: 3, 2: 2, 6: 2}
    with pytest.raises(ValueError):
        boolean_search(docs, must=[])
    with pytest.raises(ValueError):
        boolean_search(docs, must=["alpha"], must_not=["alpha"])
