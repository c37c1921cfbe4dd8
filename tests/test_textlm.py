"""Unit semantics for the two substring/LM text operators:

- dup_span_metrics (operators/textops.py): cross-doc duplicated n-gram
  marking + exact interval-union coverage.
- lm_score (operators/textops.py): corpus-fit add-alpha bigram LM scoring.

Both also carry full DuckDB oracles (`duplicated_spans`, `lm_perplexity`)
via tests/test_queries_oracle.py; here the math is pinned on hand-built
corpora where expected values are computable by hand.
"""

from __future__ import annotations

import math

import pytest

from vector_db_mvp_spark.operators.textops import dup_span_metrics, lm_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestDupSpans:
    def test_identical_docs_fully_covered(self, spark):
        text = " ".join(f"w{i}" for i in range(12))  # 12 tokens, 5 8-grams
        got = _by_id(dup_span_metrics(_docs(spark, [(1, text), (2, text)]), n=8))
        for d in (1, 2):
            assert got[d]["n_tokens"] == 12
            assert got[d]["n_ngrams"] == 5
            assert got[d]["dup_ngrams"] == 5
            # intervals [0,8)..[4,12) union to [0,12)
            assert got[d]["covered_tokens"] == 12
            assert got[d]["covered_frac"] == 1.0

    def test_unique_doc_zero_coverage(self, spark):
        a = " ".join(f"a{i}" for i in range(10))
        b = " ".join(f"b{i}" for i in range(10))
        got = _by_id(dup_span_metrics(_docs(spark, [(1, a), (2, b)]), n=8))
        assert got[1]["dup_ngrams"] == 0
        assert got[1]["covered_tokens"] == 0
        assert got[1]["dup_ngram_frac"] == 0.0

    def test_intra_doc_repeat_not_counted(self, spark):
        # the same 8-gram twice WITHIN one doc is not a cross-doc dup
        run = " ".join(f"w{i}" for i in range(8))
        text = run + " X " + run
        got = _by_id(dup_span_metrics(_docs(spark, [(1, text)]), n=8))
        assert got[1]["dup_ngrams"] == 0

    def test_short_doc_null_fraction(self, spark):
        got = _by_id(dup_span_metrics(_docs(spark, [(1, "only three tokens")]), n=8))
        assert got[1]["n_tokens"] == 3
        assert got[1]["n_ngrams"] == 0
        assert got[1]["dup_ngram_frac"] is None
        assert got[1]["covered_tokens"] == 0

    def test_partial_overlap_interval_union(self, spark):
        # doc1 = 16 unique tokens with tokens 4..11 shared with doc2 ->
        # exactly one dup 8-gram at pos 4, covering [4,12) = 8 tokens.
        shared = [f"s{i}" for i in range(8)]
        d1 = [f"p{i}" for i in range(4)] + shared + [f"q{i}" for i in range(4)]
        d2 = [f"x{i}" for i in range(3)] + shared + [f"y{i}" for i in range(3)]
        got = _by_id(
            dup_span_metrics(_docs(spark, [(1, " ".join(d1)), (2, " ".join(d2))]), n=8)
        )
        assert got[1]["dup_ngrams"] == 1
        assert got[1]["covered_tokens"] == 8
        assert got[1]["covered_frac"] == 0.5
        assert got[2]["covered_tokens"] == 8


class TestLmScore:
    def test_single_token_doc_null_scores(self, spark):
        got = _by_id(lm_score(_docs(spark, [(1, "hello"), (2, "a b a b")])))
        assert got[1]["n_bigrams"] == 0
        assert got[1]["mean_nll"] is None and got[1]["ppl"] is None
        assert got[2]["n_bigrams"] == 3

    def test_hand_computed_probabilities(self, spark):
        # corpus: doc1 "a b a", doc2 "a b"
        # bigrams: (a,b)x2, (b,a)x1 ; histories: a->2, b->1 ; V=2, alpha=.5
        got = _by_id(lm_score(_docs(spark, [(1, "a b a"), (2, "a b")])))
        p_ab = (2 + 0.5) / (2 + 0.5 * 2)
        p_ba = (1 + 0.5) / (1 + 0.5 * 2)
        q = lambda p: round(-math.log(p), 9)
        exp1 = round((q(p_ab) + q(p_ba)) / 2, 6)
        exp2 = round(q(p_ab) / 1, 6)
        assert got[1]["mean_nll"] == pytest.approx(exp1, abs=1e-9)
        assert got[2]["mean_nll"] == pytest.approx(exp2, abs=1e-9)
        assert got[2]["ppl"] == pytest.approx(round(math.exp(exp2), 6), abs=1e-9)

    def test_repetitive_doc_scores_lower_nll(self, spark):
        # a doc made of one repeated bigram is far more predictable than a
        # doc of one-off transitions — the quality-filter signal.
        rep = " ".join(["yes no"] * 20)
        rare = " ".join(f"t{i}" for i in range(40))
        got = _by_id(lm_score(_docs(spark, [(1, rep), (2, rare)])))
        assert got[1]["mean_nll"] < got[2]["mean_nll"]


class TestDsirWeights:
    def test_target_lookalikes_score_higher(self, spark):
        from vector_db_mvp_spark.operators.textops import dsir_weights

        # target distribution is dominated by 'alpha beta'; doc 1 matches
        # it, doc 2 is disjoint vocabulary -> w(doc1) > w(doc2)
        docs = spark.createDataFrame(
            [
                (1, "alpha beta alpha beta"),
                (2, "gamma delta gamma delta"),
                (3, "alpha beta alpha beta"),  # the 'target' member
            ],
            "doc_id long, text string",
        )
        target = docs.filter("doc_id = 3")
        got = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_weights(docs, target, buckets=64).collect()
        }
        assert got[1] > got[2]
        assert got[1] == got[3]  # identical text, identical weight

    def test_weight_is_sum_of_token_log_ratios(self, spark):
        import math

        from vector_db_mvp_spark.operators.textops import dsir_weights

        docs = spark.createDataFrame(
            [(1, "x x y"), (2, "x y")], "doc_id long, text string"
        )
        target = docs.filter("doc_id = 2")
        B, a = 64, 0.5
        # raw: x->3, y->2 (5 tokens); target: x->1, y->1 (2 tokens)
        def q(ct, cr):
            return round(
                math.log((ct + a) / (2 + a * B)) - math.log((cr + a) / (5 + a * B)),
                9,
            )

        got = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_weights(docs, target, buckets=B).collect()
        }
        assert got[1] == pytest.approx(2 * q(1, 3) + q(1, 2), abs=1e-9)
        assert got[2] == pytest.approx(q(1, 3) + q(1, 2), abs=1e-9)
