"""Dirichlet query-likelihood retrieval (operators/qlm.py) and multinomial
Naive Bayes classification (operators/nbayes.py) against pure-Python
references with the same pinning."""

from __future__ import annotations

import math

import pytest

from vector_db_mvp_spark.operators.nbayes import nb_predictions
from vector_db_mvp_spark.operators.qlm import ql_dirichlet_scores

MU = 2000.0


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_ql(rows, terms, mu=MU):
    toks = {i: t.lower().strip().split() for i, t in rows}
    c = sum(len(v) for v in toks.values())
    cf = {
        q: sum(v.count(q) for v in toks.values())
        for q in terms
    }
    cf = {q: n for q, n in cf.items() if n > 0}
    k = sum(round(math.log(mu * n / c), 12) for n in cf.values())
    out = {}
    for i, v in toks.items():
        s = k - len(cf) * round(math.log(len(v) + mu), 12)
        for q, n in cf.items():
            tf = v.count(q)
            if tf:
                mup = mu * n / c
                s += round(math.log(tf + mup), 12) - round(math.log(mup), 12)
        out[i] = round(s, 6)
    return out


def test_ql_matches_pure_python(spark):
    rows = [
        (1, "vector join hash stream vector vector"),
        (2, "join join join filler filler filler filler"),
        (3, "nothing matches here at all in this doc"),
        (4, "vector stream"),
    ]
    expect = _py_ql(rows, ["vector", "join", "hash", "stream"])
    got = {
        r.doc_id: r.score
        for r in ql_dirichlet_scores(
            _docs(spark, rows), ["vector", "join", "hash", "stream"]
        ).collect()
    }
    assert got == pytest.approx(expect, abs=2e-6)


def test_ql_unmatched_docs_still_score_by_length(spark):
    """Dirichlet smoothing ranks non-matching docs by length: shorter
    no-match docs beat longer no-match docs."""
    rows = [(1, "x y"), (2, "x y z w q r s t u v"), (3, "vector")]
    got = {
        r.doc_id: (r.n_matched, r.score)
        for r in ql_dirichlet_scores(_docs(spark, rows), ["vector"]).collect()
    }
    assert got[1][0] == 0 and got[2][0] == 0 and got[3][0] == 1
    assert got[3][1] > got[1][1] > got[2][1]


def test_ql_oov_terms_dropped(spark):
    """A query term absent from the corpus contributes nothing (and must
    not produce -inf/NULL scores)."""
    rows = [(1, "vector data"), (2, "other words")]
    got = ql_dirichlet_scores(
        _docs(spark, rows), ["vector", "zzz_not_in_corpus"]
    ).collect()
    assert len(got) == 2
    assert all(r.score is not None for r in got)


def test_ql_all_oov_query_degrades_to_length_only(spark):
    """When EVERY query term is OOV, cf is empty and the K sum would be
    NULL; the score must degrade to the length-only term (here 0 matched
    terms ⇒ score 0 after the _nq=0 cancellation), never NULL."""
    rows = [(1, "vector data"), (2, "other words entirely different")]
    got = {
        r.doc_id: (r.n_matched, r.score)
        for r in ql_dirichlet_scores(
            _docs(spark, rows), ["zzz_oov", "qqq_oov"]
        ).collect()
    }
    assert got[1] == (0, 0.0) and got[2] == (0, 0.0)


def _labeled(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_nb_classifies_separable_corpus(spark):
    train = [
        (0, "en", "the cat sat on the mat"),
        (2, "en", "the dog ran in the park"),
        (4, "fr", "le chat est sur le tapis"),
        (6, "fr", "le chien court dans le parc"),
    ]
    test = [
        (1, "en", "the cat ran"),
        (3, "fr", "le chat court"),
        (5, "en", "the dog sat on the mat"),
    ]
    got = {
        r.doc_id: r.predicted
        for r in nb_predictions(_labeled(spark, train), _labeled(spark, test)).collect()
    }
    assert got == {1: "en", 3: "fr", 5: "en"}


def test_nb_matches_pure_python_scores(spark):
    train = [
        (0, "a", "x x y"),
        (2, "a", "x z"),
        (4, "b", "y y z z z"),
    ]
    test = [(1, "a", "x y z unseen")]
    # pure-python reference with identical pinning
    from collections import Counter

    cw: dict[str, Counter] = {"a": Counter(), "b": Counter()}
    for _, l, t in train:
        cw[l].update(t.split())
    vocab = len({w for c in cw.values() for w in c})
    n_docs = Counter(l for _, l, _ in train)
    n_all = len(train)
    toks = test[0][2].split()
    nd = len(toks)
    best = None
    for l in sorted(cw):
        tot = sum(cw[l].values())
        s = round(math.log(n_docs[l] / n_all), 12) - nd * round(
            math.log(tot + vocab), 12
        )
        for w, n in Counter(toks).items():
            if cw[l][w]:
                s += n * round(math.log(cw[l][w] + 1), 12)
        if best is None or s > best[1]:
            best = (l, s)
    r = nb_predictions(_labeled(spark, train), _labeled(spark, test)).collect()[0]
    assert r.predicted == best[0]
    assert r.score == pytest.approx(round(best[1], 6), abs=2e-6)


def test_nb_all_oov_falls_back_to_prior_and_length(spark):
    """A test doc sharing no vocabulary with training still gets a
    deterministic prediction (prior + length terms only)."""
    train = [(0, "a", "x x x"), (2, "a", "x y"), (4, "b", "z w")]
    test = [(1, "b", "unseen words only")]
    r = nb_predictions(_labeled(spark, train), _labeled(spark, test)).collect()
    assert len(r) == 1 and r[0].predicted in ("a", "b")
