"""Unit pins for the round-6 additions: BPE merge training (operators/bpe.py)
and water-filling budget mixing (operators/mixing.char_budget_mix). The
oracle-parity leg lives in test_queries_oracle.py; these tests pin the
*semantics* against an independent pure-Python reference and the allocation
invariants the oracle comparison alone cannot explain."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.bpe import bpe_train
from vector_db_mvp_spark.operators.mixing import char_budget_mix
from vector_db_mvp_spark.sources.testdata import load_table


def _ref_bpe(texts, k):
    """Textbook BPE on the word-frequency table (Sennrich 2016), with the
    explicit greedy left-to-right merge scan — deliberately NOT the fold
    formulation the operator uses, so equality checks the equivalence."""
    wc = Counter()
    for t in texts:
        if t is None:
            continue
        wc.update(re.findall("[a-z]+", t.lower()))
    vocab = {w: list(w) for w in wc}
    out = []
    for rank in range(1, k + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        mx = max(pc.values())
        lhs, rhs = min(p for p, c in pc.items() if c == mx)
        out.append((rank, lhs, rhs, mx))
        for w, syms in vocab.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    ns.append(lhs + rhs)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            vocab[w] = ns
    return out


def test_bpe_matches_pure_python_reference(spark):
    texts = [
        "the cat sat on the mat with the hat",
        "The THEME of the theater is theatrical",
        "aaa aaaa banana bandana",  # overlapping-pair greedy cases
        "Hello, world! 123 hello hello",
        None,
        "x",  # 1-char word: no pairs
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    got = [tuple(r) for r in bpe_train(df, k=5).collect()]
    assert got == _ref_bpe(texts, 5)


def test_bpe_greedy_overlap_semantics(spark):
    # 'aaaa' must merge to [aa][aa] (2 uses) and 'aaa' to [aa]a (1 use):
    # pair (a,a) counts 3+2 pre-merge, and round 2 sees (aa,aa) from 'aaaa'.
    df = spark.createDataFrame([(1, "aaa aaaa")], "doc_id int, text string")
    got = [tuple(r) for r in bpe_train(df, k=2).collect()]
    assert got[0] == (1, "a", "a", 5)
    assert got == _ref_bpe(["aaa aaaa"], 2)


def test_char_budget_mix_waterfill_invariants(spark, sf_dir):
    budget = 130_000
    docs = load_table(spark, sf_dir, "documents")
    kept = char_budget_mix(docs, budget=budget, alpha=0.5).collect()
    totals = {
        r["lang"]: r["total"]
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("total")).collect()
    }
    by_lang = {}
    for r in kept:
        g = by_lang.setdefault(r["lang"], {"chars": 0, "alloc": r["alloc_cost"]})
        g["chars"] += r["n_chars"]
    # every language is represented, never over its allocation, and the
    # capped ones (alloc == total corpus) are taken whole
    assert set(by_lang) == set(totals)
    capped = 0
    for lang, g in by_lang.items():
        assert g["chars"] <= g["alloc"] + 1e-6
        if g["alloc"] == float(totals[lang]):
            capped += 1
            assert g["chars"] == totals[lang]
    # the fixture corpus exercises BOTH branches at every SF we test
    assert 0 < capped < len(totals)
    # water-filling exhausts the budget: total allocation == budget (the
    # uncapped shares absorb exactly the surplus), up to round-6 slack
    total_alloc = sum(g["alloc"] for g in by_lang.values())
    assert abs(total_alloc - budget) < 1e-3


def test_bpe_token_counts_matches_reference(spark):
    from vector_db_mvp_spark.operators.bpe import bpe_token_counts

    texts = [
        "the cat sat on the mat with the hat",
        "aaa aaaa banana bandana",
        "Hello, world! 123 hello hello",
        None,
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in
           bpe_token_counts(df, k=3).collect()}
    # independent recompute: train on the same corpus, tokenize by lookup
    merges = _ref_bpe(texts, 3)
    vocab = {}
    for t in texts:
        if t:
            for w in re.findall("[a-z]+", t.lower()):
                vocab[w] = list(w)
    for _, lhs, rhs, _c in merges:
        for w, s in vocab.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                    ns.append(lhs + rhs)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            vocab[w] = ns
    want = {}
    for i, t in enumerate(texts):
        ws = re.findall("[a-z]+", (t or "").lower())
        if ws:
            want[i] = (len(ws), sum(len(vocab[w]) for w in ws))
    assert got == want


def test_bpe_early_stop_when_pairs_exhaust(spark):
    # one two-char word: merge 1 consumes the only pair; rounds 2..k find
    # no pairs and must stop, returning fewer than k rows
    df = spark.createDataFrame([(1, "ab ab ab")], "doc_id int, text string")
    got = [tuple(r) for r in bpe_train(df, k=4).collect()]
    assert got == [(1, "a", "b", 3)]


def test_char_budget_mix_all_capped_when_budget_exceeds_corpus(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), 100 + i) for i in range(30)],
        "doc_id int, lang string, n_chars int",
    )
    total = sum(100 + i for i in range(30))
    kept = char_budget_mix(df, budget=total + 1000, alpha=0.5).collect()
    # every group capped at its whole corpus: everything is kept
    assert len(kept) == 30
    assert all(r["alloc_cost"] >= r["n_chars"] for r in kept)


def test_char_budget_mix_none_capped_on_uniform_groups(spark):
    # equal-size groups with a budget far below any group's total: shares
    # are uniform and nobody caps; each group keeps the same char mass
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 4), 100) for i in range(80)],
        "doc_id int, lang string, n_chars int",
    )
    kept = char_budget_mix(df, budget=800, alpha=0.5).collect()
    per = {}
    for r in kept:
        assert r["alloc_cost"] == 200.0  # 800 * w/(4w)
        per[r["lang"]] = per.get(r["lang"], 0) + r["n_chars"]
    assert per == {"g0": 200, "g1": 200, "g2": 200, "g3": 200}


def test_bpe_fold_equals_greedy_exhaustive_binary():
    """EXHAUSTIVE check of the fold≡greedy-scan equivalence the operator's
    correctness rests on: every symbol sequence over {a,b} up to length 10
    (2046 sequences), every merge pair in {a,b}² — the fold expression must
    reproduce the left-to-right greedy merge exactly. Overlap chains
    ('aaaa', 'ababab', ...) are all in here by construction."""
    import itertools

    from vector_db_mvp_spark.operators.bpe import _merge_expr
    from vector_db_mvp_spark.session import get_spark

    spark = get_spark("vector_db_mvp_spark-tests", shuffle_partitions=8)
    seqs = [
        list(t)
        for n in range(11)
        for t in itertools.product("ab", repeat=n)
    ]

    def greedy(s, lhs, rhs):
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)], "i int, syms array<string>"
    )
    for lhs, rhs in itertools.product("ab", repeat=2):
        got = {
            r["i"]: r["m"]
            for r in df.withColumn("m", F.expr(_merge_expr(lhs, rhs))).collect()
        }
        for i, s in enumerate(seqs):
            assert got[i] == greedy(s, lhs, rhs), (s, lhs, rhs, got[i])


def test_bpe_early_exhaustion_matches_oracle(spark):
    """Corpus admitting fewer merges than k: the single word 'ab' exhausts
    after one merge. The Spark loop `break`s and keeps the folded vocab;
    the SQL oracle's per-round fold must degrade to the identity fold (via
    the ''-sentinel pad) instead of cascading to zero rows."""
    import duckdb

    from vector_db_mvp_spark.operators.bpe import (
        bpe_token_counts,
        bpe_train,
        sql_bpe_token_counts,
        sql_bpe_train,
    )

    df = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "ab"), (3, None)], "doc_id int, text string"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'ab ab ab'), (2, 'ab'), (3, NULL)) t(doc_id, text)"
    )
    try:
        merges = bpe_train(df, k=4).collect()
        assert [(r["merge_rank"], r["lhs"], r["rhs"]) for r in merges] == [(1, "a", "b")]
        du_merges = con.execute(sql_bpe_train(k=4)).fetchall()
        assert [(r[0], r[1], r[2]) for r in du_merges] == [(1, "a", "b")]

        counts = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in bpe_token_counts(df, k=4).collect()
        }
        assert counts == {1: (3, 3), 2: (1, 1)}  # 'ab' is one token
        du_counts = {
            r[0]: (r[1], r[2])
            for r in con.execute(sql_bpe_token_counts(k=4)).fetchall()
        }
        assert du_counts == counts
    finally:
        con.close()
