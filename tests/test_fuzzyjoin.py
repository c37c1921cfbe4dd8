"""Deletion-neighborhood fuzzy join (operators/fuzzyjoin.py)."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.fuzzyjoin import deletion_variants, fuzzy_pairs


def _leven(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_variants_cover_all_single_deletions(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    got = df.select(deletion_variants(F.col("s")).alias("v")).collect()[0].v
    assert sorted(got) == sorted(["abc", "bc", "ac", "ab"])


def test_blocking_is_complete_vs_brute_force(spark):
    """Every distance<=1 pair must survive the blocking — checked against a
    driver-side brute force over an adversarial + random vocabulary."""
    rng = random.Random(7)
    vocab = {"cold bolt", "old bolt", "bold bolt", "cold colt", "coldbolt",
             "cold  bolt", "", "a", "b", "ab"}
    alphabet = "abco "
    while len(vocab) < 60:
        vocab.add("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))))
    vocab = sorted(vocab)
    df = spark.createDataFrame([(v,) for v in vocab], "name string")
    got = {
        (r.name_a, r.name_b)
        for r in fuzzy_pairs(df, text_col="name").collect()
    }
    want = {
        (a, b)
        for a, b in itertools.combinations(vocab, 2)
        if _leven(a, b) <= 1
    }
    assert got == want


def test_exact_duplicates_not_self_paired(spark):
    df = spark.createDataFrame([("x",), ("x",), ("y",)], "name string")
    got = fuzzy_pairs(df, text_col="name").collect()
    assert {(r.name_a, r.name_b, r.dist) for r in got} == {("x", "y", 1)}


def test_max_dist_two_supported(spark):
    df = spark.createDataFrame([("abc",), ("a",)], "name string")
    out = fuzzy_pairs(df, text_col="name", max_dist=2).collect()
    assert {(r.name_a, r.name_b, r.dist) for r in out} == {("a", "abc", 2)}


def test_depth2_blocking_complete_vs_brute_force(spark):
    """max_dist=2: SymSpell's 2-deletion neighborhoods must find every
    Levenshtein<=2 pair a brute-force scan finds."""
    import itertools
    import random

    rng = random.Random(11)
    vocab = {"cold bolt", "old bot", "col bolt", "coldbolt x", "", "ab", "ba"}
    while len(vocab) < 40:
        vocab.add("".join(rng.choice("abco ") for _ in range(rng.randint(1, 7))))
    vocab = sorted(vocab)
    df = spark.createDataFrame([(v,) for v in vocab], "name string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_pairs(df, text_col="name", max_dist=2).collect()
    }
    want = {
        (a, b, _leven(a, b))
        for a, b in itertools.combinations(vocab, 2)
        if _leven(a, b) <= 2
    }
    assert got == want


def test_max_dist_three_rejected(spark):
    df = spark.createDataFrame([("x",)], "name string")
    with pytest.raises(ValueError):
        fuzzy_pairs(df, text_col="name", max_dist=3)
