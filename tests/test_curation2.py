"""PII redaction, Gopher quality rules, line-level dedup, sequence packing
(operators/pii.py, quality.py, linededup.py, packing.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.linededup import line_dedup
from vector_db_mvp_spark.operators.packing import pack_documents
from vector_db_mvp_spark.operators.pii import pii_redact, pii_scan
from vector_db_mvp_spark.operators.quality import quality_rules


# --------------------------------------------------------------------------
# PII
# --------------------------------------------------------------------------

def test_pii_scan_counts_each_family(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.user+x@sub.example.co.uk now"),
            (2, "call 415-555-1234 or 415.555.9999"),
            (3, "ssn 123-45-6789 ip 10.0.0.1"),
            (4, "clean text with no identifiers"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["has_pii"]
    assert rows[2]["n_phone"] == 2
    assert rows[3]["n_ssn"] == 1 and rows[3]["n_ipv4"] == 1
    assert not rows[4]["has_pii"]


def test_pii_redact_replaces_in_order(spark):
    df = spark.createDataFrame(
        [(1, "a@b.com then 415-555-1234 then 123-45-6789 then 10.0.0.1")],
        "doc_id long, text string",
    )
    r = pii_redact(df).collect()[0]
    assert r["redacted"] == "<EMAIL> then <PHONE> then <SSN> then <IP>"
    assert r["n_pii"] == 4
    # a dotted phone is consumed by the phone pattern, not as two IP halves
    r2 = pii_redact(
        spark.createDataFrame([(1, "x 415.555.1234 y")], "doc_id long, text string")
    ).collect()[0]
    assert r2["redacted"] == "x <PHONE> y"
    assert r2["n_ipv4"] == 0


def test_pii_plan_is_single_stage(spark):
    df = spark.createDataFrame([(1, "a@b.com")], "doc_id long, text string")
    plan = pii_redact(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map work, no shuffle


# --------------------------------------------------------------------------
# Quality rules
# --------------------------------------------------------------------------

def test_quality_rules_verdicts(spark):
    long_good = "the quick brown fox jumps over a lazy dog near the river " * 5
    df = spark.createDataFrame(
        [
            (1, long_good.strip()),
            (2, "too short for the corpus"),  # fails word_count
            (3, " ".join(["zz"] * 60)),  # fails mean_word_len + stopwords
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_rules(df).collect()}
    assert rows[1]["keep"]
    assert not rows[2]["rule_word_count"] and not rows[2]["keep"]
    assert not rows[3]["rule_mean_word_len"]
    assert not rows[3]["rule_stopwords"]
    assert rows[3]["rule_alpha_words"]  # all-alpha words still pass that rule


def test_quality_rules_tokenize_once(spark):
    # the tokenizer regex must appear in ONE projection, not inside every
    # HOF lambda (CSE loss trap): the optimized plan splits text exactly once
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = quality_rules(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1


# --------------------------------------------------------------------------
# Line dedup
# --------------------------------------------------------------------------

def test_line_dedup_drops_boilerplate(spark):
    header = "subscribe to our newsletter"
    docs = [
        (i, f"{header}\nunique line {i}\nsecond unique {i}") for i in range(1, 5)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in line_dedup(df, max_doc_freq=2).collect()}
    for i in range(1, 5):
        assert rows[i]["n_lines"] == 3
        assert rows[i]["n_kept"] == 2
        assert rows[i]["kept_text"] == f"unique line {i}\nsecond unique {i}"


def test_line_dedup_all_boilerplate_doc_survives_empty(spark):
    df = spark.createDataFrame(
        [(1, "same\nsame2"), (2, "same\nsame2"), (3, "same\nsame2")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in line_dedup(df, max_doc_freq=2).collect()}
    assert rows[1]["n_kept"] == 0 and rows[1]["kept_text"] == ""


def test_line_dedup_keeps_order_and_skips_blanks(spark):
    df = spark.createDataFrame(
        [(1, "z last first\n\n  \na middle\nb end")], "doc_id long, text string"
    )
    r = line_dedup(df, max_doc_freq=5).collect()[0]
    assert r["kept_text"] == "z last first\na middle\nb end"
    assert r["n_lines"] == 3  # blank lines not counted


# --------------------------------------------------------------------------
# Sequence packing
# --------------------------------------------------------------------------

def test_pack_documents_matches_naive_global_window(spark, sf_dir):
    from vector_db_mvp_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = pack_documents(
        docs, size_col="n_chars", order_col="doc_id", capacity=1000
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = docs.select(
        "doc_id",
        "n_chars",
        (F.sum("n_chars").over(w) - F.col("n_chars")).alias("global_offset"),
    )
    diff = (
        got.join(want, ["doc_id", "n_chars"])
        .filter(got["global_offset"] != want["global_offset"])
        .count()
    )
    assert diff == 0
    # pack arithmetic is consistent with the offset
    bad = got.filter(
        (F.col("first_pack") != F.expr("global_offset div 1000"))
        | (F.col("pack_offset") != F.col("global_offset") % 1000)
        | (F.col("last_pack") < F.col("first_pack"))
    ).count()
    assert bad == 0


def test_pack_documents_no_single_partition_exchange(spark, sf_dir):
    from vector_db_mvp_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        pack_documents(docs, size_col="n_chars", order_col="doc_id", capacity=512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_pack_documents_boundary_straddle(spark):
    # doc of size 5 starting at offset 8 with capacity 10 spans packs 0-1
    df = spark.createDataFrame(
        [(1, 8), (2, 5), (3, 2)], "doc_id long, n_tokens long"
    )
    rows = {
        r["doc_id"]: r
        for r in pack_documents(df, capacity=10, num_partitions=2).collect()
    }
    assert (rows[1]["first_pack"], rows[1]["last_pack"]) == (0, 0)
    assert (rows[2]["first_pack"], rows[2]["last_pack"]) == (0, 1)
    assert rows[2]["pack_offset"] == 8
    assert (rows[3]["first_pack"], rows[3]["last_pack"]) == (1, 1)
