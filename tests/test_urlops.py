"""URL canonicalization + registrable-domain operators (operators/urlops.py).

The driver-gate leg (oracle parity over the synthetic generator) lives in
test_queries_oracle.py; these tests pin the canonicalization CONTRACT on
hand-written edge cases and the PSL longest-match semantics, including the
cases the generator deliberately leaves out (non-default ports, unknown
TLDs, bare hosts, already-canonical URLs).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from vector_db_mvp_spark.operators.urlops import (
    registrable_domain_map,
    sql_canonical_ctes,
    sql_domain_ctes,
    with_canonical_url,
)

CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
     "https://example.com/a/b?a=1&b=2"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),  # kept port
    ("https://example.com", "https://example.com/"),             # empty path
    ("https://example.com/?gclid=1&fbclid=2&ref=home", "https://example.com/"),
    ("https://sub.www.example.com/x", "https://sub.www.example.com/x"),  # inner www kept
    ("https://example.com/Case/Sensitive/Path", "https://example.com/Case/Sensitive/Path"),
    ("https://example.com/x?z=1&y=&utm_campaign=c", "https://example.com/x?y=&z=1"),
    ("https://example.com/x///", "https://example.com/x"),
    ("https://www.example.co.uk/x?a=1", "https://example.co.uk/x?a=1"),
]


def test_canonical_contract_spark(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i int, url string")
    got = {r["i"]: r["canonical_url"] for r in with_canonical_url(df).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_canonical_contract_duckdb_parity():
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{u}')" for i, (u, _) in enumerate(CASES))
    sql = f"""
WITH urls AS (SELECT * FROM (VALUES {vals}) t(i, url)),
{sql_canonical_ctes('urls')}
SELECT i, canonical_url FROM canon ORDER BY i
"""
    got = dict(con.execute(sql).fetchall())
    con.close()
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


DOMAIN_CASES = [
    ("example.com", "example.com"),
    ("a.b.example.co.uk", "example.co.uk"),
    ("deep.sub.example.com", "example.com"),
    ("example.zz", "example.zz"),          # unknown TLD -> 1-label suffix
    ("sub.example.zz", "example.zz"),
    ("co.uk", "co.uk"),                    # bare suffix: no label above it
    ("localhost", "localhost"),            # single label
    ("x.gov.uk", "x.gov.uk"),
]


def test_registrable_domain_spark_and_oracle(spark):
    df = spark.createDataFrame([(h,) for h, _ in DOMAIN_CASES], "host string")
    got = {r["host"]: r["domain"] for r in registrable_domain_map(df).collect()}
    want = dict(DOMAIN_CASES)
    assert got == want
    con = duckdb.connect()
    vals = ", ".join(f"('{h}')" for h, _ in DOMAIN_CASES)
    sql = f"""
WITH hosts AS (SELECT * FROM (VALUES {vals}) t(host)),
{sql_domain_ctes('hosts')}
SELECT host, domain FROM dom
"""
    got_du = dict(con.execute(sql).fetchall())
    con.close()
    assert got_du == want


def test_canonicalization_is_shuffle_free(spark):
    """The canonical-url computation must stay a narrow projection — zero
    Exchange in the plan (the 100 TB contract: URL canonicalization is a
    free rider on whatever scan already happens)."""
    df = spark.createDataFrame([(1, "https://a.com/x")], "i int, url string")
    plan = with_canonical_url(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_canonical_idempotent(spark):
    """Canonicalizing a canonical URL is the identity."""
    df = spark.createDataFrame(
        [(i, c) for i, (_, c) in enumerate(CASES)], "i int, url string"
    )
    got = {r["i"]: r["canonical_url"] for r in with_canonical_url(df).collect()}
    for i, (_, c) in enumerate(CASES):
        assert got[i] == c, (c, got[i])
