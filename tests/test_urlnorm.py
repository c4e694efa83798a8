"""URL canonicalization: fixed expected spellings + cross-engine
(Spark vs DuckDB fragment) equality on an adversarial battery.

north_rule: "each iteration canonicalizes and hashes candidate
URLs" — two raw spellings of one resource must map to ONE seen-set
key, or the frontier double-fetches.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark.functions.urlnorm import (
    canonical_url,
    canonical_url_sql,
    url_host,
)

# (raw, expected-canonical)
CASES = [
    # scheme+host case folding
    ("HTTP://Example.ORG/Path", "http://example.org/Path"),
    # default ports stripped, only for the matching scheme
    ("http://example.org:80/a", "http://example.org/a"),
    ("https://example.org:443/a", "https://example.org/a"),
    ("http://example.org:8080/a", "http://example.org:8080/a"),
    ("https://example.org:80/a", "https://example.org:80/a"),
    # fragment dropped
    ("http://example.org/a#sec-2", "http://example.org/a"),
    ("http://example.org/a?x=1#f", "http://example.org/a?x=1"),
    # query param sort + empty-param drop
    ("http://e.org/p?b=2&a=1", "http://e.org/p?a=1&b=2"),
    ("http://e.org/p?b=2&&a=1&", "http://e.org/p?a=1&b=2"),
    ("http://e.org/p?", "http://e.org/p"),
    # trailing slashes collapse; bare authority gets '/'
    ("http://example.org", "http://example.org/"),
    ("http://example.org/", "http://example.org/"),
    ("http://example.org/a/", "http://example.org/a"),
    ("http://example.org/a///", "http://example.org/a"),
    # query on bare authority
    ("http://example.org?z=1&y=2", "http://example.org/?y=2&z=1"),
    # whitespace trim
    ("  http://example.org/a \t", "http://example.org/a"),
    # path case is PRESERVED (only scheme/host fold)
    ("https://E.org/CamelCase?Q=V", "https://e.org/CamelCase?Q=V"),
    # non-http(s) scheme: no port stripping
    ("ftp://Host.Org:80/f", "ftp://host.org:80/f"),
    # no scheme: trimmed + fragment-stripped, otherwise untouched
    ("  /relative/path#x", "/relative/path"),
    ("dangling.html", "dangling.html"),
]


def test_canonical_url_expected_spellings(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url("url").alias("c")).collect()
    }
    for raw, want in CASES:
        assert got[raw.strip() if False else raw] == want, raw


def test_canonical_url_matches_duckdb_fragment(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url("url").alias("c")).collect()
    }
    con = duckdb.connect()
    for raw, _ in CASES:
        lit = "'" + raw.replace("'", "''") + "'"
        (duck,) = con.sql(f"SELECT {canonical_url_sql(lit)}").fetchone()
        assert duck == got[raw], raw


def test_canonical_url_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the frontier may
    re-canonicalize already-normalized URLs freely."""
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    out = df.select(
        canonical_url("url").alias("c1"),
        canonical_url(canonical_url("url")).alias("c2"),
    )
    assert out.filter(F.col("c1") != F.col("c2")).count() == 0


def test_url_host_extracts_budget_key(spark):
    df = spark.createDataFrame(
        [("HTTP://DBLP.org:80/pid/x?a=1#f",), ("/rel/x",)], "url string"
    )
    got = [r["h"] for r in df.select(url_host("url").alias("h")).collect()]
    assert got == ["dblp.org:80", ""]


def test_canonical_url_is_pure_projection(spark):
    """Plan shape: no exchange, no Python eval — a single projected
    scan that whole-stage codegen can fuse."""
    df = spark.range(100).select(
        F.format_string("http://h%d.org/p?b=2&a=1", F.col("id") % 7).alias("url")
    )
    plan = df.select(canonical_url("url").alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
