"""Batch pins: typed URL blocklist (kind semantics, suffix dot rule,
precedence election), plain-text URL mention mining (trailing-prose
stripping, canonicalization, mention counting), and crawl-order
divergence localization — each with its DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.audit import (
    order_divergence,
    order_divergence_sql,
)
from dblp_crawler_spark.operators.frontier import (
    url_blocklist,
    url_blocklist_sql,
)
from dblp_crawler_spark.sources.webparse import (
    text_url_mentions,
    text_url_mentions_sql,
)

URLS = [
    ("https://bad.example/x",),
    ("https://a.bad.example/y",),          # suffix rule blocks subdomains
    ("https://notbad.example/z",),         # no dot boundary: NOT blocked
    ("https://ok.org/private/1",),         # path prefix
    ("https://ok.org/pub/1",),
    ("https://tracker.net/pixel?utm_spy=1",),   # substring
    ("https://clean.org/p",),
]
PATTERNS = [
    ("host_suffix", "bad.example"),
    ("path_prefix", "ok.org/private"),
    ("substring", "utm_spy"),
    ("host", "tracker.net"),               # also matches: host outranks substring
]


def test_blocklist(spark):
    u = spark.createDataFrame(URLS, "url string")
    p = spark.createDataFrame(PATTERNS, "kind string, pattern string")
    got = {r.url: r for r in url_blocklist(u, p).collect()}
    assert got["https://bad.example/x"].blocked is True
    assert got["https://a.bad.example/y"].block_kind == "host_suffix"
    assert got["https://notbad.example/z"].blocked is False
    assert got["https://ok.org/private/1"].block_kind == "path_prefix"
    assert got["https://ok.org/pub/1"].blocked is False
    r = got["https://tracker.net/pixel?utm_spy=1"]
    assert (r.block_kind, r.block_pattern) == ("host", "tracker.net")
    assert got["https://clean.org/p"].blocked is False
    spark_pdf = (
        url_blocklist(u, p).toPandas().sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("urls", pd.DataFrame(URLS, columns=["url"]))
    con.register("pats", pd.DataFrame(PATTERNS, columns=["kind", "pattern"]))
    duck_pdf = (
        con.sql(url_blocklist_sql("urls", "pats")).df()
        .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)


DOCS = [
    (0, "see https://x.org/paper. and https://x.org/paper, twice"),
    (1, "also https://x.org/paper cited here plus (https://y.net/a)"),
    (2, "HTTP://X.ORG/other and nothing else"),
    (3, "no urls at all"),
]


def test_text_url_mentions(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.url: r for r in text_url_mentions(df).collect()}
    r = got["https://x.org/paper"]
    assert (r.n_mentions, r.n_docs) == (3, 2)
    assert got["https://y.net/a"].n_mentions == 1
    # scheme/host lowercase via canonical_url
    assert "http://x.org/other" in got
    spark_pdf = (
        text_url_mentions(df).toPandas().sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    duck_pdf = (
        con.sql(text_url_mentions_sql("docs")).df()
        .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)


def test_order_divergence(spark):
    a = spark.createDataFrame([(i, f"u{i}") for i in range(10)],
                              "seq long, url string")
    # identical
    same = order_divergence(a, a).collect()[0]
    assert (same.n_mismatch, same.first_divergence_seq) == (0, None)
    # swap rows 4 and 7
    rows = [(i, f"u{i}") for i in range(10)]
    rows[4], rows[7] = (4, "u7"), (7, "u4")
    b = spark.createDataFrame(rows, "seq long, url string")
    d = order_divergence(a, b).collect()[0]
    assert (d.n_mismatch, d.first_divergence_seq, d.a_url, d.b_url) == (
        2, 4, "u4", "u7")
    # one side longer
    c = spark.createDataFrame([(i, f"u{i}") for i in range(12)],
                              "seq long, url string")
    e = order_divergence(a, c).collect()[0]
    assert (e.n_a, e.n_b, e.first_divergence_seq) == (10, 12, 10)
    spark_pdf = order_divergence(a, b).toPandas()
    con = duckdb.connect()
    con.register("ra", pd.DataFrame([(i, f"u{i}") for i in range(10)],
                                    columns=["seq", "url"]))
    con.register("rb", pd.DataFrame(rows, columns=["seq", "url"]))
    duck_pdf = con.sql(order_divergence_sql("ra", "rb")).df()
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)
