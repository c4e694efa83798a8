"""RSS/Atom feed discovery (sources/webparse.feed_entries)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F  # noqa: F401

from dblp_crawler_spark.sources.webparse import feed_entries, feed_entries_sql

_RSS = """<?xml version="1.0"?><rss version="2.0"><channel>
<title>news</title>
<item><title>a</title><link>https://News.example.com/a?x=1</link>
<pubDate>Tue, 10 Jun 2025 04:00:00 GMT</pubDate></item>
<item><link>https://news.example.com/b</link>
<pubDate>Wed, 11 Foo 2025 04:00:00 GMT</pubDate></item>
<item><title>no link, dropped</title></item>
<item><link>https://news.example.com/c</link>
<pubDate>Mon, 31 Feb 2025 04:00:00 GMT</pubDate></item>
</channel></rss>"""

_ATOM = """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
<entry><link rel="self" href="https://blog.example.org/e1"/>
<updated>2025-12-31T23:59:59Z</updated></entry>
<entry><link href="https://blog.example.org/e2"/></entry>
</feed>"""

_MIXED = """<rss><channel>
<item><link>https://m.example.net/r</link>
<pubDate>Sat, 1 Mar 2025 00:00:00 GMT</pubDate></item>
</channel></rss>
<feed><entry><link href="https://m.example.net/a"/>
<updated>2025-03-02T00:00:00Z</updated></entry></feed>"""


def _pages():
    return [("h_rss", _RSS), ("h_atom", _ATOM), ("h_mixed", _MIXED),
            ("h_junk", "<html>not a feed</html>")]


def test_feed_entries_pins(spark):
    df = spark.createDataFrame(_pages(), "host string, feed_xml string")
    rows = {(r.host, r.url): (r.kind, r.published and str(r.published))
            for r in feed_entries(df).collect()}
    # linkless item dropped; host canonicalization lowercases
    assert len(rows) == 7
    assert rows[("h_rss", "https://news.example.com/a?x=1")] == ("rss", "2025-06-10")
    # junk month name -> NULL published, row kept
    assert rows[("h_rss", "https://news.example.com/b")] == ("rss", None)
    # impossible date (Feb 31) NULL-absorbs via the try-parse
    assert rows[("h_rss", "https://news.example.com/c")] == ("rss", None)
    assert rows[("h_atom", "https://blog.example.org/e1")] == ("atom", "2025-12-31")
    assert rows[("h_atom", "https://blog.example.org/e2")] == ("atom", None)
    # a page carrying both forms emits both kinds
    assert rows[("h_mixed", "https://m.example.net/r")] == ("rss", "2025-03-01")
    assert rows[("h_mixed", "https://m.example.net/a")] == ("atom", "2025-03-02")


def test_feed_entries_duckdb_replay(spark):
    df = spark.createDataFrame(_pages(), "host string, feed_xml string")
    spark_pdf = (
        feed_entries(df).select("host", "kind", "url", "published")
        .toPandas().sort_values(["host", "url"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("feed_pages", pd.DataFrame(_pages(), columns=["host", "feed_xml"]))
    duck_pdf = (
        con.sql(feed_entries_sql("feed_pages")).df()
        .sort_values(["host", "url"]).reset_index(drop=True)
    )
    for pdf in (spark_pdf, duck_pdf):
        pdf["published"] = pdf["published"].map(
            lambda v: None if pd.isna(v) else str(v)[:10]
        )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf[spark_pdf.columns])


# ---- sitemap scope validation ---------------------------------------------------

def _scope_rows():
    sm = "https://a.ex/news/sitemap.xml"
    return [
        (sm, "https://a.ex/news/2026/story1"),        # ok
        (sm, "https://a.ex/news/sub/dir/p"),          # ok (below dir)
        (sm, "https://A.EX/news/x"),                  # host case-folds: ok
        (sm, "https://a.ex/blog/p"),                  # above-dir
        (sm, "https://evil.ex/news/p"),               # cross-host
        # root sitemap scopes the whole host
        ("https://b.ex/sitemap.xml", "https://b.ex/anything/at/all"),
    ]


def test_sitemap_scope_pins(spark):
    from dblp_crawler_spark.sources.webparse import sitemap_scope_check

    df = spark.createDataFrame(_scope_rows(), "sitemap_url string, url string")
    got = {r.url: (r.in_scope, r.scope_reason)
           for r in sitemap_scope_check(df).collect()}
    assert got["https://a.ex/news/2026/story1"] == (True, "ok")
    assert got["https://a.ex/news/sub/dir/p"] == (True, "ok")
    assert got["https://A.EX/news/x"] == (True, "ok")
    assert got["https://a.ex/blog/p"] == (False, "above-dir")
    assert got["https://evil.ex/news/p"] == (False, "cross-host")
    assert got["https://b.ex/anything/at/all"] == (True, "ok")


def test_sitemap_scope_duckdb_replay(spark):
    from dblp_crawler_spark.sources.webparse import (
        sitemap_scope_check,
        sitemap_scope_check_sql,
    )

    df = spark.createDataFrame(_scope_rows(), "sitemap_url string, url string")
    spark_pdf = (sitemap_scope_check(df).toPandas()
                 .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("entries", pd.DataFrame(
        _scope_rows(), columns=["sitemap_url", "url"]))
    duck_pdf = (con.sql(sitemap_scope_check_sql("entries")).df()
                .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
