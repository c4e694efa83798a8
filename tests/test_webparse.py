"""robots.txt / sitemap / HTML-to-text parsing: RFC-9309 group
semantics, cross-engine fragment equality, and integration with the
scheduler's robots gate."""

import duckdb
from pyspark.sql import functions as F

from dblp_crawler_spark.sources.webparse import (
    html_to_text,
    html_to_text_sql,
    parse_robots,
    parse_robots_sql,
    sitemap_urls,
)

ROBOTS_CASES = {
    # plain wildcard group with comments and a delay
    "a.org": "# hi\nUser-agent: *\nDisallow: /private\nDisallow: /tmp\nCrawl-delay: 2\n",
    # star group separate from a bot-specific group
    "b.org": "User-agent: googlebot\nDisallow: /g\n\nUser-agent: *\nDisallow: /x\n",
    # orphan directive before any UA is ignored; stacked UA lines form
    # ONE group (RFC 9309 §2.1), so '*' inherits /y and the delay
    "c.org": "Disallow: /orphan\nUser-agent: badbot\nUser-agent: *\nDisallow: /y\nCrawl-delay: 10\n",
    # no wildcard group → host emits nothing
    "d.org": "User-agent: onlybot\nDisallow: /z\n",
    # two star groups (malformed): union of prefixes, max delay
    "e.org": "User-agent: *\nDisallow: /a\nCrawl-delay: 1\n\nUser-agent: *\nDisallow: /b\nCrawl-delay: 3\n",
    # case-insensitive keys, spaces around colon
    "f.org": "USER-AGENT :  *\ndisallow:/caps\n",
}

EXPECTED = {
    "a.org": (["/private", "/tmp"], 2000),
    "b.org": (["/x"], None),
    "c.org": (["/y"], 10000),
    "e.org": (["/a", "/b"], 3000),
    "f.org": ([], None),  # 'USER-AGENT ' with space: extract still matches? see test
}


def _robots_df(spark):
    return spark.createDataFrame(
        [(h, t) for h, t in ROBOTS_CASES.items()], "host string, robots_txt string"
    )


def test_parse_robots_group_semantics(spark):
    got = {
        r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay_ms"])
        for r in parse_robots(_robots_df(spark)).collect()
    }
    assert "d.org" not in got
    assert got["a.org"] == (["/private", "/tmp"], 2000)
    assert got["b.org"] == (["/x"], None)
    assert got["c.org"] == (["/y"], 10000)
    assert got["e.org"] == (["/a", "/b"], 3000)
    # 'USER-AGENT :' (space before colon) still parses; disallow with
    # no space after colon still parses
    assert got["f.org"] == (["/caps"], None)


def test_parse_robots_matches_duckdb(spark):
    got = {
        r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay_ms"])
        for r in parse_robots(_robots_df(spark)).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE robots_pages(host VARCHAR, robots_txt VARCHAR)"
    )
    for h, t in ROBOTS_CASES.items():
        con.execute("INSERT INTO robots_pages VALUES (?, ?)", [h, t])
    duck = {
        h: (list(d), c)
        for h, d, c in con.sql(parse_robots_sql()).fetchall()
    }
    assert duck == got


def test_parse_robots_feeds_scheduler_gate(spark):
    """The parsed shape plugs straight into robots_status."""
    from dblp_crawler_spark.operators.scheduler import robots_status

    robots = parse_robots(_robots_df(spark))
    urls = spark.createDataFrame(
        [
            ("a.org", "/private/p1", "pending"),
            ("a.org", "/public/p2", "pending"),
            ("d.org", "/z", "pending"),
        ],
        "host string, url string, status string",
    )
    got = {r["url"]: r["status"] for r in robots_status(urls, robots).collect()}
    assert got == {
        "/private/p1": "disallowed",
        "/public/p2": "pending",
        "/z": "pending",  # d.org published no wildcard rules
    }


def test_sitemap_urls_extract_and_canonicalize(spark):
    xml = (
        "<urlset><url><loc>HTTP://E.org:80/a/</loc></url>"
        "<url><loc>http://e.org/b?z=1&amp;y=2</loc></url></urlset>"
    )
    df = spark.createDataFrame([("s1", xml)], "sm_id string, sitemap_xml string")
    got = sorted(r["url"] for r in sitemap_urls(df).collect())
    # NB: &amp; inside XML is the literal '&' — but loc extraction is
    # raw-text here; the query param split sees 'z=1&amp;y=2' and
    # sorts the raw parts deterministically in both engines
    assert got[0] == "http://e.org/a"
    assert len(got) == 2


def test_sitemap_entries_lastmod_and_drops(spark):
    import datetime

    from dblp_crawler_spark.sources.webparse import sitemap_entries

    xml = (
        "<urlset>\n"
        "  <url>\n    <loc>HTTP://E.org:80/a/#f</loc>\n"
        "    <lastmod>2024-03-07</lastmod>\n  </url>\n"
        "  <url><loc>http://e.org/b</loc></url>\n"          # no lastmod -> NULL
        "  <url><lastmod>2024-01-01</lastmod></url>\n"       # no loc -> dropped
        "  <url><loc>http://e.org/c</loc><lastmod></lastmod></url>\n"  # empty -> NULL
        "</urlset>"
    )
    df = spark.createDataFrame([("s1", xml)], "sm_id string, sitemap_xml string")
    got = {r["url"]: r["lastmod"] for r in sitemap_entries(df).collect()}
    assert got == {
        "http://e.org/a": datetime.date(2024, 3, 7),
        "http://e.org/b": None,
        "http://e.org/c": None,
    }


def test_warc_records_roundtrip_and_audit(spark):
    from dblp_crawler_spark.sources.webparse import warc_records

    def rec(uri, typ, body, cl=None):
        n = len(body) if cl is None else cl
        return (f"WARC/1.0\r\nWARC-Type: {typ}\r\nWARC-Target-URI: {uri}"
                f"\r\nContent-Length: {n}\r\n\r\n{body}\r\n\r\n")

    seg = (rec("http://a.org/1", "response", "hello world")
           + rec("http://a.org/2", "response", "short", cl=50)   # torn write
           + rec("http://a.org/3", "response", "0123456789", cl=4)  # over-long payload clipped
           + rec("http://a.org/4", "request", "GET /"))
    df = spark.createDataFrame([("h1", seg)], "host string, warc string")
    got = {r.uri: r for r in warc_records(df).collect()}
    assert got["http://a.org/1"].body == "hello world" and not got["http://a.org/1"].truncated
    assert got["http://a.org/2"].body == "short" and got["http://a.org/2"].truncated
    assert got["http://a.org/3"].body == "0123" and not got["http://a.org/3"].truncated
    assert got["http://a.org/4"].rec_type == "request"
    # a record with no Content-Length header keeps its whole payload
    # and is NOT flagged: there is no declared length to audit against
    seg2 = "WARC/1.0\r\nWARC-Target-URI: http://b.org/x\r\n\r\nfull payload\r\n\r\n"
    df2 = spark.createDataFrame([("h2", seg2)], "host string, warc string")
    r2 = warc_records(df2).collect()[0]
    assert r2.body == "full payload" and not r2.truncated
    assert r2.content_length is None


HTML_CASES = [
    (
        "<html><head><script>var x = '<b>';\nif (a<b) {}</script>"
        "<style>.c { color: red }</style></head>"
        "<body><h1>Title</h1><!-- note -->\n<p>A &amp; B &lt;tag&gt; &quot;q&#39;s&quot;&nbsp;end</p></body></html>",
        "Title A & B <tag> \"q's\" end",
    ),
    ("plain text, no markup", "plain text, no markup"),
    ("<p>double  spaced\t\ttext</p>", "double spaced text"),
    ("&amp;lt; stays literal", "&lt; stays literal"),
]


def test_html_to_text_expected(spark):
    df = spark.createDataFrame([(h,) for h, _ in HTML_CASES], "html string")
    got = {r["html"]: r["t"] for r in df.select("html", html_to_text("html").alias("t")).collect()}
    for h, want in HTML_CASES:
        assert got[h] == want, h


def test_html_to_text_matches_duckdb(spark):
    df = spark.createDataFrame([(h,) for h, _ in HTML_CASES], "html string")
    got = {r["html"]: r["t"] for r in df.select("html", html_to_text("html").alias("t")).collect()}
    con = duckdb.connect()
    for h, _ in HTML_CASES:
        lit = "'" + h.replace("'", "''") + "'"
        (duck,) = con.sql(f"SELECT {html_to_text_sql(lit)}").fetchone()
        assert duck == got[h], h


def test_html_to_text_is_pure_projection(spark):
    df = spark.range(10).select(F.format_string("<p>row %d</p>", "id").alias("html"))
    plan = df.select(html_to_text("html").alias("t"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_sitemap_index_two_level_expansion(spark):
    from dblp_crawler_spark.sources.webparse import sitemap_entries, sitemap_index_urls

    index = ("<sitemapindex>"
             "<sitemap><loc>HTTP://E.org:80/sm1.xml</loc></sitemap>"
             "<sitemap><loc>http://e.org/sm2.xml</loc></sitemap>"
             "<sitemap><lastmod>2024-01-01</lastmod></sitemap>"  # loc-less: dropped
             "</sitemapindex>")
    idx = spark.createDataFrame([("e.org", index)], "host string, sitemap_xml string")
    kids = sitemap_index_urls(idx)
    assert sorted(r.sitemap_url for r in kids.collect()) == [
        "http://e.org/sm1.xml", "http://e.org/sm2.xml"]
    store = spark.createDataFrame(
        [("http://e.org/sm1.xml", "<urlset><url><loc>http://e.org/a</loc></url></urlset>"),
         ("http://e.org/sm2.xml", "<urlset><url><loc>http://e.org/b</loc></url></urlset>")],
        "url string, xml string")
    from pyspark.sql import functions as F
    fetched = kids.join(store, kids.sitemap_url == store.url).select(
        "host", F.col("xml").alias("sitemap_xml"))
    got = sorted(r.url for r in sitemap_entries(fetched).collect())
    assert got == ["http://e.org/a", "http://e.org/b"]


def test_robots_sitemaps_declarations(spark):
    from dblp_crawler_spark.sources.webparse import robots_sitemaps

    txt = ("Sitemap: HTTP://E.org:80/a.xml\n"        # before any group, raw spelling
           "User-agent: *\nDisallow: /x\n"
           "sitemap:http://e.org/b.xml#f\n"           # inside a group, lower, tight colon
           "# Sitemap: http://e.org/commented.xml\n"  # commented out: ignored
           "SITEMAP: http://e.org/c.xml  \n")         # caps + trailing ws
    df = spark.createDataFrame([("e.org", txt)], "host string, robots_txt string")
    got = sorted(r.sitemap_url for r in robots_sitemaps(df).collect())
    assert got == ["http://e.org/a.xml", "http://e.org/b.xml", "http://e.org/c.xml"]


# ---- sitemap scheduling hints ---------------------------------------------------

def test_sitemap_hints_validation_and_defaults(spark):
    from pyspark.sql import functions as F

    from dblp_crawler_spark.sources.webparse import sitemap_entries_full

    def url_block(loc, cf=None, pr=None):
        b = f"<loc>{loc}</loc>"
        if cf is not None:
            b += f"<changefreq>{cf}</changefreq>"
        if pr is not None:
            b += f"<priority>{pr}</priority>"
        return f"<url>{b}</url>"

    xml = "<urlset>" + "".join([
        url_block("https://a.org/1", "daily", "0.8"),
        url_block("https://a.org/2", "ALWAYS"),          # case-folds, valid
        url_block("https://a.org/3", "sometimes", "0.3"),  # junk enum
        url_block("https://a.org/4", "never", "2.5"),    # out-of-range prio
        url_block("https://a.org/5", None, "abc"),       # junk prio
        url_block("https://a.org/6"),                    # nothing declared
    ]) + "</urlset>"
    pages = spark.createDataFrame([("a", xml)], "host string, sitemap_xml string")
    got = {r.url: r for r in sitemap_entries_full(pages).collect()}
    assert (got["https://a.org/1"].changefreq, got["https://a.org/1"].priority,
            got["https://a.org/1"].changefreq_s) == ("daily", 0.8, 86400)
    assert (got["https://a.org/2"].changefreq, got["https://a.org/2"].changefreq_s) == ("always", 0)
    assert got["https://a.org/3"].changefreq is None
    assert got["https://a.org/3"].priority == 0.3
    assert (got["https://a.org/4"].changefreq, got["https://a.org/4"].changefreq_s,
            got["https://a.org/4"].priority) == ("never", None, 0.5)
    assert got["https://a.org/5"].priority == 0.5
    assert (got["https://a.org/6"].changefreq, got["https://a.org/6"].priority) == (None, 0.5)


def test_sitemap_hints_duckdb_replay(spark):
    import duckdb
    import pandas as pd

    from dblp_crawler_spark.sources.webparse import (
        sitemap_entries_full,
        sitemap_entries_full_sql,
    )

    xml = ("<urlset>"
           "<url><loc>https://a.org/1</loc><changefreq>weekly</changefreq>"
           "<priority>0.9</priority></url>"
           "<url><loc>https://a.org/2</loc><lastmod>2024-03-04</lastmod></url>"
           "<url><loc>https://a.org/3</loc><priority>7</priority></url>"
           "</urlset>")
    pages = spark.createDataFrame([("a", xml)], "host string, sitemap_xml string")
    spark_pdf = (
        sitemap_entries_full(pages).toPandas()
        .sort_values("url").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("sitemap_pages", pd.DataFrame(
        [("a", xml)], columns=["host", "sitemap_xml"]))
    duck_pdf = (
        con.sql(sitemap_entries_full_sql()).df()
        .sort_values("url").reset_index(drop=True)
    )
    # pandas renders DATE as date objects (Spark) vs datetime64
    # (DuckDB) — same values; compare as strings
    for pdf in (spark_pdf, duck_pdf):
        pdf["lastmod"] = pdf["lastmod"].map(
            lambda v: None if pd.isna(v) else str(v)[:10]
        )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
