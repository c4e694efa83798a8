"""<meta name=robots> / <link rel=canonical> extraction: attribute
orders, quote styles, token boundaries, the 'none' alias, and the
DuckDB replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.sources.webparse import (
    html_meta_directives,
    html_meta_directives_sql,
)

PAGES = [
    # url, html, (noindex, nofollow, canonical-ish)
    ("http://a.org/1",
     '<html><head><meta name="robots" content="noindex, nofollow">'
     '<link rel="canonical" href="HTTP://A.ORG:80/real#f"></head><body>x</body>',
     (True, True, "http://a.org/real")),
    ("http://a.org/2",
     "<meta content='NOINDEX' name='robots'><p>content-first, caps</p>",
     (True, False, None)),
    ("http://a.org/3",
     "<meta name=robots content=\"none\">",
     (True, True, None)),
    ("http://a.org/4",
     '<meta name="viewport" content="width=device-width">',
     (False, False, None)),
    ("http://a.org/5",
     '<meta name="robots" content="nofollow">'
     '<link href="/rel/path" rel=canonical>',
     (False, True, "/rel/path")),
    ("http://a.org/6",
     '<meta name="robots" content="noindexing">',  # token boundary
     (False, False, None)),
    ("http://a.org/7", "<p>no directives at all</p>", (False, False, None)),
]


def test_pinned_directives(spark):
    df = spark.createDataFrame(
        [(u, h) for u, h, _ in PAGES], "url string, html string"
    )
    got = {r.url: (r.noindex, r.nofollow, r.canonical)
           for r in html_meta_directives(df).collect()}
    for url, _, want in PAGES:
        assert got[url] == want, (url, got[url], want)


def test_matches_duckdb_replay(spark):
    df = spark.createDataFrame(
        [(u, h) for u, h, _ in PAGES], "url string, html string"
    )
    eng = sorted(tuple(r) for r in html_meta_directives(df).collect())
    con = duckdb.connect()
    con.register("html_pages",
                 pd.DataFrame([(u, h) for u, h, _ in PAGES], columns=["url", "html"]))
    ora = sorted(con.execute(html_meta_directives_sql("html_pages")).fetchall())
    assert eng == ora


def test_nofollow_gates_link_expansion(spark):
    """The integration shape: links from nofollow pages never reach
    the frontier candidate set."""
    pages = spark.createDataFrame(
        [
            ("http://a.org/ok", "<p>plain</p>"),
            ("http://a.org/nf", '<meta name="robots" content="nofollow">'),
        ],
        "url string, html string",
    )
    links = spark.createDataFrame(
        [
            ("http://a.org/ok", "http://b.org/x"),
            ("http://a.org/nf", "http://b.org/y"),
        ],
        "src string, dst string",
    )
    d = html_meta_directives(pages)
    kept = (
        links.join(d, links.src == d.url, "left")
        .filter(~F.coalesce("nofollow", F.lit(False)))
        .select("dst")
        .collect()
    )
    assert [r.dst for r in kept] == ["http://b.org/x"]
