"""HTML outlink + <img>/srcset extraction and relative-href
resolution (urlnorm.resolve_url, webparse.extract_*) — hand pins and
DuckDB replays."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.functions.urlnorm import resolve_url, resolve_url_sql
from dblp_crawler_spark.sources.webparse import (
    extract_images,
    extract_images_sql,
    extract_outlinks,
    extract_outlinks_sql,
)


def test_resolve_url_pins_and_replay(spark):
    base = "https://a.org/d/e/page.html"
    cases = [
        ("x.html", "https://a.org/d/e/x.html"),
        ("./x.html", "https://a.org/d/e/x.html"),
        ("../x.html", "https://a.org/d/x.html"),
        ("../../x.html", "https://a.org/x.html"),
        ("../../../x.html", "https://a.org/x.html"),   # above-root clamp
        ("/root.html", "https://a.org/root.html"),
        ("//cdn.org/i.png", "https://cdn.org/i.png"),
        ("?q=1", "https://a.org/d/e/page.html?q=1"),
        ("#frag", None),
        ("", None),
        ("javascript:void(0)", None),
        ("mailto:x@y.z", None),
        ("data:image/png;base64,AA==", None),
        ("HTTP://B.ORG/abs", "HTTP://B.ORG/abs"),       # canonicalized later
        ("a/b/../c/./d.html", "https://a.org/d/e/a/c/d.html"),
        ("x?p=/../q#f", "https://a.org/d/e/x?p=/../q"),  # query untouched
        ("a/..", "https://a.org/d/e/"),
    ]
    rows = [(base, h) for h, _ in cases]
    df = spark.createDataFrame(rows, "b string, h string")
    got = [r.r for r in df.select(resolve_url("b", "h").alias("r")).collect()]
    for (h, want), g in zip(cases, got):
        assert g == want, (h, g, want)
    con = duckdb.connect()
    con.register("c", pd.DataFrame(rows, columns=["b", "h"]))
    duck = [r[0] for r in
            con.sql(f"SELECT {resolve_url_sql('b', 'h')} FROM c").fetchall()]
    assert duck == got


_HTML = """<html><body>
<a href="x.html">one</a>
<a href='../up.html'>two</a>
<a href=bare.html>three</a>
<a href="https://ext.org/abs">four</a>
<a href="javascript:void(0)">drop</a>
<a href="#frag">drop</a>
<a href="x.html">dup</a>
<img src="/i/a.png" alt="first image">
<img srcset="s.jpg 320w, m.jpg 640w, l.jpg 1280w" src="fallback.jpg" alt='big one'>
<img srcset="lo.png 1x, hi.png 2x" alt=bareword>
<img data-src="lazy.png" src="real.png">
<img src="data:image/gif;base64,AA==" alt="inline drops">
</body></html>"""


def test_extract_outlinks_pins(spark):
    df = spark.createDataFrame(
        [("https://a.org/d/page.html", _HTML)], "url string, html string")
    got = {r.out_url for r in extract_outlinks(df).collect()}
    assert got == {
        "https://a.org/d/x.html",
        "https://a.org/up.html",
        "https://a.org/d/bare.html",
        "https://ext.org/abs",
    }


def test_extract_images_pins(spark):
    df = spark.createDataFrame(
        [("https://a.org/d/page.html", _HTML)], "url string, html string")
    rows = sorted(
        ((r.tag_idx, r.img_url, r.alt, r.width_hint)
         for r in extract_images(df).collect())
    )
    assert rows == [
        (0, "https://a.org/i/a.png", "first image", None),
        # widest srcset candidate wins over src
        (1, "https://a.org/d/l.jpg", "big one", 1280),
        # density-only srcset: highest x wins
        (2, "https://a.org/d/hi.png", None, None),
        # data-src must not shadow src
        (3, "https://a.org/d/real.png", None, None),
        # tag 4 (data: URI) dropped
    ]


def test_extract_replays(spark):
    pages = [(f"https://h{i % 3}.org/s/p{i}.html",
              _HTML if i % 2 else "<p>no links</p>") for i in range(12)]
    df = spark.createDataFrame(pages, "url string, html string")
    con = duckdb.connect()
    con.register("pages", pd.DataFrame(pages, columns=["url", "html"]))

    sp = (extract_outlinks(df).toPandas()
          .sort_values(["url", "out_url"]).reset_index(drop=True))
    dk = (con.sql(extract_outlinks_sql("pages")).df()
          .sort_values(["url", "out_url"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(sp, dk[sp.columns], check_dtype=False)

    spi = (extract_images(df).toPandas()
           .sort_values(["url", "tag_idx"]).reset_index(drop=True))
    dki = (con.sql(extract_images_sql("pages")).df()
           .sort_values(["url", "tag_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(spi, dki[spi.columns], check_dtype=False)


def test_hreflang_alternates_pins_and_replay(spark):
    from dblp_crawler_spark.sources.webparse import (
        hreflang_alternates,
        hreflang_alternates_sql,
    )

    html = (
        '<link rel="alternate" hreflang="en" href="https://a.org/en/p">'
        "<link href='/de/p' hreflang='DE' rel='alternate'>"   # order + case
        '<link hreflang=fr href=fr/p>'                        # bare values
        '<link rel="alternate" hreflang="x-default" href="/p">'
        '<link rel="stylesheet" href="/css/m.css">'           # no hreflang
        '<link hreflang="es" href="javascript:x">'            # unresolvable
    )
    df = spark.createDataFrame(
        [("https://a.org/de/page.html", html)], "url string, html string")
    got = {(r.hreflang, r.alt_url) for r in hreflang_alternates(df).collect()}
    assert got == {
        ("en", "https://a.org/en/p"),
        ("de", "https://a.org/de/p"),
        ("fr", "https://a.org/de/fr/p"),
        ("x-default", "https://a.org/p"),
    }
    import duckdb
    import pandas as pd

    pages = [(f"https://h{i % 3}.org/x/p{i}.html", html if i % 2 else "<p>n</p>")
             for i in range(8)]
    dfm = spark.createDataFrame(pages, "url string, html string")
    con = duckdb.connect()
    con.register("pages", pd.DataFrame(pages, columns=["url", "html"]))
    sp = (hreflang_alternates(dfm).toPandas()
          .sort_values(["url", "hreflang", "alt_url"]).reset_index(drop=True))
    dk = (con.sql(hreflang_alternates_sql("pages")).df()
          .sort_values(["url", "hreflang", "alt_url"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(sp, dk[sp.columns], check_dtype=False)
