"""figure/figcaption, data-URI, and lazy-load image discovery
channels (sources/webparse)."""

import base64

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.sources.webparse import (
    data_uri_images,
    data_uri_images_sql,
    figure_captions,
    figure_captions_sql,
    lazyload_images,
    lazyload_images_sql,
)

_PNG_40x30 = bytes.fromhex(
    "89504E470D0A1A0A" + "0000000D49484452"
    + "00000028" + "0000001E" + "0802000000"
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _replay(spark, sdf, con, sql, keys):
    spark_pdf = sdf.toPandas().sort_values(keys).reset_index(drop=True)
    duck_pdf = con.sql(sql).df().sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_figure_captions_pins(spark):
    html = (
        '<figure class="hero"><img src="/a.jpg" alt="alt text">'
        "<figcaption>A <b>bold</b>\n  caption</figcaption></figure>"
        '<figure><img src="b.png"></figure>'            # no figcaption
        "<figure><figcaption>orphan</figcaption></figure>"  # no img → drop
        '<p><img src="loose.gif"></p>'                  # not in a figure
    )
    pages = _pages(spark, [("https://ex.org/g/p.html", html)])
    rows = {r.fig_idx: r for r in figure_captions(pages).collect()}
    assert len(rows) == 2
    assert rows[0].img_url == "https://ex.org/a.jpg"
    assert rows[0].caption == "A bold caption"        # tags stripped, ws folded
    assert rows[1].img_url == "https://ex.org/g/b.png"
    assert rows[1].caption is None


def test_figure_captions_duckdb_replay(spark):
    html0 = ('<figure><img src="/a.jpg"><figcaption>Cap <i>one</i>'
             "</figcaption></figure><figure><img src=rel.png></figure>")
    pages = _pages(spark, [("https://ex.org/x/", html0),
                           ("https://ex.org/y", "<p>no figures</p>")])
    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    _replay(spark, figure_captions(pages), con,
            figure_captions_sql("pages"), ["url", "fig_idx"])


def test_data_uri_images_pins(spark):
    b64 = base64.b64encode(_PNG_40x30).decode()
    html = (
        f'<img src="data:image/png;base64,{b64}">'
        # declared gif but the payload is PNG — sniff wins
        f'<img src="data:image/gif;base64,{b64}">'
        '<img src="https://cdn.ex.org/real.jpg">'       # not a data URI
        '<img src="data:image/png;base64,###">'          # invalid grammar
    )
    pages = _pages(spark, [("https://ex.org/p", html)])
    rows = {r.tag_idx: r for r in data_uri_images(pages).collect()}
    assert len(rows) == 2
    assert (rows[0].declared_fmt, rows[0].fmt, rows[0].width,
            rows[0].height) == ("png", "png", 40, 30)
    assert (rows[1].declared_fmt, rows[1].fmt) == ("gif", "png")
    assert rows[0].payload_bytes == len(_PNG_40x30)


def test_data_uri_images_duckdb_replay(spark):
    b64 = base64.b64encode(_PNG_40x30).decode()
    html = (f'<img src="data:image/png;base64,{b64}">'
            '<img src="/f.jpg">')
    pages = _pages(spark, [("https://ex.org/p", html)])
    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    _replay(spark, data_uri_images(pages), con,
            data_uri_images_sql("pages"), ["url", "tag_idx"])


def test_lazyload_images_pins(spark):
    html = (
        '<img src="ph.gif" data-src="/real1.jpg">'
        '<img loading="lazy" src="data:image/gif;base64,R0lGODlhAQABAA==">'
        '<img data-srcset="/r2-s.jpg 320w, /r2-l.jpg 1280w" src="ph.gif">'
        '<img src="/eager.png" loading="eager">'
    )
    pages = _pages(spark, [("https://ex.org/d/p", html)])
    rows = {r.tag_idx: r for r in lazyload_images(pages).collect()}
    assert rows[0].is_lazy and rows[0].effective_url == "https://ex.org/real1.jpg"
    assert rows[0].src_url == "https://ex.org/d/ph.gif"
    # data: placeholder + loading=lazy, but nothing to salvage
    assert rows[1].is_lazy and rows[1].effective_url is None
    assert rows[2].is_lazy
    assert rows[2].effective_url == "https://ex.org/r2-s.jpg"  # first candidate
    assert not rows[3].is_lazy
    assert rows[3].effective_url == "https://ex.org/eager.png"


def test_lazyload_images_duckdb_replay(spark):
    html = ('<img src="ph.gif" data-src="/real1.jpg">'
            "<img data-srcset='/r2.jpg 2x' src=ph2.gif loading=lazy>"
            '<img src="/plain.png">')
    pages = _pages(spark, [("https://ex.org/d/p", html)])
    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    _replay(spark, lazyload_images(pages), con,
            lazyload_images_sql("pages"), ["url", "tag_idx"])


def test_caption_election(spark):
    from dblp_crawler_spark.sources.webparse import (
        caption_election,
        caption_election_sql,
    )
    html = (
        '<meta property="og:image" content="/i/2.jpg">'
        '<meta property="og:image:alt" content="og caption two">'
        '<figure><img src="/i/1.jpg"><figcaption>fig caption one'
        "</figcaption></figure>"
        '<img src="/i/1.jpg" alt="alt one">'
        '<img src="/i/2.jpg" alt="alt two">'
        '<img src="/i/3.jpg" alt="alt three">'
        '<img src="/i/4.jpg">'
    )
    pages = _pages(spark, [("https://ex.org/p", html)])
    out = caption_election(pages)
    got = {r.img_url: (r.caption, r.channel, r.n_candidates)
           for r in out.collect()}
    assert got["https://ex.org/i/1.jpg"] == ("fig caption one", "figcaption", 2)
    assert got["https://ex.org/i/2.jpg"] == ("og caption two", "og", 2)
    assert got["https://ex.org/i/3.jpg"] == ("alt three", "img_alt", 1)
    assert "https://ex.org/i/4.jpg" not in got      # no caption anywhere

    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    _replay(spark, out, con, caption_election_sql("pages"),
            ["url", "img_url"])


def test_jsonld_images(spark):
    from dblp_crawler_spark.sources.webparse import (
        jsonld_images,
        jsonld_images_sql,
    )
    block1 = ('{"@context":"https://schema.org","@type":"ImageObject",'
              '"contentUrl":"/photos/cat.jpg","caption":"a cat",'
              '"license":"https://creativecommons.org/licenses/by/4.0/",'
              '"acquireLicensePage":"https://ex.org/buy",'
              '"creditText":"Jo Doe","creator":{"@type":"Person","name":"Jo"}}')
    block2 = '{"@type":"NewsArticle","headline":"irrelevant"}'
    block3 = '{"@type":"ImageObject","url":"https://cdn.ex.net/d.png"}'
    bad = '{"@type":"ImageObject", broken'
    html = "".join(
        f'<script type="application/ld+json">{b}</script>'
        for b in (block1, block2, block3, bad)
    )
    pages = _pages(spark, [("https://ex.org/a/p", html)])
    out = jsonld_images(pages)
    got = {r.image_url: r for r in out.collect()}
    assert len(got) == 2
    r = got["https://ex.org/photos/cat.jpg"]
    assert (r.caption, r.credit, r.creator) == ("a cat", "Jo Doe", "Jo")
    assert r.license.startswith("https://creativecommons.org/")
    assert r.acquire_license_page == "https://ex.org/buy"
    r2 = got["https://cdn.ex.net/d.png"]          # url fallback
    assert r2.caption is None and r2.license is None

    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    _replay(spark, out, con, jsonld_images_sql("pages"),
            ["url", "block_idx"])


def test_data_uri_noncanonical_base64_drops_both_engines(spark):
    """ADVICE r3: '=' mid-string passed the old charset regex and the
    %4 gate; Spark's unbase64 decoded it leniently while DuckDB's
    from_base64 raised a hard error. The canonical grammar
    ([A-Za-z0-9+/]+={0,2}$) must drop it on BOTH engines."""
    import base64 as _b64

    b64 = _b64.b64encode(_PNG_40x30).decode()
    html = (
        f'<img src="data:image/png;base64,{b64}">'
        '<img src="data:image/png;base64,AA=A">'       # '=' mid-string
        '<img src="data:image/png;base64,A===">'       # 3 pad chars
        '<img src="data:image/png;base64,====">'       # pad only
        f'<img src="data:image/png;base64,{b64[:-1]}=">'  # canonical pad ok
    )
    pages = _pages(spark, [("https://ex.org/p", html)])
    rows = sorted(r.tag_idx for r in data_uri_images(pages).collect())
    assert rows == [0, 4]
    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    _replay(spark, data_uri_images(pages), con,
            data_uri_images_sql("pages"), ["url", "tag_idx"])
