"""OpenGraph extraction: field pins (property/name spellings,
reversed attribute order, og:image vs og:image:alt separation,
relative URL resolution, first-occurrence rule) and the DuckDB
replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.sources.webparse import (
    og_image_caption,
    og_image_caption_sql,
)

PAGES = [
    ("https://a.org/post", (
        '<meta property="og:title" content="A Post">'
        '<meta property="og:image" content="/img/hero.jpg">'
        '<meta property="og:image:alt" content="A hero image">'
        '<meta property="og:description" content="What it is about">'
    )),
    # reversed attribute order + name= spelling + absolute image
    ("https://b.org/x", (
        "<meta content='https://cdn.b.org/1.png' name='og:image'>"
        "<meta content='B title' property='og:title'>"
    )),
    # two og:image tags: first wins
    ("https://c.org/y", (
        '<meta property="og:image" content="first.jpg">'
        '<meta property="og:image" content="second.jpg">'
    )),
    ("https://d.org/none", "<html>no og tags</html>"),
]


def _run(spark):
    df = spark.createDataFrame(PAGES, "url string, html string")
    return {r.url: r for r in og_image_caption(df).collect()}


def test_og_pins(spark):
    got = _run(spark)
    r = got["https://a.org/post"]
    assert r.og_image_url == "https://a.org/img/hero.jpg"
    assert (r.og_alt, r.og_title, r.og_description) == (
        "A hero image", "A Post", "What it is about")
    r = got["https://b.org/x"]
    assert (r.og_image_url, r.og_title) == ("https://cdn.b.org/1.png", "B title")
    assert got["https://c.org/y"].og_image_url == "https://c.org/first.jpg"
    r = got["https://d.org/none"]
    assert (r.og_image_url, r.og_alt, r.og_title, r.og_description) == (
        None, None, None, None)


def test_og_duckdb_replay(spark):
    spark_pdf = (
        og_image_caption(spark.createDataFrame(PAGES, "url string, html string"))
        .toPandas().sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", pd.DataFrame(PAGES, columns=["url", "html"]))
    duck_pdf = (
        con.sql(og_image_caption_sql("pages")).df()
        .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)
