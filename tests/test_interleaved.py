"""Interleaved image/text segmentation
(sources/webparse.interleaved_segments)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.sources.webparse import (
    interleaved_segments,
    interleaved_segments_sql,
)

_HTML = ('<html><body><p>intro &amp; setup</p>'
         '<IMG src="https://a.ex/1.jpg" alt="one">'
         '<p>middle text</p>'
         '<img src=\'https://a.ex/2.png\'/>'
         '<img data-x="no src here">'
         '<p>tail</p></body></html>')


def _pages():
    return [
        ("u1", _HTML),
        # consecutive images: no empty text row between them
        ("u2", '<img src="https://b.ex/x.jpg"><img src="https://b.ex/y.jpg">end'),
        ("u3", "<p>text only page</p>"),
    ]


def test_interleaved_pins(spark):
    df = spark.createDataFrame(_pages(), "url string, html string")
    rows = sorted(
        [(r.url, r.seq, r.kind, r.content)
         for r in interleaved_segments(df).collect()])
    u1 = [(k, c) for (u, s, k, c) in rows if u == "u1"]
    # order preserved; uppercase IMG splits; srcless img only splits;
    # entities decode in text
    assert u1 == [
        ("text", "intro & setup"),
        ("image", "https://a.ex/1.jpg"),
        ("text", "middle text"),
        ("image", "https://a.ex/2.png"),
        ("text", "tail"),
    ]
    u2 = [(k, c) for (u, s, k, c) in rows if u == "u2"]
    assert u2 == [("image", "https://b.ex/x.jpg"),
                  ("image", "https://b.ex/y.jpg"), ("text", "end")]
    u3 = [(k, c) for (u, s, k, c) in rows if u == "u3"]
    assert u3 == [("text", "text only page")]


def test_interleaved_duckdb_replay(spark):
    df = spark.createDataFrame(_pages(), "url string, html string")
    spark_pdf = (interleaved_segments(df).toPandas()
                 .sort_values(["url", "seq"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("html_pages", pd.DataFrame(
        _pages(), columns=["url", "html"]))
    duck_pdf = (con.sql(interleaved_segments_sql()).df()
                .sort_values(["url", "seq"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
