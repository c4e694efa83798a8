"""X-Robots-Tag header directives (sources/webparse.x_robots_tag)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.sources.webparse import x_robots_tag, x_robots_tag_sql

_CRLF = "\r\n"


def _pages():
    return [
        ("u1", "HTTP/1.1 200 OK" + _CRLF + "X-Robots-Tag: noindex, nofollow"
         + _CRLF + "Content-Type: image/jpeg"),
        # 'none' implies both
        ("u2", "X-Robots-Tag: none"),
        # scoped to us: applies with the scope stripped
        ("u3", "X-Robots-Tag: spark-frontier: noimageindex"),
        # scoped to another bot: ignored
        ("u4", "X-Robots-Tag: googlebot: noindex"),
        # unavailable_after is a directive, NOT a scope
        ("u5", "X-Robots-Tag: unavailable_after: 25 Jun 2026 15:00:00 GMT,"
         " noarchive"),
        # multiple headers accumulate; case-insensitive header name
        ("u6", "x-robots-tag: noindex" + _CRLF + "X-ROBOTS-TAG: noarchive"),
        ("u7", "Content-Type: text/html"),
        # token boundaries: 'noindexing' is not 'noindex'
        ("u8", "X-Robots-Tag: noindexing"),
    ]


def test_x_robots_tag_pins(spark):
    df = spark.createDataFrame(_pages(), "url string, headers string")
    got = {r.url: (r.noindex, r.nofollow, r.noimageindex, r.noarchive)
           for r in x_robots_tag(df).collect()}
    assert got["u1"] == (True, True, False, False)
    assert got["u2"] == (True, True, False, False)
    assert got["u3"] == (False, False, True, False)
    assert got["u4"] == (False, False, False, False)
    assert got["u5"] == (False, False, False, True)
    assert got["u6"] == (True, False, False, True)
    assert got["u7"] == (False, False, False, False)
    assert got["u8"] == (False, False, False, False)


def test_x_robots_tag_other_ua(spark):
    df = spark.createDataFrame(_pages(), "url string, headers string")
    got = {r.url: r.noindex for r in x_robots_tag(df, ua="googlebot").collect()}
    assert got["u4"] is True          # now scoped to us
    assert got["u3"] is False or True  # scope stripped only for our ua
    got3 = {r.url: r.noimageindex
            for r in x_robots_tag(df, ua="googlebot").collect()}
    assert got3["u3"] is False        # spark-frontier scope ignored


def test_x_robots_tag_duckdb_replay(spark):
    df = spark.createDataFrame(_pages(), "url string, headers string")
    spark_pdf = (x_robots_tag(df).toPandas()
                 .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("header_pages",
                 pd.DataFrame(_pages(), columns=["url", "headers"]))
    duck_pdf = (con.sql(x_robots_tag_sql("header_pages")).df()
                .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


# ---- hreflang reciprocity -----------------------------------------------------

def _alt_rows():
    return [
        ("a.en", "de", "a.de"),   # reciprocal (a.de declares back)
        ("a.de", "en", "a.en"),   # reciprocal
        ("a.en", "it", "a.it"),   # a.it never a source -> NULL
        ("a.fr", "de", "a.de"),   # a.de IS a source, no back edge -> false
        ("a.fr", "fr", "a.fr"),   # self-declaration: its own back edge
    ]


def test_hreflang_reciprocity_pins(spark):
    from dblp_crawler_spark.sources.webparse import hreflang_reciprocity

    df = spark.createDataFrame(
        _alt_rows(), "url string, hreflang string, alt_url string")
    got = {(r.url, r.alt_url): r.reciprocal
           for r in hreflang_reciprocity(df).collect()}
    assert got[("a.en", "a.de")] is True
    assert got[("a.de", "a.en")] is True
    assert got[("a.en", "a.it")] is None
    assert got[("a.fr", "a.de")] is False
    assert got[("a.fr", "a.fr")] is True


def test_hreflang_reciprocity_duckdb_replay(spark):
    from dblp_crawler_spark.sources.webparse import (
        hreflang_reciprocity,
        hreflang_reciprocity_sql,
    )

    df = spark.createDataFrame(
        _alt_rows(), "url string, hreflang string, alt_url string")
    spark_pdf = (hreflang_reciprocity(df).toPandas()
                 .sort_values(["url", "alt_url"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("alts", pd.DataFrame(
        _alt_rows(), columns=["url", "hreflang", "alt_url"]))
    duck_pdf = (con.sql(hreflang_reciprocity_sql("alts")).df()
                .sort_values(["url", "alt_url"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
