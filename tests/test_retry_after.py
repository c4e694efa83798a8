"""RFC 9110 Retry-After parsing (operators/freshness.retry_after)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.freshness import retry_after, retry_after_sql

_CRLF = "\r\n"


def _log():
    return [
        # delta-seconds form
        ("u1", 429, "Retry-After: 120"),
        # HTTP-date form: difference vs Date
        ("u2", 503, "Date: Tue, 10 Jun 2025 04:00:00 GMT" + _CRLF
         + "Retry-After: Tue, 10 Jun 2025 04:05:00 GMT"),
        # date BEFORE Date header: clamps to 0, never negative
        ("u3", 503, "Date: Tue, 10 Jun 2025 04:00:00 GMT" + _CRLF
         + "Retry-After: Tue, 10 Jun 2025 03:00:00 GMT"),
        # date form without a Date header: no difference -> NULL
        ("u4", 429, "Retry-After: Tue, 10 Jun 2025 04:05:00 GMT"),
        # malformed -> NULL
        ("u5", 429, "Retry-After: soon"),
        # header absent on a rate-limited status
        ("u6", 503, "Content-Type: text/html"),
        # non-rate-limited status still parses the header (e.g. 3xx)
        ("u7", 301, "Retry-After: 30"),
        ("u8", 200, "Content-Type: image/png"),
    ]


def test_retry_after_pins(spark):
    df = spark.createDataFrame(_log(), "url string, status int, headers string")
    got = {r.url: (r.rate_limited, r.retry_after_s)
           for r in retry_after(df).collect()}
    assert got["u1"] == (True, 120)
    assert got["u2"] == (True, 300)
    assert got["u3"] == (True, 0)
    assert got["u4"] == (True, None)
    assert got["u5"] == (True, None)
    assert got["u6"] == (True, None)
    assert got["u7"] == (False, 30)
    assert got["u8"] == (False, None)


def test_retry_after_duckdb_replay(spark):
    df = spark.createDataFrame(_log(), "url string, status int, headers string")
    spark_pdf = (retry_after(df).toPandas()
                 .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("responses", pd.DataFrame(
        _log(), columns=["url", "status", "headers"]))
    duck_pdf = (con.sql(retry_after_sql("responses")).df()
                .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


# ---- revalidation validators -----------------------------------------------------

def _val_log():
    return [
        ("u1", 'ETag: "abc123"\r\nContent-Type: text/html'),
        ("u2", "Last-Modified: Tue, 10 Jun 2025 04:00:00 GMT"),
        # both present: BOTH conditions sent, If-None-Match first
        ("u3", 'Last-Modified: Tue, 10 Jun 2025 04:00:00 GMT\r\n'
               'ETag: W/"weak-1"'),
        # no validator: cond NULL (revalidate degrades to plain fetch)
        ("u4", "Content-Type: image/png"),
        # trailing whitespace trimmed, quotes/weak prefix kept verbatim
        ("u5", "ETag: \"  spaced  \"  \r\nX: y"),
    ]


def test_revalidation_headers_pins(spark):
    from dblp_crawler_spark.operators.freshness import revalidation_headers

    df = spark.createDataFrame(_val_log(), "url string, headers string")
    got = {r.url: (r.etag, r.last_modified, r.cond_headers)
           for r in revalidation_headers(df).collect()}
    assert got["u1"] == ('"abc123"', None, 'If-None-Match: "abc123"')
    assert got["u2"] == (None, "Tue, 10 Jun 2025 04:00:00 GMT",
                         "If-Modified-Since: Tue, 10 Jun 2025 04:00:00 GMT")
    assert got["u3"] == ('W/"weak-1"', "Tue, 10 Jun 2025 04:00:00 GMT",
                         'If-None-Match: W/"weak-1"\r\n'
                         "If-Modified-Since: Tue, 10 Jun 2025 04:00:00 GMT")
    assert got["u4"] == (None, None, None)
    assert got["u5"][0] == '"  spaced  "'   # inner spaces verbatim


def test_revalidation_headers_duckdb_replay(spark):
    from dblp_crawler_spark.operators.freshness import (
        revalidation_headers,
        revalidation_headers_sql,
    )

    df = spark.createDataFrame(_val_log(), "url string, headers string")
    spark_pdf = (revalidation_headers(df).toPandas()
                 .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("responses2", pd.DataFrame(
        _val_log(), columns=["url", "headers"]))
    duck_pdf = (con.sql(revalidation_headers_sql("responses2")).df()
                .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
