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
