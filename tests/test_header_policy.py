"""Composed header verdict (operators/freshness.header_policy)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.freshness import (
    header_policy,
    header_policy_sql,
)

_CRLF = "\r\n"


def _log():
    return [
        # plain cacheable page: everything ok, ttl from max-age
        ("u1", 200, "Cache-Control: max-age=600"),
        # no-store + noarchive are BOTH archive vetoes
        ("u2", 200, "Cache-Control: no-store"),
        ("u3", 200, "X-Robots-Tag: noarchive"),
        # image noindex lives only in the header
        ("u4", 200, "Content-Type: image/jpeg" + _CRLF
         + "X-Robots-Tag: noimageindex"),
        # rate-limited with a named price
        ("u5", 429, "Retry-After: 120"),
        # rate-limited with NO price: backoff_s NULL, flag still true
        ("u6", 503, "Content-Type: text/html"),
        # a 200 carrying Retry-After is NOT rate-limited: backoff NULL
        ("u7", 200, "Retry-After: 60"),
        # no-cache + directives combined
        ("u8", 200, "Cache-Control: no-cache, max-age=30" + _CRLF
         + "X-Robots-Tag: none"),
    ]


def test_header_policy_pins(spark):
    df = spark.createDataFrame(_log(), "url string, status int, headers string")
    got = {r.url: r for r in header_policy(df).collect()}
    r = got["u1"]
    assert (r.archive_ok, r.index_ok, r.follow_ok, r.image_index_ok,
            r.rate_limited, r.backoff_s, r.no_cache, r.ttl_s) == (
        True, True, True, True, False, None, False, 600)
    assert got["u2"].archive_ok is False and got["u2"].ttl_s == 0
    assert got["u3"].archive_ok is False and got["u3"].index_ok is True
    assert got["u4"].image_index_ok is False and got["u4"].index_ok is True
    assert (got["u5"].rate_limited, got["u5"].backoff_s) == (True, 120)
    assert (got["u6"].rate_limited, got["u6"].backoff_s) == (True, None)
    assert (got["u7"].rate_limited, got["u7"].backoff_s) == (False, None)
    r8 = got["u8"]
    assert (r8.no_cache, r8.ttl_s, r8.index_ok, r8.follow_ok) == (
        True, 30, False, False)


def test_header_policy_duckdb_replay(spark):
    df = spark.createDataFrame(_log(), "url string, status int, headers string")
    spark_pdf = (header_policy(df).toPandas()
                 .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("responses", pd.DataFrame(
        _log(), columns=["url", "status", "headers"]))
    duck_pdf = (con.sql(header_policy_sql("responses")).df()
                .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
