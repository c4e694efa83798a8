"""Scheme/www variant election: preference order pins, lone-variant
behavior, path-distinct grouping, schemeless passthrough, and the
DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.hostdup import (
    variant_preference,
    variant_preference_sql,
)

URLS = [
    # full quartet: https bare must win
    ("http://a.org/p",), ("http://www.a.org/p",),
    ("https://a.org/p",), ("https://www.a.org/p",),
    # http-only pair: bare beats www even without https
    ("http://b.org/x",), ("http://www.b.org/x",),
    # lone URL: its own preferred spelling
    ("https://c.org/solo",),
    # same host, different path: separate groups
    ("https://a.org/q",),
    # schemeless string: groups with nothing
    ("not-a-url",),
]


def _run(spark):
    df = spark.createDataFrame(URLS, "url string")
    return {r.url: r for r in variant_preference(df).collect()}


def test_preference_order(spark):
    got = _run(spark)
    for u in ("http://a.org/p", "http://www.a.org/p",
              "https://www.a.org/p"):
        assert got[u].preferred_url == "https://a.org/p"
        assert got[u].is_alias is True
    assert got["https://a.org/p"].is_alias is False
    assert got["http://b.org/x"].is_alias is False
    assert got["http://www.b.org/x"].preferred_url == "http://b.org/x"
    assert got["https://c.org/solo"].is_alias is False
    assert got["https://a.org/q"].is_alias is False
    assert got["not-a-url"].preferred_url == "not-a-url"


def test_variant_duckdb_replay(spark):
    spark_pdf = (
        variant_preference(spark.createDataFrame(URLS, "url string"))
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("urls", pd.DataFrame(URLS, columns=["url"]))
    duck_pdf = (
        con.sql(variant_preference_sql("urls")).df()
        .sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)
