"""robots.txt drift: verdict pins for both flip directions (incl. a
wildcard-Allow override that only the full RFC 9309 longest-match
logic gets right), rule-less-host behavior, and the DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.scheduler import (
    robots_drift,
    robots_drift_sql,
)

URLS = [
    ("https://a.org/pub/1",),
    ("https://a.org/private/1",),
    ("https://a.org/private/pub-x",),
    ("https://a.org/tmp/1",),
    ("https://b.org/anything",),
    ("https://c.org/x/1",),
]
# old: a.org disallows /tmp only; c.org disallows /x
OLD = [("a.org", "disallow", "/tmp"), ("c.org", "disallow", "/x")]
# new: a.org disallows /private too, but Allow: /private/pub* wins by
# length; /tmp is released; c.org unchanged
NEW = [
    ("a.org", "disallow", "/private"),
    ("a.org", "allow", "/private/pub*"),
    ("c.org", "disallow", "/x"),
]


def _run(spark):
    urls = spark.createDataFrame(URLS, "url string")
    old = spark.createDataFrame(OLD, "host string, rule string, pattern string")
    new = spark.createDataFrame(NEW, "host string, rule string, pattern string")
    return {r.url: r for r in robots_drift(urls, old, new).collect()}


def test_drift_verdicts(spark):
    got = _run(spark)
    assert got["https://a.org/pub/1"].verdict == "still_allowed"
    r = got["https://a.org/private/1"]
    assert (r.allowed_old, r.allowed_new, r.verdict) == (True, False, "newly_blocked")
    # the wildcard Allow override keeps this one crawlable
    assert got["https://a.org/private/pub-x"].verdict == "still_allowed"
    r = got["https://a.org/tmp/1"]
    assert (r.allowed_old, r.allowed_new, r.verdict) == (False, True, "newly_allowed")
    # a host with no rules in either set stays allowed
    assert got["https://b.org/anything"].verdict == "still_allowed"
    assert got["https://c.org/x/1"].verdict == "still_blocked"


def test_drift_duckdb_replay(spark):
    urls = spark.createDataFrame(URLS, "url string")
    old = spark.createDataFrame(OLD, "host string, rule string, pattern string")
    new = spark.createDataFrame(NEW, "host string, rule string, pattern string")
    spark_pdf = (
        robots_drift(urls, old, new)
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cand_urls", pd.DataFrame(URLS, columns=["url"]))
    con.register("r_old", pd.DataFrame(OLD, columns=["host", "rule", "pattern"]))
    con.register("r_new", pd.DataFrame(NEW, columns=["host", "rule", "pattern"]))
    duck_pdf = (
        con.sql(robots_drift_sql("cand_urls", "r_old", "r_new")).df()
        .sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)
