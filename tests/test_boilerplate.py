"""Host-frequency boilerplate removal
(sources/webparse.strip_boilerplate)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.sources.webparse import (
    strip_boilerplate,
    strip_boilerplate_sql,
)

_NAV = "Home | About | Contact"
_FOOT = "(c) 2026 BigHost Inc"


def _pages():
    rows = []
    # big.example: 4 pages sharing nav+footer, unique bodies
    for i in range(4):
        rows.append(("big.example", f"/p{i}",
                     f"{_NAV}\nunique body {i} line one\n\n"
                     f"unique body {i} line two\n{_FOOT}"))
    # one page also repeats its OWN line 3 times: repetition is not
    # boilerplate evidence (distinct-page counting)
    rows.append(("big.example", "/p4",
                 f"{_NAV}\nself repeat\nself repeat\nself repeat\n{_FOOT}"))
    # tiny.example: 2 pages sharing a line -> below min_pages, kept
    rows.append(("tiny.example", "/a", "shared line\nbody a"))
    rows.append(("tiny.example", "/b", "shared line\nbody b"))
    return rows


def test_strip_boilerplate_pins(spark):
    df = spark.createDataFrame(_pages(), "host string, url string, text string")
    got = {(r.host, r.url): (r.content, r.n_kept, r.n_dropped)
           for r in strip_boilerplate(df).collect()}
    c0 = got[("big.example", "/p0")]
    # nav + footer gone, body order preserved, blank line dropped
    assert c0 == ("unique body 0 line one\nunique body 0 line two", 2, 2)
    c4 = got[("big.example", "/p4")]
    # self-repeated line survives (1 page of 5 < 50%); 3 copies kept
    assert c4 == ("self repeat\nself repeat\nself repeat", 3, 2)
    # small host: no evidence, nothing removed
    assert got[("tiny.example", "/a")] == ("shared line\nbody a", 2, 0)


def test_strip_boilerplate_duckdb_replay(spark):
    df = spark.createDataFrame(_pages(), "host string, url string, text string")
    spark_pdf = (strip_boilerplate(df).toPandas()
                 .sort_values(["host", "url"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", pd.DataFrame(
        _pages(), columns=["host", "url", "text"]))
    duck_pdf = (con.sql(strip_boilerplate_sql("pages")).df()
                .sort_values(["host", "url"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
