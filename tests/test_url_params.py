"""Query-parameter significance mining
(functions/urlnorm.url_param_significance)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.functions.urlnorm import (
    url_param_significance,
    url_param_significance_sql,
)


def _log():
    h = "s.example"
    return [
        # utm varies, hash fixed -> invariant evidence (2 groups)
        (h, "https://s.example/a?id=1&utm=x", "A1"),
        (h, "https://s.example/a?id=1&utm=y", "A1"),
        (h, "https://s.example/b?utm=1", "B"),
        (h, "https://s.example/b?utm=2", "B"),
        # id varies, hash changes -> counterexample
        (h, "https://s.example/a?id=2&utm=x", "A2"),
        # refetch of the same URL collapses before grouping
        (h, "https://s.example/a?id=1&utm=x", "A1"),
        # 'once' never varies -> no evidence at all
        (h, "https://s.example/c?once=1", "C"),
        # mixed.example: ok in one group, counterexample in another
        ("mixed.example", "https://mixed.example/p?t=1", "M1"),
        ("mixed.example", "https://mixed.example/p?t=2", "M1"),
        ("mixed.example", "https://mixed.example/q?t=1", "N1"),
        ("mixed.example", "https://mixed.example/q?t=2", "N2"),
        # bare flag param (no '='): value is '' in every row -> no variation
        (h, "https://s.example/d?flag", "D"),
        (h, "https://s.example/d?flag&z=1", "D"),
    ]


def test_param_significance_pins(spark):
    df = spark.createDataFrame(
        _log(), "host string, url string, content_hash string")
    got = {(r.host, r.param): (r.n_tested, r.n_invariant, r.strippable)
           for r in url_param_significance(df).collect()}
    assert got[("s.example", "utm")] == (2, 2, True)
    # one counterexample -> vetoed even though utm groups existed
    assert got[("s.example", "id")] == (1, 0, False)
    assert got[("s.example", "once")] == (0, 0, False)
    assert got[("s.example", "flag")] == (0, 0, False)
    # a single counterexample among invariant groups vetoes
    assert got[("mixed.example", "t")] == (2, 1, False)


def test_param_significance_min_groups(spark):
    # one invariant group only: below min_groups=2 -> not strippable
    rows = [("h", "https://h/x?u=1", "X"), ("h", "https://h/x?u=2", "X")]
    df = spark.createDataFrame(rows, "host string, url string, content_hash string")
    r = url_param_significance(df).collect()[0]
    assert (r.n_tested, r.n_invariant, r.strippable) == (1, 1, False)
    r2 = url_param_significance(df, min_groups=1).collect()[0]
    assert r2.strippable


def test_param_significance_duckdb_replay(spark):
    df = spark.createDataFrame(
        _log(), "host string, url string, content_hash string")
    spark_pdf = (url_param_significance(df).toPandas()
                 .sort_values(["host", "param"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("fetch_log", pd.DataFrame(
        _log(), columns=["host", "url", "content_hash"]))
    duck_pdf = (con.sql(url_param_significance_sql("fetch_log")).df()
                .sort_values(["host", "param"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


# ---- RFC 3986 percent-encoding normalization -----------------------------------

def _pct_cases():
    return [
        # unreserved decode + reserved preserved + case uppercased
        "https://a.ex/%7euser/%41%42?x=%2Fpath%3a1",
        "https://a.ex/plain",
        # malformed triplets untouched
        "https://a.ex/bad%zz%4",
        # %25 is the percent itself: reserved, never double-decoded
        "https://a.ex/pct%2525",
        "https://a.ex/tail%",
        "%41-leading",
    ]


def test_percent_normalize_pins(spark):
    from pyspark.sql import functions as F2
    from dblp_crawler_spark.functions.urlnorm import percent_normalize

    df = spark.createDataFrame([(c,) for c in _pct_cases()], "u string")
    got = [r.o for r in df.select(percent_normalize("u").alias("o")).collect()]
    assert got == [
        "https://a.ex/~user/AB?x=%2Fpath%3A1",
        "https://a.ex/plain",
        "https://a.ex/bad%zz%4",
        "https://a.ex/pct%2525",
        "https://a.ex/tail%",
        "A-leading",
    ]


def test_percent_normalize_duckdb_replay(spark):
    from pyspark.sql import functions as F2
    from dblp_crawler_spark.functions.urlnorm import (
        percent_normalize,
        percent_normalize_sql,
    )

    df = spark.createDataFrame([(c,) for c in _pct_cases()], "u string")
    got = [r.o for r in df.select(percent_normalize("u").alias("o")).collect()]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"u": _pct_cases()}))
    duck = [r[0] for r in
            con.sql(f"SELECT {percent_normalize_sql('u')} FROM t").fetchall()]
    assert got == duck


def _py_percent_normalize(u: str) -> str:
    """From-scratch sequential reference of the two RFC 3986 §6.2.2
    rules (unreserved decode + triplet uppercase)."""
    unreserved = set("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                     "abcdefghijklmnopqrstuvwxyz0123456789-._~")
    out, i = [], 0
    while i < len(u):
        c = u[i]
        if c == "%" and i + 2 < len(u) + 1 and len(u) - i >= 3 \
                and all(x in "0123456789abcdefABCDEF" for x in u[i+1:i+3]):
            ch = chr(int(u[i+1:i+3], 16))
            if ch in unreserved:
                out.append(ch)
            else:
                out.append("%" + u[i+1:i+3].upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(urls=st.lists(
    st.text(alphabet="abz%417EfG2-._~/?=&", min_size=0, max_size=30),
    min_size=1, max_size=8))
def test_percent_normalize_matches_python_reference(spark, urls):
    from dblp_crawler_spark.functions.urlnorm import percent_normalize

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r.o for r in
           df.select(percent_normalize("u").alias("o")).collect()]
    assert got == [_py_percent_normalize(u) for u in urls]
