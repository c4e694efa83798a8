"""Changefreq audit: verdict pins for over/under/accurate bands,
'always' honesty, no_signal families (junk enum, never, single
fetch, no observed change), and the DuckDB replay."""

from datetime import datetime, timedelta

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.recrawl import (
    changefreq_audit,
    changefreq_audit_sql,
)

T0 = datetime(2024, 1, 1)


def _fetches():
    rows = []

    def add(url, hours_fps):
        for h, fp in hours_fps:
            rows.append((url, T0 + timedelta(hours=h), fp))

    # daily claim, observed ~1 change/day over 2 days: accurate
    add("u_acc", [(0, "a"), (24, "b"), (48, "c")])
    # hourly claim, content never changed across a week until one flip:
    # declared 3600 * 2 * 1 < span 604800 -> over_declared
    add("u_over", [(0, "a"), (84, "a"), (168, "b")])
    # monthly claim but it changed every hour: under_declared
    add("u_under", [(0, "a"), (1, "b"), (2, "c")])
    # 'always' and every revisit changed: accurate
    add("u_always_ok", [(0, "a"), (5, "b"), (9, "c")])
    # 'always' but one revisit was identical: over_declared
    add("u_always_bad", [(0, "a"), (5, "a"), (9, "b")])
    # never / junk / single fetch / static content: no_signal
    add("u_never", [(0, "a"), (24, "b")])
    add("u_junk", [(0, "a"), (24, "b")])
    add("u_single", [(0, "a")])
    add("u_static", [(0, "a"), (24, "a"), (48, "a")])
    return rows


DECLARED = [
    ("u_acc", "daily"), ("u_over", "hourly"), ("u_under", "monthly"),
    ("u_always_ok", "always"), ("u_always_bad", "always"),
    ("u_never", "never"), ("u_junk", "sometimes"),
    ("u_single", "daily"), ("u_static", "daily"),
]


def _dfs(spark):
    f = spark.createDataFrame(_fetches(),
                              "url string, ts timestamp, fingerprint string")
    d = spark.createDataFrame(DECLARED, "url string, changefreq string")
    return f, d


def test_audit_verdicts(spark):
    f, d = _dfs(spark)
    got = {r.url: r.verdict for r in changefreq_audit(f, d).collect()}
    assert got == {
        "u_acc": "accurate",
        "u_over": "over_declared",
        "u_under": "under_declared",
        "u_always_ok": "accurate",
        "u_always_bad": "over_declared",
        "u_never": "no_signal",
        "u_junk": "no_signal",
        "u_single": "no_signal",
        "u_static": "no_signal",
    }


def test_audit_duckdb_replay(spark):
    f, d = _dfs(spark)
    spark_pdf = (
        changefreq_audit(f, d)
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("fetches", pd.DataFrame(
        _fetches(), columns=["url", "ts", "fingerprint"]))
    con.register("declared", pd.DataFrame(
        DECLARED, columns=["url", "changefreq"]))
    duck_pdf = (
        con.sql(changefreq_audit_sql("fetches", "declared")).df()
        .sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
