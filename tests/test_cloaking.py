"""UA-conditional cloaking detection (operators/hostdup.cloaking_detect)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.hostdup import (
    cloaking_detect,
    cloaking_detect_sql,
)


def _log():
    rows = []
    # cloaker: 4 paired URLs, all divergent
    for i in range(4):
        rows += [("cloak.example", f"/p{i}", "crawler", f"bot{i}"),
                 ("cloak.example", f"/p{i}", "browser", f"hum{i}")]
    # honest: 4 paired URLs, identical content
    for i in range(4):
        rows += [("honest.example", f"/p{i}", "crawler", f"same{i}"),
                 ("honest.example", f"/p{i}", "browser", f"same{i}")]
    # below min_paired: 2 paired, both divergent -> no evidence
    for i in range(2):
        rows += [("tiny.example", f"/p{i}", "crawler", f"a{i}"),
                 ("tiny.example", f"/p{i}", "browser", f"b{i}")]
    # unpaired: crawler-only fetches never count
    for i in range(6):
        rows += [("solo.example", f"/p{i}", "crawler", f"c{i}")]
    # rate below tau (300/1000): 1 divergent of 4 paired = 250
    for i in range(4):
        rows += [("noisy.example", f"/p{i}", "crawler",
                  "diff" if i == 0 else f"s{i}"),
                 ("noisy.example", f"/p{i}", "browser", f"s{i}")]
    # refetch collapse: two crawler fetches, min picks 'x1'; browser 'x1'
    rows += [("refetch.example", "/p0", "crawler", "x2"),
             ("refetch.example", "/p0", "crawler", "x1"),
             ("refetch.example", "/p0", "browser", "x1"),
             ("refetch.example", "/p1", "crawler", "y"),
             ("refetch.example", "/p1", "browser", "y"),
             ("refetch.example", "/p2", "crawler", "z"),
             ("refetch.example", "/p2", "browser", "z")]
    # an off-vocabulary UA label is ignored entirely
    rows += [("honest.example", "/p0", "weird-ua", "junk")]
    return rows


def test_cloaking_pins(spark):
    df = spark.createDataFrame(
        _log(), "host string, url string, ua_class string, content_hash string")
    got = {r.host: (r.n_paired, r.n_divergent, r.cloaking)
           for r in cloaking_detect(df).collect()}
    assert got["cloak.example"] == (4, 4, True)
    assert got["honest.example"] == (4, 0, False)
    assert got["tiny.example"] == (2, 2, False)       # min_paired gate
    assert got["solo.example"] == (0, 0, False)       # unpaired never counts
    assert got["noisy.example"] == (4, 1, False)      # 250 < 300 milli
    assert got["refetch.example"] == (3, 0, False)    # min-collapse agrees


def test_cloaking_duckdb_replay(spark):
    df = spark.createDataFrame(
        _log(), "host string, url string, ua_class string, content_hash string")
    spark_pdf = (cloaking_detect(df).toPandas()
                 .sort_values("host").reset_index(drop=True))
    con = duckdb.connect()
    con.register("fetch_log", pd.DataFrame(
        _log(), columns=["host", "url", "ua_class", "content_hash"]))
    duck_pdf = (con.sql(cloaking_detect_sql("fetch_log")).df()
                .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
