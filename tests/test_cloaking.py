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


# ---- host scorecard composition ------------------------------------------------

def test_host_scorecard_pins(spark):
    from dblp_crawler_spark.operators.hostdup import host_scorecard

    probes = spark.createDataFrame(
        [("cloak.ex", f"/p{i}", ua, f"{ua[:1]}{i}")
         for i in range(4) for ua in ("crawler", "browser")]
        + [("clean.ex", f"/p{i}", ua, f"s{i}")
           for i in range(4) for ua in ("crawler", "browser")],
        "host string, url string, ua_class string, content_hash string")
    # soft404.ex: 6 of 10 pages share one hash (>= 40%, >= 5 pages)
    pages = spark.createDataFrame(
        [("soft404.ex", f"/p{i}", "TPL" if i < 6 else f"u{i}")
         for i in range(10)]
        + [("clean.ex", f"/p{i}", f"v{i}") for i in range(10)],
        "host string, url string, content_hash string")
    jpeg_ok = "FFD8FFE000104A46494600010100000100010000" + "FFD9"
    jpeg_cut = "FFD8FFE000104A46494600010100000100010000"
    bmp = "424D" + "00" * 20
    payloads = spark.createDataFrame(
        [("trunc.ex", jpeg_cut if i % 2 == 0 else jpeg_ok) for i in range(10)]
        + [("noev.ex", bmp) for _ in range(4)]
        + [("clean.ex", jpeg_ok) for _ in range(4)],
        "host string, hx string").select(
        "host", __import__("pyspark.sql.functions", fromlist=["unhex"])
        .unhex("hx").alias("bytes"))
    got = {r.host: (r.cloaking, r.soft404_milli, r.truncated_milli,
                    r.score, r.flagged)
           for r in host_scorecard(probes, pages, payloads).collect()}
    assert got["cloak.ex"] == (True, 0, 0, 400, False)
    assert got["soft404.ex"] == (False, 600, 0, 600, True)
    assert got["trunc.ex"] == (False, 0, 500, 500, True)
    # no trailer evidence is NOT truncation evidence
    assert got["noev.ex"] == (False, 0, 0, 0, False)
    assert got["clean.ex"] == (False, 0, 0, 0, False)


def test_host_scorecard_duckdb_replay(spark):
    from pyspark.sql import functions as F2
    from dblp_crawler_spark.operators.hostdup import (
        host_scorecard,
        host_scorecard_sql,
    )

    probes_rows = [("a.ex", f"/p{i}", ua,
                    f"{ua[:1]}{i}" if i % 2 == 0 else f"s{i}")
                   for i in range(6) for ua in ("crawler", "browser")]
    pages_rows = [("a.ex", f"/p{i}", "T" if i < 5 else f"u{i}")
                  for i in range(8)]
    jpeg_ok = "FFD8FFE000104A46494600010100000100010000" + "FFD9"
    jpeg_cut = "FFD8FFE000104A46494600010100000100010000"
    pay_rows = [("a.ex", jpeg_cut if i % 3 == 0 else jpeg_ok)
                for i in range(9)]
    probes = spark.createDataFrame(
        probes_rows, "host string, url string, ua_class string, content_hash string")
    pages = spark.createDataFrame(
        pages_rows, "host string, url string, content_hash string")
    payloads = spark.createDataFrame(pay_rows, "host string, hx string") \
        .select("host", F2.unhex("hx").alias("bytes"))
    spark_pdf = (host_scorecard(probes, pages, payloads).toPandas()
                 .sort_values("host").reset_index(drop=True))
    con = duckdb.connect()
    con.register("probes", pd.DataFrame(
        probes_rows, columns=["host", "url", "ua_class", "content_hash"]))
    con.register("s4pages", pd.DataFrame(
        pages_rows, columns=["host", "url", "content_hash"]))
    con.register("pay", pd.DataFrame(pay_rows, columns=["host", "h"]))
    duck_pdf = (con.sql(host_scorecard_sql("probes", "s4pages", "pay")).df()
                .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
