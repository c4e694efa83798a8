"""Batch pins: politeness compliance (violation counting, per-host
delay column, single-fetch vacuous compliance), DNS fast-flux
(churn cross-multiplication, span-0 rule, stable CDN sets), and
sqrt temperature mixture (shares, boost, integer normalizer) — each
with its DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.hostdup import dns_churn, dns_churn_sql
from dblp_crawler_spark.operators.scheduler import (
    politeness_compliance,
    politeness_compliance_sql,
)
from dblp_crawler_spark.operators.textstats import (
    temperature_mixture,
    temperature_mixture_sql,
)

US = 1_000_000
FETCHES = (
    # polite host: gaps exactly at the delay
    [("ok.org", f"u{i}", i * 2 * US) for i in range(4)]
    # violator: two fetches 0.5 s apart under a 2 s delay
    + [("bad.org", "a", 0), ("bad.org", "b", US // 2), ("bad.org", "c", 3 * US)]
    + [("solo.org", "only", 7 * US)]
)


def test_compliance(spark):
    df = spark.createDataFrame(FETCHES, "host string, url string, ts_us long")
    got = {r.host: r for r in politeness_compliance(df, delay_us=2 * US).collect()}
    assert got["ok.org"].compliant is True and got["ok.org"].n_violations == 0
    r = got["bad.org"]
    assert (r.n_violations, r.min_gap_us, r.compliant) == (1, US // 2, False)
    r = got["solo.org"]
    assert (r.n_fetches, r.min_gap_us, r.compliant) == (1, None, True)


def test_compliance_per_host_delay_and_replay(spark):
    rows = [(h, u, t, 3 * US if h == "ok.org" else US) for h, u, t in FETCHES]
    df = spark.createDataFrame(rows,
                               "host string, url string, ts_us long, delay_us long")
    out = politeness_compliance(df)
    got = {r.host: r for r in out.collect()}
    # ok.org's 2 s gaps violate ITS OWN 3 s delay
    assert got["ok.org"].compliant is False and got["ok.org"].n_violations == 3
    assert got["bad.org"].n_violations == 1          # 0.5 s < 1 s; 2.5 s ok
    spark_pdf = out.toPandas().sort_values("host").reset_index(drop=True)
    con = duckdb.connect()
    con.register("log", pd.DataFrame(
        rows, columns=["host", "url", "ts_us", "delay_us"]))
    duck_pdf = (
        con.sql(politeness_compliance_sql("log")).df()
        .sort_values("host").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)


DNS = (
    # fast flux: 6 IPs inside one hour
    [("flux.example", f"10.0.0.{i}", i * 600 * US) for i in range(6)]
    # stable CDN: 4 observations, 2 IPs, over a month
    + [("cdn.example", f"20.0.0.{i % 2}", i * 7 * 86400 * US) for i in range(4)]
    # burst: 5 IPs at ONE instant (span 0) -> count alone decides
    + [("burst.example", f"30.0.0.{i}", 0) for i in range(5)]
    # slow growth: 5 IPs over 100 days -> not flux
    + [("slow.example", f"40.0.0.{i}", i * 25 * 86400 * US) for i in range(5)]
)


def test_dns_churn(spark):
    df = spark.createDataFrame(DNS, "host string, ip string, ts_us long")
    got = {r.host: r for r in dns_churn(df).collect()}
    assert got["flux.example"].fast_flux is True
    assert got["cdn.example"].fast_flux is False     # too few IPs
    assert got["burst.example"].fast_flux is True    # span 0, 5 IPs
    assert got["slow.example"].fast_flux is False    # churn too slow
    spark_pdf = (
        dns_churn(df).toPandas().sort_values("host").reset_index(drop=True))
    con = duckdb.connect()
    con.register("dns", pd.DataFrame(DNS, columns=["host", "ip", "ts_us"]))
    duck_pdf = (
        con.sql(dns_churn_sql("dns")).df()
        .sort_values("host").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)


DOCS = [("en", i) for i in range(64)] + [("fr", i) for i in range(16)] \
    + [("sw", 0)]


def test_temperature_mixture(spark):
    df = spark.createDataFrame(DOCS, "source string, doc_id long")
    got = {r.source: r for r in temperature_mixture(df).collect()}
    # weights 8 : 4 : 1 -> shares 8/13, 4/13, 1/13
    assert got["en"].temp_share == round(8 / 13, 6)
    assert got["fr"].temp_share == round(4 / 13, 6)
    assert got["sw"].temp_share == round(1 / 13, 6)
    # smoothing up-samples the tail, down-samples the head
    assert got["sw"].boost > 1.0 > got["en"].boost
    spark_pdf = (
        temperature_mixture(df).toPandas()
        .sort_values("source").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["source", "doc_id"]))
    duck_pdf = (
        con.sql(temperature_mixture_sql("docs")).df()
        .sort_values("source").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)
