"""Registrable domain (PSL longest-match): multi-label suffixes,
fallback rule, host-is-suffix, single-label hosts, port strip, and
the DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.frontier import (
    DEFAULT_PUBLIC_SUFFIXES,
    registrable_domain,
    registrable_domain_sql,
)


def _run(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return {r.host: (r.suffix, r.registrable)
            for r in registrable_domain(df).collect()}


def test_longest_match_and_fallback(spark):
    got = _run(spark, [
        "a.b.example.co.uk",     # deep subdomain of a 2-label suffix
        "example.co.uk",         # exactly registrable
        "co.uk",                 # host IS the suffix → itself
        "www.example.com",       # no multi-label match → last-2 rule
        "example.org",
        "localhost",             # single label
        "sub.shop.com.au:8080",  # port stripped
    ])
    assert got["a.b.example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["co.uk"] == ("uk", "co.uk")
    assert got["www.example.com"] == ("com", "example.com")
    assert got["example.org"] == ("org", "example.org")
    assert got["localhost"] == ("localhost", "localhost")
    assert got["sub.shop.com.au:8080"] == ("com.au", "shop.com.au")


def test_grouping_property(spark):
    """Every subdomain of one site maps to ONE registrable key — the
    politeness-grouping property the operator exists for."""
    subs = [f"{p}.mysite.ac.uk" for p in ("www", "a", "a.b", "x.y.z")]
    got = _run(spark, subs + ["mysite.ac.uk"])
    assert {v[1] for v in got.values()} == {"mysite.ac.uk"}


def test_duckdb_replay_identical(spark):
    hosts = [
        "a.b.example.co.uk", "example.co.uk", "co.uk", "www.example.com",
        "localhost", "shop.com.au", "x.org.uk", "deep.sub.site.ne.jp",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    spark_pdf = (
        registrable_domain(df).toPandas()
        .sort_values("host").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("hosts", pd.DataFrame({"host": hosts}))
    psl = "(SELECT unnest([" + ", ".join(
        f"'{s}'" for s in DEFAULT_PUBLIC_SUFFIXES
    ) + "]) AS suffix)"
    duck_pdf = (
        con.sql(registrable_domain_sql("hosts", psl)).df()
        .sort_values("host").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_psl_dim_is_broadcast(spark):
    df = spark.createDataFrame([("a.example.co.uk",)], "host string")
    plan = registrable_domain(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
