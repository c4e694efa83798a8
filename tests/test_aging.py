"""Priority aging: the starvation-overtake guarantee, the age cap,
rank contiguity/determinism, and the DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.scheduler import (
    AGING_RATE,
    aged_priority,
    aging_order,
    aging_order_sql,
)

SCHEMA = "url string, priority long, enqueue_wave long"
A_FRESH = ("https://a.org/x", (3 << 48) + (2020 << 32) + 65536, 20)  # class A, just queued
N_STARVED = ("https://n.org/y", (0 << 48) + (1995 << 32) + 65530, 0)  # class N, wave 0


def test_starved_url_overtakes_fresh_top_class(spark):
    df = spark.createDataFrame([A_FRESH, N_STARVED], SCHEMA)
    # early: static order holds (age 8 → 8*2^46 = 2*2^48 < class gap)
    early = {r.url: r.pop_rank for r in aging_order(df, current_wave=8).collect()}
    assert early["https://a.org/x"] == 0 and early["https://n.org/y"] == 1
    # starved: age 20 → 5*2^48 > the 3-class gap → N pops first
    late = {r.url: r.pop_rank for r in aging_order(df, current_wave=20).collect()}
    assert late["https://n.org/y"] == 0 and late["https://a.org/x"] == 1


def test_age_cap_bounds_the_boost(spark):
    rows = [("u1", 100, 0), ("u2", 100, 0)]
    df = spark.createDataFrame(rows, SCHEMA)
    at_cap = aging_order(df, current_wave=64).select("eff_priority").first()[0]
    past_cap = aging_order(df, current_wave=500).select("eff_priority").first()[0]
    assert at_cap == past_cap == 100 + 64 * AGING_RATE


def test_never_negative_age(spark):
    """A URL enqueued 'in the future' (clock skew between shards)
    must not get a negative boost."""
    df = spark.createDataFrame([("u", 100, 30)], SCHEMA)
    r = aging_order(df, current_wave=20).first()
    assert r.age == 0 and r.eff_priority == 100


def test_rank_contiguous_deterministic_and_sql_replay(spark):
    rows = [
        (f"https://h{i % 5}.org/p/{i}", ((i % 4) << 48) + ((1990 + i % 30) << 32) + i,
         i % 17)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = aging_order(df, current_wave=20).orderBy("pop_rank").collect()
    assert [r.pop_rank for r in got] == list(range(200))
    again = aging_order(df, current_wave=20).orderBy("pop_rank").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    con = duckdb.connect()
    con.register("fr", pd.DataFrame(rows, columns=["url", "priority", "enqueue_wave"]))
    duck = (
        con.sql(aging_order_sql("fr", current_wave=20)).df()
        .sort_values("pop_rank").reset_index(drop=True)
    )
    spark_pdf = (
        aging_order(df, current_wave=20).toPandas()
        .sort_values("pop_rank").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck[spark_pdf.columns], check_dtype=False)
