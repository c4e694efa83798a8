"""Politeness fetch timeline: the prefix-max closed form must equal
the sequential simulator exactly — hand pins, random equivalence,
per-host independence, per-host delay column, DuckDB replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.scheduler import (
    politeness_timeline,
    politeness_timeline_sql,
)

SCHEMA = "host string, url string, ready_us long"


def _simulate(rows, delay):
    """The sequential recurrence, literally."""
    out = {}
    by_host = {}
    for host, url, ready in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        by_host.setdefault(host, []).append((url, ready))
    for host, items in by_host.items():
        prev_end = None
        for k, (url, ready) in enumerate(items):
            start = ready if prev_end is None else max(ready, prev_end)
            out[url] = (k, start, start + delay)
            prev_end = start + delay
    return out


def test_hand_pins(spark):
    rows = [
        ("h", "u1", 0), ("h", "u2", 0), ("h", "u3", 10), ("h", "u4", 10),
        ("g", "v1", 0), ("g", "v2", 100),     # idle gap: v2 starts at 100, not 4
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.url: (r.k, r.start_us, r.finish_us)
           for r in politeness_timeline(df, delay_us=4).collect()}
    assert got["u1"] == (0, 0, 4)
    assert got["u2"] == (1, 4, 8)
    assert got["u3"] == (2, 10, 14)   # ready at 10 > prev_end 8
    assert got["u4"] == (3, 14, 18)   # backlogged behind u3
    assert got["v1"] == (0, 0, 4)
    assert got["v2"] == (1, 100, 104)


def test_matches_sequential_simulator(spark):
    rows = [
        (f"h{i % 5}", f"u{i}", (i * 37) % 60)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.url: (r.k, r.start_us, r.finish_us)
           for r in politeness_timeline(df, delay_us=7).collect()}
    assert got == _simulate(rows, 7)


def test_per_host_delay_column(spark):
    rows = [("a", "u1", 0, 10), ("a", "u2", 0, 10), ("b", "v1", 0, 2), ("b", "v2", 0, 2)]
    df = spark.createDataFrame(rows, SCHEMA + ", delay_us long")
    got = {r.url: r.start_us for r in politeness_timeline(df).collect()}
    assert got == {"u1": 0, "u2": 10, "v1": 0, "v2": 2}


def test_duckdb_replay_identical(spark):
    rows = [(f"h{i % 3}", f"u{i}", (i * 13) % 40) for i in range(60)]
    df = spark.createDataFrame(rows, SCHEMA)
    spark_pdf = (
        politeness_timeline(df, delay_us=5).toPandas()
        .sort_values("url").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("b", pd.DataFrame(rows, columns=["host", "url", "ready_us"]))
    duck_pdf = (
        con.sql(politeness_timeline_sql("b", delay_us=5)).df()
        .sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


def test_single_host_exchange(spark):
    rows = [(f"h{i % 3}", f"u{i}", i) for i in range(30)]
    df = spark.createDataFrame(rows, SCHEMA)
    plan = (
        politeness_timeline(df, delay_us=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # rank + running max share one shuffle


def test_parallel_timeline_pins_and_replay(spark):
    import duckdb
    import pandas as pd

    from dblp_crawler_spark.operators.scheduler import (
        politeness_timeline,
        politeness_timeline_parallel,
        politeness_timeline_parallel_sql,
    )

    rows = [("a", f"u{i}", 0) for i in range(6)] + \
           [("b", "v0", 0), ("b", "v1", 0), ("b", "v2", 500)]
    df = spark.createDataFrame(rows, "host string, url string, ready_us long")

    # nconn=2, d=100: host a lanes alternate; drain halves vs serial
    out = {(r.host, r.url): r for r in
           politeness_timeline_parallel(df, nconn=2, delay_us=100).collect()}
    assert [(out[("a", f"u{i}")].lane, out[("a", f"u{i}")].start_us)
            for i in range(6)] == [
        (0, 0), (1, 0), (0, 100), (1, 100), (0, 200), (1, 200)]
    # host b: v2 ready late on lane 0 after v0 → max(500, 0+100)=500
    assert out[("b", "v0")].start_us == 0
    assert out[("b", "v1")].start_us == 0
    assert out[("b", "v2")].start_us == 500

    # nconn=1 degenerates to the serial operator exactly
    serial = {(r.host, r.url): (r.k, r.start_us, r.finish_us)
              for r in politeness_timeline(df, delay_us=100).collect()}
    par1 = {(r.host, r.url): (r.k, r.start_us, r.finish_us)
            for r in politeness_timeline_parallel(
                df, nconn=1, delay_us=100).collect()}
    assert serial == par1

    # per-lane spacing property on a bigger random-ish batch
    rows2 = [(f"h{i % 3}", f"w{i:03d}", (i * 137) % 900) for i in range(60)]
    df2 = spark.createDataFrame(rows2, "host string, url string, ready_us long")
    big = politeness_timeline_parallel(df2, nconn=2, delay_us=250).collect()
    by_lane = {}
    for r in big:
        by_lane.setdefault((r.host, r.lane), []).append((r.k, r.start_us))
    for starts in by_lane.values():
        starts.sort()
        for (_, s1), (_, s2) in zip(starts, starts[1:]):
            assert s2 - s1 >= 250
    for r in big:
        assert r.start_us >= r.ready_us

    # replay
    spark_pdf = (
        politeness_timeline_parallel(df2, nconn=2, delay_us=250)
        .toPandas().sort_values(["host", "url"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("batch", pd.DataFrame(
        rows2, columns=["host", "url", "ready_us"]))
    duck_pdf = (
        con.sql(politeness_timeline_parallel_sql("batch", nconn=2,
                                                 delay_us=250)).df()
        .sort_values(["host", "url"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
