"""AIMD adaptive per-host crawl delay: hand-computed schedules
(latency-proportional base, exponential failure backoff, cap and
clamps), order-free streak, DuckDB replay."""

from datetime import datetime, timedelta

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.scheduler import (
    adaptive_crawl_delay,
    adaptive_crawl_delay_sql,
)

T0 = datetime(2026, 1, 1)


def _rows():
    rows = []

    def add(host, lats, oks):
        for i, (lat, ok) in enumerate(zip(lats, oks)):
            rows.append((host, lat, ok, T0 + timedelta(seconds=i)))

    add("fast.org", [100] * 20, [True] * 20)          # p95=100 -> base 500
    add("slow.org", [i * 100 for i in range(1, 21)], [True] * 20)  # p95=1900
    add("flaky.org", [100] * 5, [True, True, False, False, False])  # streak 3
    add("dead.org", [100] * 4, [False] * 4)           # streak 4, never ok
    add("verydead.org", [100] * 10, [False] * 10)     # streak 10 -> cap 6
    add("glacial.org", [600_000] * 20, [True] * 20)   # p95 clamps at max
    return rows


EXPECTED = {
    "fast.org": (20, 100, 0, 500),        # svc=max(500,200)=500
    "slow.org": (20, 1900, 0, 3800),      # svc=2*1900
    "flaky.org": (5, 100, 3, 4000),       # 500 << 3
    "dead.org": (4, 100, 4, 8000),        # 500 << 4
    "verydead.org": (10, 100, 10, 32000), # 500 << min(10,6)
    "glacial.org": (20, 600_000, 0, 600_000),  # max clamp
}


def _df(spark):
    return spark.createDataFrame(
        _rows(), "host string, latency_ms long, ok boolean, ts timestamp"
    )


def test_hand_computed_schedule(spark):
    got = {r.host: (r.n, r.p95_ms, r.fail_streak, r.delay_ms)
           for r in adaptive_crawl_delay(_df(spark)).collect()}
    assert got == EXPECTED


def test_min_clamp(spark):
    df = spark.createDataFrame(
        [("tiny.org", 50, True, T0)],
        "host string, latency_ms long, ok boolean, ts timestamp",
    )
    r = adaptive_crawl_delay(df, base_ms=100, min_ms=250).collect()[0]
    # svc = max(100, 2*50) = 100, clamped up to min_ms
    assert (r.p95_ms, r.delay_ms) == (50, 250)


def test_success_after_failures_resets_streak(spark):
    df = spark.createDataFrame(
        [
            ("h.org", 100, False, T0),
            ("h.org", 100, False, T0 + timedelta(seconds=1)),
            ("h.org", 100, True, T0 + timedelta(seconds=2)),
        ],
        "host string, latency_ms long, ok boolean, ts timestamp",
    )
    r = adaptive_crawl_delay(df).collect()[0]
    assert (r.fail_streak, r.delay_ms) == (0, 500)


def test_matches_duckdb_replay(spark):
    eng = sorted(tuple(r) for r in adaptive_crawl_delay(_df(spark)).collect())
    con = duckdb.connect()
    con.register(
        "fetch_log",
        pd.DataFrame(_rows(), columns=["host", "latency_ms", "ok", "ts"]),
    )
    ora = sorted(con.execute(adaptive_crawl_delay_sql("fetch_log")).fetchall())
    assert eng == ora
