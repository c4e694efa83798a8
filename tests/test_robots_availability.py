"""RFC 9309 §2.3.1 availability tri-state: the 4xx-vs-5xx inversion
guard, the 30-day unreachable relaxation with streak reset, network
errors as 5xx, and the DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.scheduler import (
    robots_availability,
    robots_availability_sql,
)

DAY = 86400 * 1_000_000
SCHEMA = "host string, ts_us long, status int"


def _modes(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r.host: r.mode for r in robots_availability(df, **kw).collect()}


def test_tri_state_and_inversion_guard(spark):
    rows = [
        ("ok", 0, 200),
        ("absent", 0, 404),        # 4xx = no robots file → crawl freely
        ("down", 0, 503),          # 5xx = server can't say → full disallow
        ("neterr", 0, None),       # network error behaves like 5xx
        ("redir", 0, 302),         # non-2xx non-5xx latest → unavailable
    ]
    got = _modes(spark, rows)
    assert got == {
        "ok": "use_rules", "absent": "allow_all", "down": "disallow_all",
        "neterr": "disallow_all", "redir": "allow_all",
    }


def test_latest_attempt_wins(spark):
    rows = [("h", 0, 503), ("h", DAY, 200)]       # recovered
    assert _modes(spark, rows) == {"h": "use_rules"}
    rows = [("g", 0, 200), ("g", DAY, 503)]       # newly down
    assert _modes(spark, rows) == {"g": "disallow_all"}


def test_thirty_day_relaxation_and_streak_reset(spark):
    # unreachable for 40 days straight → MAY treat as unavailable
    stale = [("s", i * 10 * DAY, 503) for i in range(5)]  # streak spans 40d
    assert _modes(spark, stale) == {"s": "allow_all"}
    # a mid-streak SUCCESS resets the clock: only 10 days since →
    # still disallow even though the first 5xx was 40 days ago
    reset = [("r", 0, 503), ("r", 20 * DAY, 200),
             ("r", 30 * DAY, 503), ("r", 40 * DAY, 503)]
    assert _modes(spark, reset) == {"r": "disallow_all"}


def test_duckdb_replay_identical(spark):
    rows = [
        (f"h{i % 7}", (i // 7) * 3 * DAY,
         [200, 404, 503, None, 500, 200, 301][i % 7])
        for i in range(70)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    spark_pdf = (
        robots_availability(df).toPandas()
        .sort_values("host").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("log", pd.DataFrame(rows, columns=["host", "ts_us", "status"]))
    duck_pdf = (
        con.sql(robots_availability_sql("log")).df()
        .sort_values("host").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
