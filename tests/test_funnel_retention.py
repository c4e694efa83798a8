"""Conversion funnel and retention cohorts: hand-built event
sequences pinning the ordering/horizon semantics, plus DuckDB replay
equality on both."""

import datetime as dt

import duckdb
import pandas as pd

from dblp_crawler_spark.streaming.events import (
    funnel,
    funnel_sql,
    retention_cohorts,
    retention_cohorts_sql,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, hours, user, etype):
    return (eid, T0 + dt.timedelta(hours=hours), user, etype)


EVENTS = [
    # u1: clean view -> click -> purchase (all within 72h)
    _ev(1, 0, 1, "view"), _ev(2, 1, 1, "click"), _ev(3, 2, 1, "purchase"),
    # u2: purchase BEFORE any view — must not count as stage 3
    _ev(4, 0, 2, "purchase"), _ev(5, 1, 2, "view"), _ev(6, 2, 2, "click"),
    # u3: click only after the 72h horizon from first view
    _ev(7, 0, 3, "view"), _ev(8, 100, 3, "click"),
    # u4: click with NO view at all — stage 2 requires stage 1 first
    _ev(9, 0, 4, "click"), _ev(10, 1, 4, "purchase"),
    # u5: view only
    _ev(11, 0, 5, "view"),
]
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def test_funnel_order_and_horizon(spark):
    df = spark.createDataFrame(EVENTS, SCHEMA)
    got = {r.stage: r.n_users for r in funnel(df).collect()}
    # stage 1 (view): u1, u2, u3, u5
    assert got[1] == 4
    # stage 2 (click after view, within 72h): u1, u2 — u3 misses the
    # horizon, u4 has no view
    assert got[2] == 2
    # stage 3 (purchase after qualifying click): u1 only — u2's
    # purchase preceded everything
    assert got[3] == 1


def test_funnel_duckdb_replay_identical(spark):
    df = spark.createDataFrame(EVENTS, SCHEMA)
    got = funnel(df).toPandas().sort_values("stage").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", pd.DataFrame(
        EVENTS, columns=["event_id", "ts", "user_id", "event_type"]))
    want = (
        con.sql(funnel_sql("events")).df()
        .sort_values("stage").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


RET_EVENTS = [
    # cohort A (Jan 1): u1 active weeks 0,1,2; u2 active weeks 0,2
    _ev(1, 0, 1, "view"), _ev(2, 24 * 7, 1, "view"), _ev(3, 24 * 14, 1, "view"),
    _ev(4, 0, 2, "view"), _ev(5, 24 * 15, 2, "view"),
    # cohort B (Jan 2): u3 active week 0 only
    _ev(6, 24, 3, "view"),
]


def test_retention_hand_counts(spark):
    df = spark.createDataFrame(RET_EVENTS, SCHEMA)
    got = {(str(r.cohort_date), r.week_k): r for r in retention_cohorts(df).collect()}
    a = "2024-01-01"
    assert got[(a, 0)].n_cohort == 2 and got[(a, 0)].n_active == 2
    assert got[(a, 1)].n_active == 1 and got[(a, 1)].retention_pct == 50.0
    assert got[(a, 2)].n_active == 2 and got[(a, 2)].retention_pct == 100.0
    assert got[("2024-01-02", 0)].n_cohort == 1


def test_retention_duckdb_replay_identical(spark):
    df = spark.createDataFrame(RET_EVENTS, SCHEMA)
    got = (
        retention_cohorts(df).toPandas()
        .sort_values(["cohort_date", "week_k"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", pd.DataFrame(
        RET_EVENTS, columns=["event_id", "ts", "user_id", "event_type"]))
    want = (
        con.sql(retention_cohorts_sql("events")).df()
        .sort_values(["cohort_date", "week_k"]).reset_index(drop=True)
    )
    got["cohort_date"] = got["cohort_date"].astype(str)
    want["cohort_date"] = want["cohort_date"].astype(str)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
