"""Markov transition matrix (streaming/events.transition_matrix)."""

import datetime as dt

import duckdb
import pandas as pd

from dblp_crawler_spark.streaming.events import (
    transition_matrix,
    transition_matrix_sql,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def test_transition_pins(spark):
    rows = [
        # user 1: view -> click -> view -> purchase
        (1, _ts(0), 1, "view"), (2, _ts(1), 1, "click"),
        (3, _ts(2), 1, "view"), (4, _ts(3), 1, "purchase"),
        # user 2: view -> view (transitions never cross users)
        (5, _ts(0), 2, "view"), (6, _ts(1), 2, "view"),
        # user 3: a single event contributes no transition
        (7, _ts(0), 3, "click"),
        # user 4: timestamp tie broken by event_id: view(8) -> click(9)
        (8, _ts(5), 4, "view"), (9, _ts(5), 4, "click"),
    ]
    out = transition_matrix(_events(spark, rows))
    got = {(r.from_type, r.to_type): (r.n, r.p) for r in out.collect()}
    assert got[("view", "click")] == (2, 0.5)
    assert got[("view", "view")] == (1, 0.25)
    assert got[("view", "purchase")] == (1, 0.25)
    assert got[("click", "view")] == (1, 1.0)
    assert len(got) == 4
    # probabilities per from_type sum to 1
    sums = {}
    for (f, _), (_, p) in got.items():
        sums[f] = round(sums.get(f, 0) + p, 6)
    assert set(sums.values()) == {1.0}


def test_transition_duckdb_replay(spark):
    rows = [(i, _ts(i % 7, i % 13), i % 5, ["a", "b", "c"][i % 3])
            for i in range(60)]
    sdf = _events(spark, rows)
    sp = (transition_matrix(sdf).toPandas()
          .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]))
    dk = (con.sql(transition_matrix_sql("events")).df()
          .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(sp, dk[sp.columns], check_dtype=False)
