"""Pagination list-ranking: hand pins (simple chain, branching
tree, cycle, self-loop, horizon cutoff), the early-stop==full-unroll
contract, and the DuckDB unrolled replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.redirects import (
    pagination_chains,
    pagination_chains_sql,
)

CHAIN = [(f"c{i}", f"c{i + 1}") for i in range(4)]          # c0..c4
BRANCH = [("b0", "b1"), ("b1", "b2"), ("b1x", "b2")]        # two preds of b2
CYCLE = [("y0", "y1"), ("y1", "y2"), ("y2", "y0")]
SELF = [("s0", "s0")]
LONG = [(f"L{i}", f"L{i + 1}") for i in range(40)]          # L0..L40


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, next_url string")


def _rows(df):
    return {r.url: (r.root_url, r.page_idx, r.complete) for r in df.collect()}


def test_simple_chain(spark):
    got = _rows(pagination_chains(_df(spark, CHAIN), rounds=4))
    assert got == {f"c{i}": ("c0", i + 1, True) for i in range(5)}


def test_branching_collapses_to_min_predecessor(spark):
    got = _rows(pagination_chains(_df(spark, BRANCH), rounds=4))
    # b2's predecessor set {b1, b1x} collapses to b1 -> root b0
    assert got["b2"] == ("b0", 3, True)
    assert got["b1x"] == ("b1x", 1, True)   # its own root: nothing points at it


def test_cycles_and_self_loops_never_complete(spark):
    got = _rows(pagination_chains(_df(spark, CYCLE + SELF), rounds=6))
    for n in ("y0", "y1", "y2", "s0"):
        assert got[n] == (None, None, False)


def test_resolution_horizon(spark):
    got = _rows(pagination_chains(_df(spark, LONG), rounds=5))
    # 2^5 = 32 predecessor hops: dist <= 32 resolves, deeper does not
    assert got["L32"] == ("L0", 33, True)
    assert got["L33"] == (None, None, False)
    assert got["L40"] == (None, None, False)
    # enough rounds resolves everything
    full = _rows(pagination_chains(_df(spark, LONG), rounds=6))
    assert full["L40"] == ("L0", 41, True)


def test_duckdb_replay_identical(spark):
    rows = CHAIN + BRANCH + CYCLE + SELF + LONG
    spark_pdf = (
        pagination_chains(_df(spark, rows), rounds=5)
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("links", pd.DataFrame(rows, columns=["url", "next_url"]))
    duck_pdf = (
        con.sql(pagination_chains_sql("links", rounds=5)).df()
        .sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)
