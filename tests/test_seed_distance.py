"""Seed hop distance: hand pins (layers, directionality,
unreachable NULL, multi-seed min, early-stop==unroll), the
sequential-reference contract on a random graph, and the DuckDB
unrolled replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.hits import (
    seed_distance,
    seed_distance_py,
    seed_distance_sql,
)

# s -> a -> b -> c; x -> s (x reaches s but s never reaches x);
# d isolated pair d -> e (unreachable from s)
EDGES = [("s", "a"), ("a", "b"), ("b", "c"), ("x", "s"), ("d", "e")]


def _run(spark, edges, seed_ids, rounds):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(i,) for i in seed_ids], "id string")
    return {r.node: r.dist for r in seed_distance(e, s, rounds).collect()}


def test_layers_and_directionality(spark):
    got = _run(spark, EDGES, ["s"], rounds=6)
    assert got == {"s": 0, "a": 1, "b": 2, "c": 3,
                   "x": None, "d": None, "e": None}


def test_multi_seed_takes_min(spark):
    got = _run(spark, EDGES, ["s", "b"], rounds=6)
    assert got["c"] == 1 and got["a"] == 1 and got["b"] == 0


def test_rounds_bound_resolution(spark):
    got = _run(spark, EDGES, ["s"], rounds=2)
    assert got["b"] == 2 and got["c"] is None    # c needs round 3


def _lcg_edges(n_nodes=16, n_edges=40, seed=5):
    x, out = seed, []
    for _ in range(n_edges):
        x = (x * 1103515245 + 12345) % (2**31)
        u = x % n_nodes
        x = (x * 1103515245 + 12345) % (2**31)
        v = x % n_nodes
        out.append((f"h{u}", f"h{v}"))
    return out


def test_random_graph_vs_reference(spark):
    edges = _lcg_edges()
    got = _run(spark, edges, ["h0", "h3"], rounds=10)
    assert got == seed_distance_py(edges, ["h0", "h3"], rounds=10)


def test_duckdb_replay_identical(spark):
    edges = _lcg_edges(seed=9) + EDGES
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([("s",), ("h1",)], "id string")
    spark_pdf = (
        seed_distance(e, s, rounds=4)   # deliberately may be unconverged
        .toPandas().sort_values("node").reset_index(drop=True))
    con = duckdb.connect()
    con.register("edges", pd.DataFrame(edges, columns=["src", "dst"]))
    con.register("seeds", pd.DataFrame([("s",), ("h1",)], columns=["id"]))
    duck_pdf = (
        con.sql(seed_distance_sql("edges", "seeds", rounds=4)).df()
        .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)
