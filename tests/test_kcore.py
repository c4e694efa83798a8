"""k-core peel: synchronous-round semantics pinned by hand
(triangle + pendant tail peels one node per round), K5 core
survival/collapse, edge-noise collapse, the converged==fixed-round
contract, a random-graph pin against the sequential reference, and
the DuckDB unrolled replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.hits import (
    kcore,
    kcore_converged,
    kcore_py,
    kcore_sql,
)

# triangle a-b-c with a tail c-d-e: k=2 peels e (round 1) then d
# (round 2); the triangle is the 2-core.
TAIL = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
K5 = [(f"n{i}", f"n{j}") for i in range(5) for j in range(i + 1, 5)]


def _df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def _rows(df):
    return {r.node: r.degree for r in df.collect()}


def test_synchronous_round_semantics(spark):
    e = _df(spark, TAIL)
    # round 1 drops only e: d still present with its shrunk degree
    assert _rows(kcore(e, k=2, rounds=1)) == {"a": 2, "b": 2, "c": 3, "d": 1}
    # round 2 drops d; fixpoint
    assert _rows(kcore(e, k=2, rounds=2)) == {"a": 2, "b": 2, "c": 2}
    assert _rows(kcore(e, k=2, rounds=5)) == {"a": 2, "b": 2, "c": 2}


def test_k5_core_and_collapse(spark):
    e = _df(spark, K5 + [("n4", "p0"), ("p0", "p1")])
    got = _rows(kcore(e, k=4, rounds=4))
    assert got == {f"n{i}": 4 for i in range(5)}
    # k above the clique degree empties the graph entirely
    assert _rows(kcore(e, k=5, rounds=4)) == {}


def test_noise_collapses(spark):
    # duplicates, reversed duplicates, and self-loops don't inflate degree
    e = _df(spark, TAIL + [("b", "a"), ("a", "b"), ("c", "c")])
    assert _rows(kcore(e, k=2, rounds=3)) == {"a": 2, "b": 2, "c": 2}


def test_converged_matches_fixed_rounds(spark):
    e = _df(spark, TAIL + K5 + [("n0", "c")])
    assert _rows(kcore_converged(e, k=2)) == _rows(kcore(e, k=2, rounds=8))
    assert _rows(kcore_converged(e, k=3)) == _rows(kcore(e, k=3, rounds=8))


def _lcg_edges(n_nodes=18, n_edges=60, seed=7):
    x, out = seed, []
    for _ in range(n_edges):
        x = (x * 1103515245 + 12345) % (2**31)
        u = x % n_nodes
        x = (x * 1103515245 + 12345) % (2**31)
        v = x % n_nodes
        out.append((f"h{u}", f"h{v}"))
    return out

def test_random_graph_vs_sequential_reference(spark):
    edges = _lcg_edges()
    for k in (2, 3, 4):
        assert _rows(kcore(_df(spark, edges), k=k, rounds=10)) == \
            kcore_py(edges, k=k, rounds=10)


def test_duckdb_replay_identical(spark):
    edges = _lcg_edges(seed=11) + TAIL + K5
    spark_pdf = (
        kcore(_df(spark, edges), k=3, rounds=3)  # deliberately unconverged
        .toPandas().sort_values("node").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("edges", pd.DataFrame(edges, columns=["src", "dst"]))
    duck_pdf = (
        con.sql(kcore_sql("edges", k=3, rounds=3)).df()
        .sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)
