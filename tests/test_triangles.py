"""Triangle counting / local clustering (operators/hits.triangle_counts)."""

import itertools

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.hits import (
    triangle_counts,
    triangle_counts_sql,
)


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    out = triangle_counts(df).orderBy("node").toPandas()
    return out


def test_k4_plus_pendant_pins(spark):
    # K4 on a-d (4 triangles, each corner in 3), pendant e, a self
    # loop and duplicate/reversed edges that must collapse
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("e", "a"), ("b", "a"), ("a", "b"), ("x", "x")]
    sp = _run(spark, edges)
    assert dict(zip(sp.node, sp.degree)) == {
        "a": 4, "b": 3, "c": 3, "d": 3, "e": 1}
    assert dict(zip(sp.node, sp.n_triangles)) == {
        "a": 3, "b": 3, "c": 3, "d": 3, "e": 0}
    cl = dict(zip(sp.node, sp.clustering))
    assert cl["b"] == 1.0 and cl["a"] == 0.5
    # degree-1 clustering is undefined, not zero
    assert pd.isna(cl["e"])
    # self loop contributes nothing
    assert "x" not in set(sp.node)


def test_matches_bruteforce_and_replay(spark):
    # deterministic pseudo-random graph (LCG, no RNG state)
    nodes = [f"n{i}" for i in range(12)]
    edges, x = [], 7
    for _ in range(40):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a = nodes[x % 12]
        x = (x * 1103515245 + 12345) % (1 << 31)
        b = nodes[x % 12]
        if a != b:
            edges.append((a, b))
    und = {frozenset(e) for e in edges}
    adj = {n: set() for n in nodes}
    for e in und:
        a, b = tuple(e)
        adj[a].add(b)
        adj[b].add(a)
    want_tri = {}
    for n in nodes:
        t = sum(1 for u, v in itertools.combinations(adj[n], 2)
                if v in adj[u])
        if adj[n]:
            want_tri[n] = t

    sp = _run(spark, edges)
    assert dict(zip(sp.node, sp.n_triangles)) == want_tri
    assert dict(zip(sp.node, sp.degree)) == {
        n: len(adj[n]) for n in nodes if adj[n]}

    con = duckdb.connect()
    con.register("edges", pd.DataFrame(edges, columns=["src", "dst"]))
    dk = (con.sql(triangle_counts_sql("edges")).df()
          .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        sp.reset_index(drop=True), dk[sp.columns], check_dtype=False)


def test_no_cartesian_in_plan(spark):
    edges = [("a", "b"), ("b", "c"), ("a", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    plan = triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
