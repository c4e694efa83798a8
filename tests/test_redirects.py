"""Redirect-chain resolution: chains, cycles, hop caps, duplicate
records — vs a pure-Python walk of the same semantics."""

from pyspark.sql import functions as F

from dblp_crawler_spark.operators.redirects import resolve_redirects


def _py_resolve(edges, max_hops=20):
    rmap = {}
    for s, d in edges:
        rmap[s] = min(d, rmap.get(s, d))
    out = {}
    for s in rmap:
        cur, hops = rmap[s], 1
        while cur in rmap and hops < max_hops:
            cur, hops = rmap[cur], hops + 1
        out[s] = (cur, hops, cur not in rmap)
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["src"]: (r["final"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, **kw).collect()
    }


def test_chain_resolves_to_terminal(spark):
    # 5 -> 4 -> 3 -> 2 -> 1 -> 0 (0 has no out-edge)
    edges = [(i, i - 1) for i in range(1, 6)]
    got = _run(spark, edges)
    assert got == _py_resolve(edges)
    assert got[5] == (0, 5, True)
    assert got[1] == (0, 1, True)


def test_cycle_hits_cap_unresolved(spark):
    edges = [(0, 1), (1, 2), (2, 0), (9, 0)]
    got = _run(spark, edges, max_hops=8)
    assert got == _py_resolve(edges, max_hops=8)
    assert all(not got[s][2] for s in (0, 1, 2, 9))
    assert got[0][1] == 8  # capped


def test_long_chain_beyond_cap(spark):
    edges = [(i, i - 1) for i in range(1, 30)]
    got = _run(spark, edges, max_hops=10)
    assert got == _py_resolve(edges, max_hops=10)
    assert got[29] == (19, 10, False)
    assert got[5] == (0, 5, True)


def test_duplicate_records_min_dst_wins(spark):
    edges = [(7, 3), (7, 5), (3, 1)]
    got = _run(spark, edges)
    assert got[7] == (1, 2, True)


def test_early_termination_round_count(spark):
    """A 3-hop chain under a 20-hop cap must not run 19 rounds:
    verify by semantics (exact hops) and that the result matches the
    Python walk — the Observation break is what keeps wall-clock
    O(longest chain)."""
    edges = [(1, 0), (2, 1), (3, 2)]
    got = _run(spark, edges, max_hops=20)
    assert got == _py_resolve(edges, max_hops=20)
    assert got[3] == (0, 3, True)
