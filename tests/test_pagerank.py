"""Integer-exact PageRank: Spark vs the pure-Python same-arithmetic
reference, determinism across partitionings, and ordering sanity on
a known topology."""

import random

import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.pagerank import pagerank, pagerank_py


def _run(spark, edge_list, parts=4, **kw):
    df = spark.createDataFrame(edge_list, "src long, dst long").repartition(parts)
    got = pagerank(df, **kw).collect()
    return {r["id"]: r["rank_int"] for r in got}


def test_pagerank_matches_python_reference_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40 + 10 * trial
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(4 * n)
        ]
        assert _run(spark, edges, iters=4) == pagerank_py(edges, iters=4)


def test_pagerank_partitioning_invariant(spark):
    """Integer mass arithmetic is order-independent: 1 partition and
    16 partitions produce bit-identical ranks."""
    rng = random.Random(11)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(300)]
    assert _run(spark, edges, parts=1) == _run(spark, edges, parts=16)


def test_pagerank_known_topology(spark):
    """Hub-and-spoke with a return edge: all spokes tie exactly, and
    the hub/its sole out-neighbor (who trade the big mass back and
    forth each iteration) both outrank every plain spoke."""
    edges = [(i, 0) for i in range(1, 9)] + [(0, 1)]
    got = _run(spark, edges, iters=6)
    spokes = {got[i] for i in range(2, 9)}
    assert len(spokes) == 1
    tie = spokes.pop()
    assert got[0] > tie and got[1] > tie
    assert got == pagerank_py(edges, iters=6)


def test_pagerank_dangling_and_dst_only_nodes(spark):
    """A destination-only node still gets ranked; a dangling node's
    mass evaporates without error."""
    edges = [(1, 2), (1, 3)]  # 2 and 3 are dangling, dst-only
    got = _run(spark, edges, iters=3)
    assert set(got) == {1, 2, 3}
    assert got[2] == got[3]
    assert got == pagerank_py(edges, iters=3)


# ---- TrustRank -------------------------------------------------------------
from dblp_crawler_spark.operators.pagerank import trustrank, trustrank_py


def _run_tr(spark, edge_list, seed_ids, parts=4, **kw):
    df = spark.createDataFrame(edge_list, "src long, dst long").repartition(parts)
    sdf = spark.createDataFrame([(s,) for s in seed_ids], "id long")
    got = trustrank(df, sdf, **kw).collect()
    return {r["id"]: r["trust_int"] for r in got}


def test_trustrank_matches_python_reference_random_graphs(spark):
    rng = random.Random(31)
    for trial in range(3):
        n = 30 + 10 * trial
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(4 * n)]
        seeds = [i for i in range(n) if i % 5 == 0]
        assert _run_tr(spark, edges, seeds, iters=4) == trustrank_py(edges, seeds, iters=4)


def test_trustrank_unreachable_spam_scores_zero(spark):
    # trusted component 0->1->2 cycle; spam farm 10<->11 mutually
    # linking but unreachable from any seed: zero trust, while plain
    # pagerank would happily rank the farm via its teleport base.
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10)]
    got = _run_tr(spark, edges, [0], iters=4)
    assert got[10] == 0 and got[11] == 0
    assert got[0] > 0 and got[1] > 0 and got[2] > 0
    pr = pagerank(
        spark.createDataFrame(edges, "src long, dst long"), iters=4
    ).collect()
    assert all(r["rank_int"] > 0 for r in pr)


def test_trustrank_seed_not_in_graph_ignored(spark):
    edges = [(0, 1)]
    got = _run_tr(spark, edges, [0, 99], iters=3)
    assert set(got) == {0, 1}
    assert got == trustrank_py(edges, [0, 99], iters=3)


def test_trustrank_trust_decays_with_distance(spark):
    # chain from the sole seed: each hop can only receive damped,
    # out-degree-split mass, so trust strictly decreases along it.
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run_tr(spark, edges, [0], iters=6)
    assert got[0] > got[1] > got[2] > got[3] >= 0


# ---- weighted (host-graph) PageRank ----------------------------------------
from dblp_crawler_spark.operators.pagerank import pagerank_weighted, pagerank_weighted_py


def _run_w(spark, triples, parts=4, **kw):
    df = spark.createDataFrame(triples, "src long, dst long, w long").repartition(parts)
    got = pagerank_weighted(df, **kw).collect()
    return {r["id"]: r["rank_int"] for r in got}


def test_weighted_pagerank_matches_python_reference(spark):
    rng = random.Random(47)
    for trial in range(3):
        n = 20 + 10 * trial
        triples = [(rng.randrange(n), rng.randrange(n), rng.randrange(1, 50))
                   for _ in range(3 * n)]
        assert _run_w(spark, triples, iters=4) == pagerank_weighted_py(triples, iters=4)


def test_weighted_tighter_than_expanded_multigraph(spark):
    # A weight-w edge vs w parallel unit edges: the weighted form
    # computes (r*w) div sw in ONE division — exactly lossless here
    # (single out-neighbor: (r*3) div 3 == r) — while the expanded
    # multigraph sends w copies of r div sw and evaporates r mod sw.
    # Host projection is therefore not just 1000× cheaper, it is
    # (slightly) MORE exact; pin both facts.
    triples = [(0, 1, 3), (1, 2, 5), (2, 0, 2)]
    expanded = [(u, v) for u, v, w in triples for _ in range(w)]
    got_w = _run_w(spark, triples, iters=4, r0=10**12)
    assert got_w == pagerank_weighted_py(triples, iters=4, r0=10**12)
    got_u = {r["id"]: r["rank_int"] for r in pagerank(
        spark.createDataFrame(expanded, "src long, dst long"), iters=4).collect()}
    assert all(got_w[n] >= got_u[n] for n in got_w)      # never lossier
    assert got_w == {n: 10**12 for n in (0, 1, 2)}       # cycle: exact fixpoint
    assert any(got_u[n] < 10**12 for n in got_u)         # expanded evaporates


def test_weighted_pagerank_weight_dominance(spark):
    # hub 0 links to 1 (weight 9) and 2 (weight 1): node 1 must
    # outrank node 2
    got = _run_w(spark, [(0, 1, 9), (0, 2, 1)], iters=3)
    assert got[1] > got[2]
