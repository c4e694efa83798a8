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
