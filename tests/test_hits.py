"""Integer-exact HITS (operators/hits.py): Spark vs the pure-Python
same-arithmetic reference, hub/authority separation on a known
topology, multi-edge multiplicity, and the divide-first
normalization's degenerate cases."""

import random

from dblp_crawler_spark.operators.hits import HITS_SCALE, hits, hits_py


def _run(spark, edge_list, parts=4, **kw):
    df = spark.createDataFrame(edge_list, "src long, dst long").repartition(parts)
    got = hits(df, **kw).collect()
    return {r["id"]: (r["auth_int"], r["hub_int"]) for r in got}


def test_hits_matches_python_reference_random_graphs(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 30 + 10 * trial
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(4 * n)]
        assert _run(spark, edges, iters=3) == hits_py(edges, iters=3)


def test_hits_partitioning_invariant(spark):
    rng = random.Random(23)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(90)]
    assert _run(spark, edges, parts=2, iters=2) == _run(spark, edges, parts=13, iters=2)


def test_hits_hub_authority_separation(spark):
    # bipartite fan: hubs 0,1 each point at authorities 10,11,12;
    # node 20 is isolated-ish (one self-contained edge to 21).
    edges = [(h, a) for h in (0, 1) for a in (10, 11, 12)] + [(20, 21)]
    got = _run(spark, edges, iters=3)
    # hubs have max hub score and zero authority (nothing points at them)
    assert got[0] == (0, HITS_SCALE) and got[1] == (0, HITS_SCALE)
    # authorities have max-tied authority and zero hub
    for a in (10, 11, 12):
        assert got[a][1] == 0 and got[a][0] == HITS_SCALE
    # the side pair is dominated: strictly lower than the main component
    assert got[20][1] < HITS_SCALE and got[21][0] < HITS_SCALE
    assert got == hits_py(edges, iters=3)


def test_hits_multi_edge_counts_with_multiplicity(spark):
    # u doubles its endorsement of a: a must outrank b on authority
    edges = [(0, 1), (0, 1), (0, 2)]
    got = _run(spark, edges, iters=2)
    assert got[1][0] > got[2][0]
    assert got == hits_py(edges, iters=2)


def test_hits_single_edge_degenerate(spark):
    got = _run(spark, [(0, 1)], iters=3)
    assert got[0] == (0, HITS_SCALE)   # sole hub
    assert got[1] == (HITS_SCALE, 0)   # sole authority
