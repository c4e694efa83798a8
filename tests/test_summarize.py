"""Summary collapse (A3-A5, J6) + legacy JSON equality vs the oracle's
reference-faithful dict_summary, and the offline filter API (F5)."""

import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark import fixtures, oracle
from dblp_crawler_spark.operators import summarize as S
from dblp_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def crawled(spark, universe, tmp_path_factory):
    from dblp_crawler_spark.lakehouse import Lakehouse

    lake = Lakehouse(spark, str(tmp_path_factory.mktemp("sumlake")))
    fixtures.write_tables(spark, lake, universe)
    cfg = CrawlConfig(year=universe.year_filter, rules=universe.keyword_rules, max_attempts=2)
    eng = CrawlEngine(spark, lake, cfg)
    eng.initialize()
    eng.run_to_end()
    res = oracle.run_oracle(universe, max_attempts=2)
    return lake, res


def test_dict_summary_matches_oracle(spark, universe, crawled):
    lake, res = crawled
    got = S.dict_summary(lake.read("nodes"), lake.read("edges"), lake.read("publications"))
    want = oracle.dict_summary(res, universe)
    assert set(got["nodes"]) == set(want["nodes"])
    assert got["nodes"] == want["nodes"]
    assert got["edges"] == want["edges"]
    assert set(got["publications"]) == set(want["publications"])
    assert got["publications"] == want["publications"]


def test_summary_nodes_only_edge_incident(spark, crawled):
    lake, res = crawled
    sn = S.summary_nodes(lake.read("nodes"), lake.read("edges"))
    incident = {p for a, b, _ in res.edges for p in (a, b)}
    assert {r.pid for r in sn.collect()} == incident


def test_filters_f5(spark, crawled):
    lake, res = crawled
    nodes, edges, pubs = lake.read("nodes"), lake.read("edges"), lake.read("publications")
    sn, se = S.summary_nodes(nodes, edges), S.summary_edges(nodes, edges)

    y = 2015
    sn2 = S.drop_old_person_publications(sn, pubs, y)
    old_keys = {r.key for r in pubs.filter(F.col("year") < y).select("key").collect()}
    for r in sn2.collect():
        assert not (set(r.selected_pubs) & old_keys)

    se2 = S.drop_old_cooperation(se, pubs, y)
    for r in se2.collect():
        assert not (set(r.cooperation) & old_keys)

    n = 5
    sn3, se3 = S.drop_nodes_by_all_publications(sn, se, n)
    kept = {r.pid for r in sn3.collect()}
    assert all(len(r.all_pubs) >= n for r in sn3.collect())
    # dangling-edge invariant (filter/utils.py:25-28)
    for r in se3.collect():
        assert r.src in kept and r.dst in kept

    se4 = S.drop_edges_by_all_publications(se, 2)
    assert all(len(r.cooperation) >= 2 for r in se4.collect())


def _rows(df):
    """Hashable row set (array columns → tuples)."""
    return {
        tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in df.collect()
    }


def test_generic_combinators_reproduce_builtins(spark, crawled):
    """F5 combinator half (reference filter/utils.py:13-77): the
    generic map_* hooks must reproduce the named built-ins exactly —
    the done-criterion for the extension point."""
    from dblp_crawler_spark import filter as FL

    lake, res = crawled
    nodes, edges, pubs = lake.read("nodes"), lake.read("edges"), lake.read("publications")
    sn, se = S.summary_nodes(nodes, edges), S.summary_edges(nodes, edges)

    y = 2015
    assert _rows(FL.map_person_publications(sn, pubs, F.col("year") >= y)) == _rows(
        S.drop_old_person_publications(sn, pubs, y)
    )
    assert _rows(FL.map_cooperation(se, pubs, F.col("year") >= y)) == _rows(
        S.drop_old_cooperation(se, pubs, y)
    )
    n = 5
    wn, we = S.drop_nodes_by_all_publications(sn, se, n)
    gn, ge = FL.map_node(sn, se, F.size("all_pubs") >= n)
    assert _rows(gn) == _rows(wn) and _rows(ge) == _rows(we)
    assert _rows(FL.map_edge(se, F.size("cooperation") >= 2)) == _rows(
        S.drop_edges_by_all_publications(se, 2)
    )


def test_filter_registry_custom_transform(spark, crawled):
    """A registered custom transform goes through the same resolve
    path the CLI uses and equals the built-in it reimplements."""
    from dblp_crawler_spark import filter as FL
    from dblp_crawler_spark.filter.__main__ import apply_filter

    lake, res = crawled
    nodes, edges, pubs = lake.read("nodes"), lake.read("edges"), lake.read("publications")
    sn, se = S.summary_nodes(nodes, edges), S.summary_edges(nodes, edges)

    @FL.register_filter("recent_pubs_only_test")
    def _recent(sn, se, sp, raw):
        return FL.map_person_publications(sn, sp, F.col("year") >= int(raw)), se, sp

    try:
        gn, ge, gp = apply_filter("recent_pubs_only_test=2015", sn, se, pubs)
        wn, we, wp = apply_filter("drop_old_person_publications=2015", sn, se, pubs)
        assert _rows(gn) == _rows(wn)
        import pytest as _pytest

        with _pytest.raises(SystemExit, match="unknown filter"):
            apply_filter("no_such_filter=1", sn, se, pubs)
    finally:
        del FL.FILTER_REGISTRY["recent_pubs_only_test"]
