"""S8 graph-DB-mirror sink (MERGE idempotency, P13, J7) and S7/S9
legacy-JSON round-trip."""

import json

import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark import fixtures, oracle, summary_io
from dblp_crawler_spark.operators import mirror as M
from dblp_crawler_spark.operators import summarize as S
from dblp_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def crawled(spark, universe, tmp_path_factory):
    from dblp_crawler_spark.lakehouse import Lakehouse

    lake = Lakehouse(spark, str(tmp_path_factory.mktemp("mirlake")))
    fixtures.write_tables(spark, lake, universe)
    cfg = CrawlConfig(year=universe.year_filter, rules=universe.keyword_rules, max_attempts=2)
    eng = CrawlEngine(spark, lake, cfg)
    eng.initialize()
    eng.run_to_end()
    return lake


def test_mirror_idempotent(spark, crawled):
    lake = crawled
    pages, pubs = lake.read("pages"), lake.read("publications")
    first = M.mirror_summarize(lake, pages, pubs)
    counts1 = {t: lake.read(t).count() for t in first}
    M.mirror_summarize(lake, pages, pubs)  # re-run — MERGE no-op
    counts2 = {t: lake.read(t).count() for t in first}
    assert counts1 == counts2
    assert counts1["mirror_persons"] > 0 and counts1["mirror_writes"] > 0


def test_mirror_corr_excluded(spark, crawled, universe):
    lake = crawled
    pubs = lake.read("publications")
    # graft a corr publication row and re-mirror: journal + publish
    # must not pick it up (neo4j.py:26)
    corr = pubs.limit(1).withColumn("journal_key", F.lit(M.CORR_KEY)).withColumn(
        "title_hash", F.lit("corrtesthash")
    )
    M.mirror_summarize(lake, lake.read("pages"), pubs.unionByName(corr))
    assert lake.read("mirror_journals").filter(F.col("journal_key") == M.CORR_KEY).count() == 0
    assert lake.read("mirror_publishes").filter(F.col("journal_key") == M.CORR_KEY).count() == 0
    # but the publication node itself IS mirrored (reference still
    # MERGEs the pub; only the journal linkage is skipped)
    assert lake.read("mirror_publications").filter(F.col("title_hash") == "corrtesthash").count() == 1


def test_mirror_orcid_lookup(spark, crawled, universe):
    """J7: orcid comes from the person's own page author entries —
    fixture sets orcid for every 5th author index."""
    lake = crawled
    got = {r.dblp_pid: r.orcid for r in M.person_rows(lake.read("pages")).collect()}
    for pid, payload in universe.persons.items():
        if pid in universe.missing_pids:
            continue
        want = None
        for pub in payload["pubs"]:
            for a in pub["authors"]:
                if a["pid"] == pid and a["orcid"]:
                    want = a["orcid"]
                    break
            if want:
                break
        assert got.get(pid) == want, pid


def test_seeds_from_mirror_reseeds_crawl(spark, crawled, universe, tmp_path):
    """S11 (reference data/neo4j.py:4-16): crawl → mirror → re-seed a
    fresh crawl from the mirrored persons; the second crawl must match
    the oracle seeded with the same pid set."""
    lake = crawled
    M.mirror_summarize(lake, lake.read("pages"), lake.read("publications"))
    seed_rows = M.seeds_from_mirror(lake)
    assert {r.seed_type for r in seed_rows.collect()} == {"pid"}
    pids = sorted(r.value for r in seed_rows.collect())
    # mirrored persons = every person page in the store
    assert set(pids) == {p for p in universe.persons if p not in universe.missing_pids}

    # second crawl, fresh lake, seeded from the mirror (bounded waves:
    # with every person pre-seeded the interesting part is wave 0-1)
    from dblp_crawler_spark.lakehouse import Lakehouse

    u2 = fixtures.make_universe(n_authors=120, n_pubs=360, n_venues=8, seed=7)
    u2.seeds_pids = pids
    u2.seeds_journals = []
    lake2 = Lakehouse(spark, str(tmp_path / "reseedlake"))
    fixtures.write_tables(spark, lake2, u2)
    cfg = CrawlConfig(year=u2.year_filter, rules=u2.keyword_rules, host_budget=40, limit=2)
    eng = CrawlEngine(spark, lake2, cfg)
    eng.initialize()
    eng.run_to_end()
    res = oracle.run_oracle(u2, host_budget=40, limit=2)
    order = [(r.wave, r.seq, r.url) for r in lake2.read("crawl_order").orderBy("seq").collect()]
    assert order == res.crawl_order
    assert {r.key for r in lake2.read("seen_pubs").collect()} == res.seen_pubs


def test_write_edges_match_reference_shape(spark, crawled, universe):
    lake = crawled
    pubs = lake.read("publications")
    we = M.write_edges(pubs)
    # every WRITE edge's author must be an author of a pub with that hash
    pa = pubs.select(F.col("title_hash").alias("th"), F.explode("authors").alias("a")).select(
        "th", F.col("a.pid").alias("apid")
    )
    joined = we.join(pa, (we.title_hash == pa.th) & (we.dblp_pid == pa.apid), "left_semi")
    assert joined.count() == we.count()


def test_summary_json_roundtrip(spark, crawled, tmp_path):
    lake = crawled
    nodes, edges, pubs = lake.read("nodes"), lake.read("edges"), lake.read("publications")
    path = str(tmp_path / "summary.json")
    doc = summary_io.write_summary_json(path, nodes, edges, pubs)
    with open(path) as f:
        assert json.load(f) == doc  # valid, byte-stable document

    rn, re_, rp = summary_io.read_summary_json(spark, path)
    sn = S.summary_nodes(nodes, edges)
    assert {r.pid for r in rn.collect()} == {r.pid for r in sn.collect()}
    assert rn.count() == len(doc["nodes"]) and re_.count() == len(doc["edges"])
    assert rp.count() == len(doc["publications"])
    # filter API composes with the re-loaded frames (F5 on S9 source)
    se = summary_io.read_summary_json(spark, path)[1]
    filtered = S.drop_edges_by_all_publications(se, 1)
    assert filtered.count() <= se.count()
    # selected flags survive the round trip
    sel_disk = {k for k, p in doc["publications"].items() if p.get("selected")}
    sel_rt = {r.key for r in rp.filter("selected").collect()}
    assert sel_rt == sel_disk
