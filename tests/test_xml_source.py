"""XML page source (P8/P10/P14): hand-pinned documents + fixture
round-trip through the Arrow-batched parser."""

import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark import fixtures
from dblp_crawler_spark.sources.xml_pages import parse_pages_xml

MIXED = (
    '<dblpperson pid="01/100" name="Jane Doe">'
    "<person>"
    '<note type="affiliation">MIT</note>'
    '<note type="award">ignored</note>'
    "</person>"
    '<r><article key="journals/x/1" mdate="2020-01-01">'
    '<author pid="02/200" orcid="0000-1">Bob</author>'
    "<title>Video <i>super</i> resolution</title>"
    "<year>2021</year><journal>X Journal</journal>"
    "<url>db/journals/x/x1.html#1</url>"
    "<ee>https://doi.org/10.1/abc</ee><ee>https://example.org/a</ee>"
    "</article></r>"
    '<r><inproceedings key="conf/y/2" mdate="2021-02-02">'
    '<author pid="01/100">Jane Doe</author>'
    "<title>Plain title</title><booktitle>Y Conf</booktitle>"
    "</inproceedings></r>"
    "</dblpperson>"
)

NO_PID = '<dblpperson><person/><r><article key="k1" mdate="2020-01-01"><title>T</title></article></r></dblpperson>'


def parse_one(spark, body, kind, url="pid/01/100"):
    df = spark.createDataFrame([(url, body)], "url string, body string")
    return parse_pages_xml(df, kind).collect()[0]["payload"]


def test_person_mixed_content_title(spark):
    p = parse_one(spark, MIXED, "person")
    assert p["pid"] == "01/100" and p["name"] == "Jane Doe"
    assert p["affiliations"] == ["MIT"]  # award note filtered (parser.py:27-31)
    pubs = p["pubs"]
    assert len(pubs) == 2
    a = pubs[0]
    # itertext join (parser.py:75-78): fragments joined with single spaces
    assert a["title"] == "Video  super  resolution"
    assert a["type"] == "article" and a["year"] == 2021
    assert a["journal"] == "X Journal"  # P9: article → <journal>
    assert list(a["ee"]) == ["https://doi.org/10.1/abc", "https://example.org/a"]
    assert a["authors"][0]["pid"] == "02/200" and a["authors"][0]["orcid"] == "0000-1"
    b = pubs[1]
    assert b["journal"] == "Y Conf"  # P9: inproceedings → <booktitle>
    assert b["year"] is None and b["authors"][0]["orcid"] is None


def test_person_deterministic_unknown_ids(spark):
    """P14: missing pid/name → crc32(url)-derived ids — stable across
    runs and partitions (reference counter is order-dependent)."""
    p1 = parse_one(spark, NO_PID, "person", url="pid/u1")
    p2 = parse_one(spark, NO_PID, "person", url="pid/u1")
    p3 = parse_one(spark, NO_PID, "person", url="pid/u2")
    assert p1["pid"].startswith("Unknown_") and p1["name"].startswith("Unname_")
    assert p1["pid"] == p2["pid"]
    assert p1["pid"] != p3["pid"]


def test_malformed_yields_null(spark):
    df = spark.createDataFrame(
        [("u1", "<dblpperson"), ("u2", "<wrongroot/>")], "url string, body string"
    )
    out = parse_pages_xml(df, "person").collect()
    assert all(r["payload"] is None for r in out)


def test_journal_and_index_pages(spark, universe):
    vol_url = next(iter(universe.journals))
    body = fixtures.render_journal_xml(universe.journals[vol_url])
    got = parse_one(spark, body, "journal", url=vol_url)
    want_keys = [p["key"] for p in universe.journals[vol_url]["pubs"]]
    assert [p["key"] for p in got["pubs"]] == want_keys

    idx_url = next(iter(universe.journal_lists))
    payload = universe.journal_lists[idx_url]
    got = parse_one(spark, fixtures.render_journal_list_xml(payload), "journal_list", url=idx_url)
    assert got["title"] == payload["title"] and got["h1"] == payload["h1"]
    assert list(got["refs"]) == payload["refs"]
    assert [(pr["booktitle"], pr["url"]) for pr in got["proceedings"]] == [
        (pr["booktitle"], pr["url"]) for pr in payload["proceedings"]
    ]


def test_universe_roundtrip(spark, universe):
    """Render every person page of the fixture universe to XML, parse
    it back distributed, and compare against the struct source of
    truth (image_id is not part of dblp XML — excluded)."""
    rows = [
        (fixtures.person_url(pid), fixtures.render_person_xml(payload))
        for pid, payload in universe.persons.items()
        if pid not in universe.missing_pids
    ]
    df = spark.createDataFrame(rows, "url string, body string").repartition(8)
    parsed = {r["url"]: r["payload"] for r in parse_pages_xml(df, "person").collect()}
    assert len(parsed) == len(rows)
    for pid, payload in universe.persons.items():
        if pid in universe.missing_pids:
            continue
        got = parsed[fixtures.person_url(pid)]
        assert got["pid"] == payload["pid"] and got["name"] == payload["name"]
        assert list(got["affiliations"]) == payload["affiliations"]
        assert len(got["pubs"]) == len(payload["pubs"])
        for gp, wp in zip(got["pubs"], payload["pubs"]):
            for field in ("key", "type", "title", "year", "mdate", "url", "journal"):
                assert gp[field] == wp[field], (pid, wp["key"], field)
            assert list(gp["ee"]) == wp["ee"]
            assert [(a["pid"], a["name"], a["orcid"]) for a in gp["authors"]] == [
                (a["pid"], a["name"], a["orcid"]) for a in wp["authors"]
            ]


def test_crawl_from_xml_pages_matches_oracle(spark, universe, tmp_path):
    """Full-path integration: raw XML bodies → pages table → crawl →
    exact crawl-order + seen-set equality vs the oracle."""
    from datetime import datetime, timezone

    from dblp_crawler_spark import oracle, schemas
    from dblp_crawler_spark.lakehouse import Lakehouse
    from dblp_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from dblp_crawler_spark.sources.xml_pages import pages_table_from_xml

    now = datetime(2026, 1, 1, tzinfo=timezone.utc)
    raw = []
    for pid, payload in universe.persons.items():
        if pid in universe.missing_pids:
            continue
        raw.append(
            (fixtures.person_url(pid), fixtures.host_of_pid(pid), "person", now,
             fixtures.render_person_xml(payload))
        )
    for url, payload in universe.journal_lists.items():
        raw.append((url, "dblp.org", "journal_list", now, fixtures.render_journal_list_xml(payload)))
    for url, payload in universe.journals.items():
        raw.append((url, "dblp.org", "journal", now, fixtures.render_journal_xml(payload)))
    raw_df = spark.createDataFrame(
        raw, "url string, host string, kind string, fetched_at timestamp, body string"
    )

    lake = Lakehouse(spark, str(tmp_path / "xmllake"))
    fixtures.write_tables(spark, lake, universe)  # seeds/dims/images
    lake.overwrite("pages", pages_table_from_xml(raw_df))  # replace with the XML-parsed table

    cfg = CrawlConfig(year=universe.year_filter, rules=universe.keyword_rules, max_attempts=2)
    eng = CrawlEngine(spark, lake, cfg)
    eng.initialize()
    eng.run_to_end()
    res = oracle.run_oracle(universe, max_attempts=2)
    order = [(r.wave, r.seq, r.url) for r in lake.read("crawl_order").orderBy("seq").collect()]
    assert order == res.crawl_order
    assert {r.key for r in lake.read("seen_pubs").collect()} == res.seen_pubs
