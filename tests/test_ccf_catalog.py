"""S12 data half: CCF catalog ingest → ccf_rank dim → crawl priority.

The reference ships ranked venue lists plus the url→journal-key rule
(data/ccf/key.py:10-28); here a user-supplied catalog in the same
line format is ingested by tools/build_ccf_dim.py and must (a) parse
to the exact key set and (b) actually drive the T3 priority: an
'A'-venue discovery outranks an unranked one in crawl_order.
"""

from dblp_crawler_spark import fixtures, oracle, schemas
from dblp_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine
from dblp_crawler_spark.sources.ccf_catalog import build_ccf_dim, parse_catalog_lines


def test_parse_catalog_lines_reference_format(spark):
    lines = spark.createDataFrame(
        [
            # canonical line
            ("1 TOCS  ACM Transactions on Computer Systems  ACM  http://dblp.uni-trier.de/db/journals/tocs/",),
            # PDF artifact: space inside the URL
            ("2 TOS  ACM Transactions on Storage  ACM  http://dblp.uni -trier.de/db/journals/tos/",),
            # trailing index.html beyond the 3-segment key
            ("4 TC  IEEE Transactions on Computers  IEEE  http://dblp.uni-trier.de/db/journals/tc/index.html",),
            # https variant
            ("5 X  Some Conf  Z  https://dblp.uni-trier.de/db/conf/sosp/",),
            # non-dblp URL → dropped
            ("6 Y  Other  W  http://example.com/db/journals/nope/",),
            # no URL at all → dropped
            ("序号 刊物简称 刊物全称 出版社 网址",),
        ],
        "value string",
    )
    got = {(r.journal_key, r.rank) for r in parse_catalog_lines(lines, "A").collect()}
    assert got == {
        ("db/journals/tocs", "A"),
        ("db/journals/tos", "A"),
        ("db/journals/tc", "A"),
        ("db/conf/sosp", "A"),
    }


def test_build_ccf_dim_merge_and_conflicts(spark, lake, tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("1 X  Foo  P  http://dblp.uni-trier.de/db/conf/v00/\n")
    # v00 also listed under B → A must win; v01 only under B
    b.write_text(
        "1 X  Foo  P  http://dblp.uni-trier.de/db/conf/v00/\n"
        "2 Y  Bar  P  http://dblp.uni-trier.de/db/conf/v01/\n"
    )
    dim = build_ccf_dim(
        spark, lake, {"A": str(a), "B": str(b)}, extra_keys=[("C", "db/journals/pe")]
    )
    got = {r.journal_key: r.rank for r in dim.collect()}
    assert got == {"db/conf/v00": "A", "db/conf/v01": "B", "db/journals/pe": "C"}
    # re-ingest with a corrected rank → last writer wins (MERGE, not append)
    b2 = tmp_path / "b2.txt"
    b2.write_text("1 X  Foo  P  http://dblp.uni-trier.de/db/conf/v00/\n")
    dim = build_ccf_dim(spark, lake, {"B": str(b2)})
    got = {r.journal_key: r.rank for r in dim.collect()}
    assert got["db/conf/v00"] == "B" and got["db/conf/v01"] == "B"


def test_catalog_ingested_dim_drives_crawl_priority(spark, lake, tmp_path):
    """Full loop: catalog files → build_ccf_dim → crawl. The crawl
    must equal the oracle (which uses the same ranks), and an
    A-weighted discovery must be scheduled BEFORE an unranked one in
    the same wave (T3's top 16 bits doing their job)."""
    u = fixtures.make_universe(n_authors=60, n_pubs=150, n_venues=5, seed=7)
    fixtures.write_tables(spark, lake, u)
    # blank the fixture-written dim; rebuild it from catalog files only
    lake.overwrite("ccf_rank", spark.createDataFrame([], schemas.CCF_RANK))
    by_rank: dict[str, list[str]] = {}
    for key, rank in u.ccf_rank.items():
        by_rank.setdefault(rank, []).append(key)
    paths = {}
    for rank, keys in by_rank.items():
        p = tmp_path / f"ccf_{rank}.txt"
        p.write_text(
            "".join(
                f"{i} V{i}  Venue {i}  Pub  http://dblp.uni -trier.de/{k}/\n"
                for i, k in enumerate(sorted(keys))
            )
        )
        paths[rank] = str(p)
    dim = build_ccf_dim(spark, lake, paths)
    assert {r.journal_key: r.rank for r in dim.collect()} == u.ccf_rank

    cfg = CrawlConfig(year=u.year_filter, rules=u.keyword_rules, host_budget=None, max_attempts=2)
    eng = CrawlEngine(spark, lake, cfg)
    eng.initialize()
    eng.run_to_end()
    res = oracle.run_oracle(u, host_budget=None, max_attempts=2)
    order = [(r.wave, r.seq, r.url) for r in lake.read("crawl_order").orderBy("seq").collect()]
    assert order == res.crawl_order

    # explicit A-before-N: within one wave, a ccf-weight-3 person is
    # sequenced ahead of a weight-0 person
    prio = {r.url: r.priority for r in lake.read("frontier").collect()}
    seen_pair = False
    by_wave: dict[int, list[int]] = {}
    for wave, seq, url in order:
        if url in prio:
            by_wave.setdefault(wave, []).append(prio[url])
    for weights in by_wave.values():
        w = [p >> 48 for p in weights]
        # scheduled in non-increasing priority order (host_budget=None)
        assert all(a >= b for a, b in zip(weights, weights[1:]))
        if 3 in w and 0 in w and w.index(3) < len(w) - 1 - w[::-1].index(0):
            seen_pair = True
    assert seen_pair, "no wave scheduled an A-weighted person ahead of an unranked one"
