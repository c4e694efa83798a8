"""Lakehouse: snapshot commits, fast append, merge semantics,
time travel — the Iceberg contract the engine relies on (O7)."""

from dblp_crawler_spark import schemas


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, wave int")


def test_overwrite_and_read(spark, lake):
    lake.overwrite("t", _df(spark, [("a", 0)]))
    assert [(r.key, r.wave) for r in lake.read("t").collect()] == [("a", 0)]


def test_fast_append_accumulates(spark, lake):
    lake.overwrite("t", _df(spark, [("a", 0)]))
    lake.append("t", _df(spark, [("b", 1)]), schemas.SEEN_PUBS)
    lake.append("t", _df(spark, [("c", 2)]), schemas.SEEN_PUBS)
    assert {r.key for r in lake.read("t").collect()} == {"a", "b", "c"}
    # append is metadata-only: 3 snapshots, each readable (time travel)
    assert lake.snapshots("t") == [0, 1, 2]
    assert {r.key for r in lake.read("t", snapshot=1).collect()} == {"a", "b"}


def test_merge_upsert(spark, lake):
    lake.overwrite("t", _df(spark, [("a", 0), ("b", 0)]))
    lake.merge_upsert("t", _df(spark, [("b", 9), ("c", 1)]), ["key"], schemas.SEEN_PUBS)
    got = {r.key: r.wave for r in lake.read("t").collect()}
    assert got == {"a": 0, "b": 9, "c": 1}


def test_append_new_skips_existing(spark, lake):
    lake.overwrite("t", _df(spark, [("a", 0)]))
    lake.append_new("t", _df(spark, [("a", 9), ("b", 1)]), ["key"], schemas.SEEN_PUBS)
    got = {r.key: r.wave for r in lake.read("t").collect()}
    assert got == {"a": 0, "b": 1}


def test_rollback(spark, lake):
    lake.overwrite("t", _df(spark, [("a", 0)]))
    lake.append("t", _df(spark, [("b", 1)]), schemas.SEEN_PUBS)
    lake.rollback("t", 0)
    assert {r.key for r in lake.read("t").collect()} == {"a"}
    # a write after rollback forks history without clobbering old data
    lake.append("t", _df(spark, [("z", 7)]), schemas.SEEN_PUBS)
    assert {r.key for r in lake.read("t").collect()} == {"a", "z"}


def test_empty_table_roundtrip(spark, lake):
    lake.overwrite("t", spark.createDataFrame([], schemas.SEEN_PUBS))
    assert lake.read("t").count() == 0


def test_freshness_ttl(spark, lake):
    """S5: per-kind TTL filter + stale re-fetch set (downloader.py
    semantics: person/journal_list 30d, journal forever)."""
    from datetime import datetime, timedelta, timezone

    from dblp_crawler_spark.operators.freshness import fresh_pages, stale_urls

    now = datetime(2026, 1, 31, tzinfo=timezone.utc)
    old = now - timedelta(days=40)
    new = now - timedelta(days=5)
    rows = [
        ("p_old", "h", "person", old), ("p_new", "h", "person", new),
        ("jl_old", "h", "journal_list", old), ("j_old", "h", "journal", old),
    ]
    pages = spark.createDataFrame(rows, "url string, host string, kind string, fetched_at timestamp")
    fresh = {r.url for r in fresh_pages(pages, now).collect()}
    assert fresh == {"p_new", "j_old"}  # journal TTL is forever
    stale = {r.url for r in stale_urls(pages, now).collect()}
    assert stale == {"p_old", "jl_old"}
    # override: journals expire too
    stale2 = {r.url for r in stale_urls(pages, now, {"journal": 10}).collect()}
    assert stale2 == {"p_old", "jl_old", "j_old"}
