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
