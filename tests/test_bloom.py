"""BloomBank: no false negatives, exactness of the prefiltered path,
persistence across snapshots (north_rule seen-filter requirements)."""

from pyspark.sql import functions as F

from dblp_crawler_spark.operators.bloom import BloomBank


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_no_false_negatives(spark, lake):
    bank = BloomBank(lake, n_buckets=8, m_bits=1 << 14, k=5)
    seen = [f"conf/x/p{i:04d}" for i in range(500)]
    bank.add(_keys_df(spark, seen))
    probed = bank.maybe_seen(_keys_df(spark, seen))
    assert probed.filter(~F.col("__maybe_seen")).count() == 0  # every seen key hits


def test_definitely_new_pass_through(spark, lake):
    bank = BloomBank(lake, n_buckets=8, m_bits=1 << 16, k=5)
    bank.add(_keys_df(spark, [f"a{i}" for i in range(100)]))
    fresh = bank.maybe_seen(_keys_df(spark, [f"b{i}" for i in range(1000)]))
    # with 64 KiB/bucket and 100 keys, fp rate ~0 — most must be new
    assert fresh.filter(~F.col("__maybe_seen")).count() > 950


def test_prefiltered_new_equals_exact_antijoin(spark, lake):
    # tiny, saturated filter → many false positives → exact fallback
    # must still produce exactly the anti-join result
    bank = BloomBank(lake, n_buckets=4, m_bits=1 << 8, k=3)
    seen_keys = [f"k{i}" for i in range(0, 300, 2)]
    seen = _keys_df(spark, seen_keys)
    bank.add(seen)
    cands = _keys_df(spark, [f"k{i}" for i in range(300)])
    got = {r.key for r in bank.prefiltered_new(cands, seen).collect()}
    expect = {r.key for r in cands.join(seen, "key", "left_anti").collect()}
    assert got == expect


def test_incremental_add_and_snapshots(spark, lake):
    bank = BloomBank(lake, n_buckets=4, m_bits=1 << 12, k=4)
    bank.add(_keys_df(spark, ["a", "b"]))
    snap1 = lake.current_snapshot("seen_filter")
    bank.add(_keys_df(spark, ["c"]))
    probed = bank.maybe_seen(_keys_df(spark, ["a", "b", "c"]))
    assert probed.filter(~F.col("__maybe_seen")).count() == 0
    # time travel: the earlier bank doesn't contain 'c'
    lake.rollback("seen_filter", snap1)
    probed_old = {r["key"]: r["__maybe_seen"] for r in bank.maybe_seen(_keys_df(spark, ["a", "c"])).collect()}
    assert probed_old["a"] is True
    assert probed_old["c"] is False
