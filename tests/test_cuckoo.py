"""Cuckoo-filter bank: membership, deletion (the anti-bloom
capability), kick-out pressure, MoR commit locality, persistence,
and the exact prefiltered_new contract."""

import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark.lakehouse import Lakehouse
from dblp_crawler_spark.operators.cuckoo import CuckooBank


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "lake"))


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.concat(F.lit("url/"), F.col("id")).alias("key"))


def test_add_probe_no_false_negatives(spark, lake):
    bank = CuckooBank(lake, n_buckets=8, m_slots=1 << 8, way=4)
    bank.add(_keys(spark, 0, 500))
    probed = bank.maybe_seen(_keys(spark, 0, 500))
    assert probed.filter(~F.col("__maybe_seen")).count() == 0  # no false negatives
    # fresh keys: overwhelmingly definitely-new (fp collisions are
    # ~way*2/2^16 per bucket pair — allow a tiny fp rate)
    fresh = bank.maybe_seen(_keys(spark, 10_000, 10_500))
    assert fresh.filter(F.col("__maybe_seen")).count() <= 5


def test_delete_removes_membership(spark, lake):
    bank = CuckooBank(lake, n_buckets=4, m_slots=1 << 8, way=4)
    bank.add(_keys(spark, 0, 200))
    bank.delete(_keys(spark, 0, 50))
    gone = bank.maybe_seen(_keys(spark, 0, 50)).filter(F.col("__maybe_seen")).count()
    kept = bank.maybe_seen(_keys(spark, 50, 200)).filter(~F.col("__maybe_seen")).count()
    assert gone == 0  # deleted keys no longer present
    assert kept == 0  # survivors untouched (no false negatives)
    # delete of an absent key is a no-op
    bank.delete(_keys(spark, 9_000, 9_010))
    assert bank.maybe_seen(_keys(spark, 50, 200)).filter(~F.col("__maybe_seen")).count() == 0


def test_kickout_pressure_and_stash(spark, lake):
    # 1 bucket × 8 slots × 2-way = 16 table cells; 30 keys forces
    # kick-out walks and the stash — every key must still be found
    bank = CuckooBank(lake, n_buckets=1, m_slots=8, way=2, stash_max=64)
    bank.add(_keys(spark, 0, 30))
    assert bank.maybe_seen(_keys(spark, 0, 30)).filter(~F.col("__maybe_seen")).count() == 0
    row = lake.read("seen_cuckoo").collect()[0]
    assert row.n_items == 30 and len(row.stash) > 0  # stash actually exercised


def test_mor_commit_touches_only_hit_buckets(spark, lake):
    bank = CuckooBank(lake, n_buckets=32, m_slots=1 << 8, way=4)
    bank.add(_keys(spark, 0, 1000))  # touches ~all 32 buckets
    bank.add(_keys(spark, 1000, 1002))  # touches ≤ 2 buckets
    assert lake.layer_rows("seen_cuckoo") <= 2  # O(touched), not O(bank)


def test_persistence_across_instances(spark, lake):
    CuckooBank(lake, n_buckets=8, m_slots=1 << 8).add(_keys(spark, 0, 300))
    reloaded = CuckooBank(lake, n_buckets=8, m_slots=1 << 8)
    assert reloaded.maybe_seen(_keys(spark, 0, 300)).filter(~F.col("__maybe_seen")).count() == 0


def test_prefiltered_new_equals_exact_antijoin(spark, lake):
    bank = CuckooBank(lake, n_buckets=8, m_slots=1 << 8)
    seen = _keys(spark, 0, 400)
    bank.add(seen)
    cands = _keys(spark, 300, 700)  # 100 overlap, 300 new
    got = {r.key for r in bank.prefiltered_new(cands, seen).collect()}
    want = {r.key for r in cands.join(seen, "key", "left_anti").collect()}
    assert got == want and len(want) == 300


def test_add_is_idempotent(spark, lake):
    bank = CuckooBank(lake, n_buckets=4, m_slots=1 << 8)
    bank.add(_keys(spark, 0, 100))
    n1 = sum(r.n_items for r in lake.read("seen_cuckoo").collect())
    bank.add(_keys(spark, 0, 100))  # set semantics: no growth
    n2 = sum(r.n_items for r in lake.read("seen_cuckoo").collect())
    assert n1 == n2 == 100


def test_engine_with_cuckoo_matches_oracle(spark, lake):
    """Crawl with the cuckoo seen-filter must be result-identical to
    the oracle (same contract as the bloom path: maybe-seen rows are
    exactly re-checked, definitely-new rows bypass). compact_every=2
    forces mid-crawl MoR compaction of the cuckoo bank too."""
    from dblp_crawler_spark import fixtures, oracle
    from dblp_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine

    u = fixtures.make_universe(n_authors=60, n_pubs=150, n_venues=5, seed=3)
    res = oracle.run_oracle(u, host_budget=None, max_attempts=2)
    fixtures.write_tables(spark, lake, u)
    cfg = CrawlConfig(
        year=u.year_filter, rules=u.keyword_rules, host_budget=None, max_attempts=2,
        use_bloom=True, seen_filter_kind="cuckoo", bloom_buckets=8, compact_every=2,
    )
    eng = CrawlEngine(spark, lake, cfg)
    eng.initialize()
    eng.run_to_end()
    order = [(r.wave, r.seq, r.url) for r in lake.read("crawl_order").orderBy("seq").collect()]
    assert order == res.crawl_order
    assert {r.key for r in lake.read("seen_pubs").collect()} == res.seen_pubs


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    ops=st.lists(
        st.tuples(st.sampled_from(["add", "delete"]), st.integers(0, 120), st.integers(1, 80)),
        min_size=1, max_size=4,
    ),
)
def test_cuckoo_random_ops_match_reference_set(spark, tmp_path_factory, seed, ops):
    """Random add/delete batches under kick-out pressure (tiny
    table) vs an exact Python reference set: no false negatives
    ever, and prefiltered_new == plain anti-join."""
    lake = Lakehouse(spark, str(tmp_path_factory.mktemp("cuckoo")))
    bank = CuckooBank(lake, n_buckets=2, m_slots=32, way=2, stash_max=256)
    ref: set[str] = set()
    for kind, lo, n in ops:
        keys = [f"k{seed}/{i}" for i in range(lo, lo + n)]
        if kind == "add":
            bank.add(spark.createDataFrame([(k,) for k in keys], "key string"))
            ref |= set(keys)
        else:
            # cuckoo deletion contract: only delete keys known to be
            # inserted (deleting an absent key whose fingerprint
            # collides with a present one would evict the wrong
            # entry — standard cuckoo-filter caveat, documented in
            # CuckooBank.delete)
            todel = [k for k in keys if k in ref]
            if todel:
                bank.delete(spark.createDataFrame([(k,) for k in todel], "key string"))
                ref -= set(todel)
    if ref:
        present = spark.createDataFrame([(k,) for k in sorted(ref)], "key string")
        misses = bank.maybe_seen(present).filter(~F.col("__maybe_seen")).count()
        assert misses == 0  # NO false negatives, ever
    seen_df = spark.createDataFrame([(k,) for k in sorted(ref)] or [("__none__",)], "key string")
    cands = spark.createDataFrame(
        [(f"k{seed}/{i}",) for i in range(0, 220)], "key string"
    )
    got = {r.key for r in bank.prefiltered_new(cands, seen_df).collect()}
    want = {r.key for r in cands.join(seen_df, "key", "left_anti").collect()}
    assert got == want
