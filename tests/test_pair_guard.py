"""Pair-explosion guard (r4 verdict item 2): the skip-and-flag cap on
quadratic candidate blocks — simhash prefix blocks and minhash LSH
band buckets. Contract under test:

  capped pairs == uncapped pairs whose block/bucket population <= cap
  overflow     == exactly the blocks/buckets over the cap
  recall       == unchanged inside surviving blocks (planted dups)
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.dedup import (
    hamming_block_overflow,
    hamming_near_dups,
    lsh_bucket_overflow,
    lsh_candidate_pairs,
    minhash_near_dups,
)

WIDTH, PREFIX = 16, 8  # tiny geometry: block = top 8 of 16 bits


def _hashed(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, sh long"
    )


def _model(vals, cap, max_ham):
    """Independent Python model of the capped kernel."""
    import collections

    blocks = collections.defaultdict(list)
    for i, v in enumerate(vals):
        blocks[v >> (WIDTH - PREFIX)].append((i, v))
    pairs, overflow = set(), {}
    for b, rows in blocks.items():
        if len(rows) > cap:
            overflow[b] = len(rows)
            continue
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                (ia, va), (ib, vb) = rows[x], rows[y]
                if bin(va ^ vb).count("1") <= max_ham:
                    pairs.add((min(ia, ib), max(ia, ib)))
    return pairs, overflow


def test_capped_pairs_and_overflow_deterministic(spark):
    # block 0x01: 3 docs (2 within hamming 2) — under cap, pairs kept;
    # block 0x02: 5 identical docs — over cap 4, skipped + flagged
    vals = [0x0100, 0x0101, 0x01F0] + [0x0200] * 5
    df = _hashed(spark, vals)
    capped = hamming_near_dups(df, "sh", "doc_id", max_hamming=2,
                               prefix_bits=PREFIX, width=WIDTH, max_block=4)
    got = {(r.a, r.b) for r in capped.collect()}
    assert got == {(0, 1)}
    over = hamming_block_overflow(df, "sh", prefix_bits=PREFIX, width=WIDTH, max_block=4)
    assert [(r.block, r.n_docs) for r in over.collect()] == [(0x02, 5)]
    # uncapped finds the 5*4/2 identical pairs the guard skipped
    full = hamming_near_dups(df, "sh", "doc_id", max_hamming=2,
                             prefix_bits=PREFIX, width=WIDTH)
    assert full.count() == 1 + 10


@settings(max_examples=12, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=(1 << WIDTH) - 1),
                  min_size=1, max_size=60),
    cap=st.integers(min_value=1, max_value=8),
)
def test_capped_kernel_matches_model(spark, vals, cap):
    df = _hashed(spark, vals)
    want_pairs, want_over = _model(vals, cap, max_ham=3)
    got_pairs = {
        (r.a, r.b)
        for r in hamming_near_dups(df, "sh", "doc_id", max_hamming=3,
                                   prefix_bits=PREFIX, width=WIDTH,
                                   max_block=cap).collect()
    }
    got_over = {
        (r.block, r.n_docs)
        for r in hamming_block_overflow(df, "sh", prefix_bits=PREFIX,
                                        width=WIDTH, max_block=cap).collect()
    }
    assert got_pairs == want_pairs
    assert got_over == {(b, n) for b, n in want_over.items()}


def test_lsh_bucket_cap(spark):
    """A near-constant corpus collapses every doc into one band
    bucket; the cap skips it, the overflow report names it, and
    distinct texts in small buckets still pair."""
    boiler = "the same boilerplate page body repeated verbatim over and over again "
    other = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, boiler * 3) for i in range(12)]
    rows += [(100, other), (101, other)]  # identical → always candidates
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_near_dups(docs, num_hashes=16, bands=4, threshold=0.2,
                               max_bucket=8)
    got = {(r.a, r.b) for r in capped.collect()}
    assert got == {(100, 101)}  # boilerplate clique suppressed
    from dblp_crawler_spark.operators.dedup import minhash_signature

    sigs = minhash_signature(docs, num_hashes=16)
    over = lsh_bucket_overflow(sigs, bands=4, max_bucket=8)
    rows_over = over.collect()
    assert rows_over and all(r.n_docs == 12 for r in rows_over)
    # and WITHOUT the cap the clique explodes into 12*11/2 pairs/band
    full = lsh_candidate_pairs(sigs, bands=4)
    assert full.count() >= 66
