"""Pigeonhole multi-block hamming near-dup: guaranteed recall at
hamming ≤ k where the single prefix block documents recall < 1.
Pins block geometry, the prefix-kernel miss the multi-block kernel
recovers, one-row-per-pair dedup, and Spark == DuckDB replay."""

import random

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.dedup import (
    hamming_block_spans,
    hamming_near_dups,
    hamming_near_dups_exact,
    hamming_near_dups_exact_sql,
)


def test_block_spans_cover_width_exactly():
    assert hamming_block_spans(64, 3) == [(0, 16), (16, 16), (32, 16), (48, 16)]
    assert hamming_block_spans(60, 3) == [(0, 15), (15, 15), (30, 15), (45, 15)]
    # remainder bits go to the FIRST blocks
    assert hamming_block_spans(61, 3) == [(0, 16), (16, 15), (31, 15), (46, 15)]
    for width, k in [(64, 3), (60, 3), (61, 2), (60, 5)]:
        spans = hamming_block_spans(width, k)
        assert len(spans) == k + 1
        assert sum(ln for _, ln in spans) == width
        off = 0
        for o, ln in spans:
            assert o == off
            off += ln


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, sh long")


def test_prefix_miss_recovered_by_pigeonhole(spark):
    base = 0b101101 << 40 | 0xBEEF
    # flip 3 bits inside the top-12-bit prefix of a 60-bit hash:
    twin = base ^ ((1 << 50) | (1 << 55) | (1 << 58))
    rows = [("a", base), ("b", twin), ("z", 0x123456789ABCD)]
    old = hamming_near_dups(_df(spark, rows), "sh", "id", max_hamming=3,
                            prefix_bits=12, width=60).collect()
    assert old == []  # the documented single-block recall gap
    new = hamming_near_dups_exact(_df(spark, rows), "sh", "id",
                                  max_hamming=3, width=60).collect()
    assert [(r.a, r.b, r.hamming) for r in new] == [("a", "b", 3)]


def test_identical_pair_emitted_once(spark):
    # hamming 0 agrees on ALL 4 blocks -> found 4 times, deduped to 1
    rows = [("a", 12345), ("b", 12345)]
    got = hamming_near_dups_exact(_df(spark, rows), "sh", "id",
                                  max_hamming=3, width=60).collect()
    assert [(r.a, r.b, r.hamming) for r in got] == [("a", "b", 0)]


def test_guaranteed_recall_randomized(spark):
    rng = random.Random(42)
    rows, planted = [], []
    for i in range(60):
        v = rng.getrandbits(60)
        rows.append((f"d{i:03d}", v))
        if i % 3 == 0:
            flips = rng.sample(range(60), rng.randrange(1, 4))
            w = v
            for b in flips:
                w ^= 1 << b
            rows.append((f"d{i:03d}t", w))
            planted.append((f"d{i:03d}", f"d{i:03d}t", len(flips)))
    got = {
        (r.a, r.b): r.hamming
        for r in hamming_near_dups_exact(_df(spark, rows), "sh", "id",
                                         max_hamming=3, width=60).collect()
    }
    for a, b, ham in planted:
        assert got.get((a, b)) == ham, (a, b, ham)


def test_spark_matches_duckdb_replay(spark):
    rng = random.Random(7)
    rows = []
    for i in range(40):
        v = rng.getrandbits(60)
        rows.append((f"d{i:03d}", v))
        if i % 4 == 0:
            rows.append((f"d{i:03d}t", v ^ (1 << rng.randrange(60))))
    eng = sorted(
        (r.a, r.b, r.hamming)
        for r in hamming_near_dups_exact(_df(spark, rows), "sh", "id",
                                         max_hamming=3, width=60).collect()
    )
    con = duckdb.connect()
    con.register("hx", pd.DataFrame(rows, columns=["id", "sh"]))
    ora = sorted(
        con.execute(
            hamming_near_dups_exact_sql("hx", "sh", "id", max_hamming=3, width=60)
        ).fetchall()
    )
    assert eng == ora
