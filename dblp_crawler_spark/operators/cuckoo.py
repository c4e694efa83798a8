"""Partitioned, persistent cuckoo-filter bank for the URL-seen set.

north_rule names "a partitioned bloom/cuckoo URL-seen filter" — this
is the cuckoo half, same bank surface as operators/bloom.BloomBank
(add / maybe_seen / prefiltered_new, MoR per-bucket commits) plus the
one thing a bloom filter cannot do: DELETE. A crawl that re-queues a
retracted page or expires a TTL'd URL can remove it from the seen
filter without rebuilding the bank.

Layout: `n_buckets` independent cuckoo tables keyed by
xxhash64(key) % n_buckets (co-partitioned with the candidate stream,
exactly like the bloom bank). Each bucket row stores a dense
uint16 fingerprint table of `m_slots × bucket_way` (m power of two)
plus an overflow stash. Standard cuckoo addressing within a bucket:

    fp  = 16-bit nonzero fingerprint of the key
    s1  = derived slot hash
    s2  = s1 XOR g(fp)          (g = small integer hash; involution:
                                 s1 = s2 XOR g(fp), so relocation
                                 never needs the original key)

Insert does the classic kick-out walk (bounded; overflow → stash).
All per-key work inside a bucket is numpy over Arrow batches via
`cogroup().applyInPandas` / `mapInPandas` — no row-at-a-time Python
UDFs. Probes carry only (bucket, h1, fp) through the shuffle.

EXACTNESS CONTRACT (same as the bloom bank): fingerprints can
collide, so membership is "maybe"; `prefiltered_new` routes
maybe-seen rows through the exact anti-join and definitely-new rows
around it — the result always equals a plain anti-join. No false
negatives: every inserted key is found until deleted.

Determinism: inserts are sorted by (slot, fp) inside each batch, so
the physical layout — and therefore the committed bytes and a
resumed run's reads — depend only on the batch CONTENT, not on
partition arrival order (north_rule bit-identical resume).

Sizing: 10^10 keys at 4-way/16-bit ≈ 2 bytes/key × 1.05 ≈ 21 GB →
n_buckets=16384 × ~1.3 MB rows. Defaults here are test-scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    IntegerType,
    StructField,
    StructType,
)

CUCKOO_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("table", BinaryType(), False),  # uint16[m_slots * way]
        StructField("stash", BinaryType(), False),  # uint16[]
        StructField("n_items", LongType(), False),
    ]
)

_FP_SALT = 0xF1A9
_MAX_KICKS = 256


def _hash_cols(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    h1 = F.xxhash64(F.col(key_col))
    fp = F.xxhash64(F.col(key_col), F.lit(_FP_SALT)).bitwiseAND(F.lit(0xFFFF))
    return (
        df.withColumn("__h1", h1)
        .withColumn("__fp", F.when(fp == 0, F.lit(1)).otherwise(fp).cast("int"))
        .withColumn("bucket", F.pmod(h1, F.lit(n_buckets)).cast("int"))
    )


def _slot1(h1: np.ndarray, n_buckets: int, m: int) -> np.ndarray:
    # bucket consumed the low bits (mod n_buckets); slot uses the rest
    return ((h1.view(np.uint64) // np.uint64(n_buckets)) & np.uint64(m - 1)).astype(np.int64)


def _g(fp: np.ndarray, m: int) -> np.ndarray:
    # small integer hash of the fingerprint (murmur-style mix);
    # involution partner for s2 = s1 ^ g(fp)
    return ((fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(m - 1)).astype(np.int64)


class CuckooBank:
    def __init__(self, lake, table: str = "seen_cuckoo", n_buckets: int = 32,
                 m_slots: int = 1 << 12, way: int = 4, stash_max: int = 64):
        assert m_slots & (m_slots - 1) == 0, "m_slots must be a power of two"
        self.lake = lake
        self.table = table
        self.n_buckets = n_buckets
        self.m_slots = m_slots
        self.way = way
        self.stash_max = stash_max

    def _read(self) -> DataFrame:
        return self.lake.read_or_empty(self.table, CUCKOO_SCHEMA)

    def _apply(self, keys: DataFrame, key_col: str, delete: bool) -> None:
        """Shared add/delete: cogroup the key batch with the touched
        bucket rows, rebuild those rows in numpy, commit ONLY them as
        a MoR layer (write cost = wave's bucket fan-out)."""
        nb, m, way, stash_max = self.n_buckets, self.m_slots, self.way, self.stash_max
        hashed = _hash_cols(keys.select(key_col), key_col, nb).select("bucket", "__h1", "__fp")
        existing = self._read()

        def build(key_tuple, new_pdf: pd.DataFrame, cur_pdf: pd.DataFrame) -> pd.DataFrame:
            bucket = int(key_tuple[0])
            if len(cur_pdf):
                tab = np.frombuffer(cur_pdf["table"].iloc[0], dtype=np.uint16).copy().reshape(m, way)
                stash = list(np.frombuffer(cur_pdf["stash"].iloc[0], dtype=np.uint16))
                n_items = int(cur_pdf["n_items"].iloc[0])
            else:
                tab = np.zeros((m, way), dtype=np.uint16)
                stash, n_items = [], 0
            if not len(new_pdf):
                return pd.DataFrame(
                    {"bucket": [bucket], "table": [tab.tobytes()],
                     "stash": [np.asarray(stash, dtype=np.uint16).tobytes()], "n_items": [n_items]}
                )
            h1 = new_pdf["__h1"].to_numpy(dtype=np.int64)
            fp = new_pdf["__fp"].to_numpy(dtype=np.int64)
            s1 = _slot1(h1, nb, m)
            g = _g(fp, m)
            order = np.lexsort((fp, s1))  # content-deterministic layout
            seen_batch = set()
            for i in order:
                f, a = int(fp[i]), int(s1[i])
                b = a ^ int(g[i])
                if (f, a) in seen_batch:
                    continue
                seen_batch.add((f, a))
                row_a, row_b = tab[a], tab[b]
                in_a, in_b, in_stash = f in row_a, f in row_b, f in stash
                if delete:
                    if in_a:
                        row_a[np.argmax(row_a == f)] = 0
                    elif in_b:
                        row_b[np.argmax(row_b == f)] = 0
                    elif in_stash:
                        stash.remove(f)
                    else:
                        continue
                    n_items -= 1
                    continue
                if in_a or in_b or in_stash:  # set semantics: idempotent add
                    continue
                placed = False
                for row in (row_a, row_b):
                    empties = np.flatnonzero(row == 0)
                    if len(empties):
                        row[empties[0]] = f
                        placed = True
                        break
                if not placed:
                    cur_f, cur_s = f, a
                    for kick in range(_MAX_KICKS):
                        victim_idx = kick % way
                        victim = int(tab[cur_s, victim_idx])
                        tab[cur_s, victim_idx] = cur_f
                        cur_f = victim
                        cur_s = cur_s ^ int(_g(np.asarray([victim]), m)[0])
                        empties = np.flatnonzero(tab[cur_s] == 0)
                        if len(empties):
                            tab[cur_s, empties[0]] = cur_f
                            placed = True
                            break
                    if not placed:
                        if len(stash) >= stash_max:
                            raise RuntimeError(
                                f"cuckoo bucket {bucket} overflow: resize m_slots/n_buckets"
                            )
                        stash.append(cur_f)
                n_items += 1
            return pd.DataFrame(
                {"bucket": [bucket], "table": [tab.tobytes()],
                 "stash": [np.asarray(stash, dtype=np.uint16).tobytes()], "n_items": [n_items]}
            )

        updated = (
            hashed.groupBy("bucket")
            .cogroup(existing.groupBy("bucket"))
            .applyInPandas(build, CUCKOO_SCHEMA)
            # cogroup emits a row for every bucket present on EITHER
            # side; untouched existing buckets would be rewritten
            # unchanged — keep the commit O(touched buckets)
            .join(hashed.select("bucket").distinct(), "bucket", "left_semi")
        )
        self.lake.merge_upsert(self.table, updated, ["bucket"], CUCKOO_SCHEMA)

    # -- update ------------------------------------------------------------
    def add(self, keys: DataFrame, key_col: str = "key") -> None:
        """Insert (set semantics — re-adding an existing fingerprint
        is a no-op); one atomic snapshot commit of touched buckets."""
        self._apply(keys, key_col, delete=False)

    def delete(self, keys: DataFrame, key_col: str = "key") -> None:
        """Remove the keys' fingerprints (the operation a bloom
        filter cannot support). Standard cuckoo-filter contract:
        only delete keys that were actually inserted — deleting an
        absent key whose fingerprint collides with a present one
        would evict the wrong entry. Absent, non-colliding keys are
        a no-op."""
        self._apply(keys, key_col, delete=True)

    # -- probe -------------------------------------------------------------
    def maybe_seen(self, df: DataFrame, key_col: str = "key") -> DataFrame:
        """Adds boolean `__maybe_seen`: False ⇒ DEFINITELY unseen.

        Probe shape: cogroup by bucket — each bucket's fingerprint
        table crosses the Arrow boundary once per bucket, never once
        per candidate row (see BloomBank.maybe_seen)."""
        nb, m, way = self.n_buckets, self.m_slots, self.way
        existing = self._read().select("bucket", "table", "stash")
        hashed = _hash_cols(df, key_col, nb)
        schema = StructType(
            list(hashed.schema.fields) + [StructField("__maybe_seen", BooleanType(), False)]
        )

        def probe(_key, pdf: pd.DataFrame, bank: pd.DataFrame) -> pd.DataFrame:
            out = pdf.copy()
            if not len(bank) or not len(pdf):
                out["__maybe_seen"] = False
                return out
            tab = np.frombuffer(bank["table"].iloc[0], dtype=np.uint16).reshape(m, way)
            stash = np.frombuffer(bank["stash"].iloc[0], dtype=np.uint16)
            h1 = pdf["__h1"].to_numpy(dtype=np.int64)
            fp = pdf["__fp"].to_numpy(dtype=np.int64).astype(np.uint16)
            s1 = _slot1(h1, nb, m)
            s2 = s1 ^ _g(fp, m)
            out["__maybe_seen"] = (
                (tab[s1] == fp[:, None]).any(axis=1)
                | (tab[s2] == fp[:, None]).any(axis=1)
                | np.isin(fp, stash)
            )
            return out

        res = (
            hashed.groupBy("bucket")
            .cogroup(existing.groupBy("bucket"))
            .applyInPandas(probe, schema)
        )
        return res.drop("__h1", "__fp", "bucket")

    def prefiltered_new(self, candidates: DataFrame, seen: DataFrame, key_col: str = "key") -> DataFrame:
        """Exact 'new keys' via the cuckoo fast path — identical
        contract to BloomBank.prefiltered_new: result == plain
        anti-join, always."""
        probed = self.maybe_seen(candidates, key_col)
        fresh = probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
        suspect = probed.filter(F.col("__maybe_seen")).drop("__maybe_seen")
        checked = suspect.join(seen.select(key_col), key_col, "left_anti")
        return fresh.unionByName(checked)
