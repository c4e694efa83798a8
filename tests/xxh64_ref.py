"""Independent pure-Python XXH64 + hash-operator oracles.

The xxHash64 algorithm is public (Yann Collet's spec, BSD); this is a
from-spec implementation used as an INDEPENDENT oracle for the
engine's xxhash64-based operators (fingerprint64, simhash64, minhash
signatures) whose values DuckDB cannot reproduce. Spark's `xxhash64`
expression hashes with seed 42 and chains multi-column hashes by
feeding each column's hash in as the next column's seed; strings hash
their UTF-8 bytes, ints/longs their 4-/8-byte one-shot forms.
"""

from __future__ import annotations

import re

M64 = (1 << 64) - 1
P1, P2, P3, P4, P5 = (
    0x9E3779B185EBCA87,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x85EBCA77C2B2AE63,
    0x27D4EB2F165667C5,
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & M64
    return (_rotl(acc, 31) * P1) & M64


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    seed &= M64
    n, i = len(data), 0
    if n >= 32:
        v1, v2, v3, v4 = (seed + P1 + P2) & M64, (seed + P2) & M64, seed, (seed - P1) & M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        h = ((_rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * P1) + P4) & M64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * P1) & M64), 23) * P2) + P3) & M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * P5) & M64), 11) * P1) & M64
        i += 1
    return _fmix(h)


def xxh64_long(v: int, seed: int = 42) -> int:
    seed &= M64
    h = (seed + P5 + 8) & M64
    h ^= (_rotl(((v & M64) * P2) & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def xxh64_int(v: int, seed: int = 42) -> int:
    seed &= M64
    h = (seed + P5 + 4) & M64
    h ^= ((v & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def to_signed(x: int) -> int:
    """Unsigned 64-bit → Java signed long (what Spark returns)."""
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64_str(s: str) -> int:
    """= F.xxhash64(string_col) as the signed long Spark yields."""
    return to_signed(xxh64_bytes(s.encode("utf-8"), 42))


def spark_xxhash64_str_int(s: str, i: int) -> int:
    """= F.xxhash64(string_col, int_lit): seed-chained."""
    return to_signed(xxh64_int(i, xxh64_bytes(s.encode("utf-8"), 42)))


# ---- operator oracles ------------------------------------------------------
_FP_MOD = (1 << 31) - 1


def _tokens_all(text: str) -> list[str]:
    """textstats.tokens_all: lowercase split on [^0-9a-z_]+, empties
    dropped, multiplicity preserved."""
    return [w for w in re.split(r"[^0-9a-z_]+", text.lower()) if w]


def _tokens_distinct(text: str) -> list[str]:
    """functions.text.tokenize: distinct, first-occurrence order."""
    seen, out = set(), []
    for w in re.split(r"[^0-9a-z_À-￿]+", text.lower()):
        if w and w not in seen:
            seen.add(w)
            out.append(w)
    return out


def fingerprint64_ref(text: str) -> int:
    """Oracle for textstats.fingerprint64."""
    acc = 0
    for t in _tokens_all(text):
        h = spark_xxhash64_str(t) % _FP_MOD  # pmod: non-negative
        acc = (acc * 31 + h) % _FP_MOD
    return acc


def simhash64_ref(text: str) -> int:
    """Oracle for dedup.simhash64 (returns the signed packed long)."""
    votes = [0] * 64
    for t in _tokens_distinct(text):
        h = xxh64_bytes(t.encode("utf-8"), 42)  # unsigned view
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    packed = 0
    for b in range(64):
        if votes[b] > 0:
            packed |= 1 << b
    return to_signed(packed)


def shingles_ref(text: str, n: int = 3) -> list[str]:
    """Oracle for dedup.shingles (distinct word n-grams; short docs
    collapse to the single joined-token shingle)."""
    toks = _tokens_all(text)
    if len(toks) >= n:
        seen, out = set(), []
        for i in range(len(toks) - n + 1):
            s = " ".join(toks[i : i + n])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out
    return [" ".join(toks)]


def minhash_signature_ref(text: str, num_hashes: int = 32, shingle_n: int = 3) -> list[int]:
    """Oracle for dedup.minhash_signature: per lane i, the min over
    shingles of xxhash64(shingle, lit(i)) (seed-chained string+int)."""
    sh = shingles_ref(text, shingle_n)
    return [
        min(spark_xxhash64_str_int(s, i) for s in sh) for i in range(num_hashes)
    ]
