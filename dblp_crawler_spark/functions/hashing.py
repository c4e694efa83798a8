"""URL hashing + salted repartitioning (O6, SURVEY.md §2.7).

The reference's only host is dblp.org, so its global asyncio
semaphore IS its skew handler (downloader.py:25-27,68-69). At
10^10-URL scale a host-keyed partitioning would put nearly all fetch
work in one partition; the engine therefore:

  * keys BUDGET ACCOUNTING by host (scheduler window), but
  * keys FETCH/PARSE WORK by a salted 64-bit url hash, spreading the
    hot host over all executors ("hot hosts rebalanced explicitly",
    BASELINE.json north_rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_hash(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(u)


# ---- portable hash family ---------------------------------------------------
# Seed separator: a control char that never appears in tokenized text,
# so hash60("a", 1) can't collide with hash60("a1").
HASH60_SEP = "\x1f"
HASH60_BITS = 60


def xx64(col: Column | str, seed: int | None = None) -> Column:
    """Default 64-bit hash lane: xxhash64 (JVM codegen, the fast
    path). Seeded form uses xxhash64's native seed column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c, F.lit(seed)) if seed is not None else F.xxhash64(c)


def hash60(col: Column | str, seed: int | None = None) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 → BIGINT
    (always positive: 60 < 63 bits). ~3× slower than xxhash64 but
    bit-identical in ANY engine with md5 — DuckDB replays it as
    CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT), so operators
    parameterized on this family (minhash/simhash/fingerprint/HLL/
    CMS) are replayable end-to-end by the SQL correctness oracle.
    Library default stays xx64; pass hash_fn=hash60 where
    cross-engine replay matters more than raw hash throughput."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    if seed is not None:
        c = F.concat(c, F.lit(HASH60_SEP + str(seed)))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB fragment computing exactly hash60(expr, seed) —
    kept adjacent to hash60 so the two definitions evolve together."""
    e = f"CAST(({expr}) AS VARCHAR)"
    if seed is not None:
        e = f"({e} || chr(31) || '{seed}')"
    return f"CAST(concat('0x', substr(md5({e}), 1, 15)) AS BIGINT)"


def salt_col(url: Column | str, buckets: int) -> Column:
    return F.pmod(url_hash(url), F.lit(buckets)).cast("int")


def salted_repartition(df: DataFrame, url_col: str = "url", buckets: int | None = None) -> DataFrame:
    """Spread rows uniformly by url hash regardless of host skew.

    Used before the fetch/parse (pandas-UDF) stage, which is
    host-agnostic CPU work; politeness was already enforced upstream
    on the host-keyed window, so rebalancing here cannot violate it.
    """
    n = buckets or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return df.repartition(int(n), salt_col(url_col, int(n)))
