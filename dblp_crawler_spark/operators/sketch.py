"""Mergeable distinct-count sketch (HyperLogLog) in pure Spark
expressions — the "novel sketch" custom operator.

Why not `approx_count_distinct`? Spark's built-in HLL++ returns only
the final number; its sketch state is opaque, so you cannot PERSIST
a per-partition/per-day sketch and merge it later. At 100 TB the
whole point of a sketch is incremental maintenance: sketch each
partition (or each day's delta) once, store the registers as a tiny
table, and answer "distinct users this month" by merging 30 rows of
registers — never rescanning raw data. These functions expose that
state as a plain DataFrame of (group, register, rho):

  * register index = top `p` bits of xxhash64(key)      (2^p registers)
  * rho            = 1 + leading zeros of the remaining bits,
                     computed with the `bin()`-length trick
                     (64 - length(bin(w)) — no clz builtin needed)
  * build/merge    = groupBy(register).max(rho): associative,
                     commutative, idempotent — a CRDT join
  * estimate       = standard HLL harmonic mean + small-range
                     (linear counting) correction

Everything is JVM-side expression work — one shuffle per build
(partial max map-side), zero Python in the hot path. Register
determinism is pinned against a from-spec Python XXH64 in
tests/test_sketch.py; accuracy is gated vs exact distinct counts.
Standard error ~= 1.04/sqrt(2^p): p=12 → ~1.6%.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_build(df: DataFrame, key_col: str, group_cols: list[str] | None = None,
              p: int = 12, hash_fn=None, hash_bits: int = 64) -> DataFrame:
    """(group..., register, rho) sketch rows — at most 2^p per group.

    hash_fn/hash_bits select the hash family: xxhash64/64 (default,
    fast path) or functions.hashing.hash60/60 (portable — the whole
    register table replays bit-identically in DuckDB for the
    correctness oracle). rho is always computed shift-free from the
    low (hash_bits - p) bits, so the same formula serves both
    families."""
    from ..functions.hashing import xx64

    hash_fn = hash_fn or xx64
    group_cols = list(group_cols or [])
    h = hash_fn(F.col(key_col))
    k = hash_bits - p  # width of the rho field
    register = F.shiftrightunsigned(h, k).cast("int").alias("register")
    # low k bits; pmod handles the signed 64-bit family (2^k is a
    # Python int — exact — and the result is always in [0, 2^k)).
    r = F.pmod(h, F.lit(1 << k).cast("decimal(20,0)")).cast("long")
    # bin() prints the value without leading zeros: highest-set-bit
    # position = length(bin(r)), so clz within the k-bit field =
    # k - length, and rho = clz + 1.
    rho = (
        F.when(r == 0, F.lit(k + 1))
        .otherwise(F.lit(k + 1) - F.length(F.bin(r)))
        .cast("int")
        .alias("rho")
    )
    return df.select(*group_cols, register, rho).groupBy(*group_cols, "register").agg(
        F.max("rho").alias("rho")
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables, keep max rho per (group, register).
    Associative/commutative/idempotent — partial sketches from any
    partitioning of the data merge to the identical sketch."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, p: int = 12, hash_bits: int = 64) -> DataFrame:
    """Collapse a register table to (group..., n_distinct_est).

    The harmonic sum Σ 2^-rho is computed EXACTLY as a scaled
    integer (Σ 2^(rho_max - rho), a DECIMAL(38,0) sum of exact
    powers of two) and descaled with one deterministic fp division —
    so the estimate is bit-identical under any partitioning, merge
    order, or engine, unlike a float summation whose rounding
    depends on row order."""
    m = 1 << p
    rho_max = hash_bits - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard alpha_m for m >= 128
    group_cols = [c for c in sketch.columns if c not in ("register", "rho")]
    scaled = F.pow(F.lit(2.0), F.lit(rho_max) - F.col("rho")).cast("decimal(38,0)")
    agg = sketch.groupBy(*group_cols).agg(
        (F.sum(scaled).cast("double") / F.lit(float(2 ** rho_max))).alias("__inv_sum"),
        F.count("*").alias("__present"),
    )
    zeros = F.lit(m) - F.col("__present")  # registers never hit
    raw = F.lit(alpha * m * m) / (F.col("__inv_sum") + zeros)  # absent => 2^-0 = 1
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)  # linear counting
    est = F.when((raw <= 2.5 * m) & (zeros > 0), small).otherwise(raw)
    return agg.select(*group_cols, F.round(est).cast("long").alias("n_distinct_est"))


def hll_error_bound(p: int) -> float:
    """~1 sigma relative standard error for 2^p registers."""
    return 1.04 / math.sqrt(1 << p)


# ---- count-min sketch (heavy hitters) -------------------------------------
def cms_build(df: DataFrame, key_col: str, d: int = 4, w: int = 1 << 12,
              weight_col: str | None = None, hash_fn=None) -> DataFrame:
    """Count-min sketch as a (row, slot, cnt) table: d hash rows of
    w counters; cnt(key) is OVER-estimated only (never under). The
    crawl's use: heavy-hitter detection over candidate hosts — find
    the dblp.org-style hot keys that need salting (O6) from a tiny
    mergeable table instead of a full groupBy over 10^10 rows.

    Integer counters → build/merge are EXACT deterministic
    aggregations (no float noise); merge = slot-wise sum, so
    per-partition/per-day sketches compose losslessly. One explode
    (d rows per input row, d is 4) + one partial-agg groupBy.

    The sketch carries its own (d, w) as literal columns: slot
    addressing is parameter-dependent, so query/merge read the
    parameters FROM the sketch instead of trusting the caller to
    repeat them — a build/query parameter mismatch is a hard error,
    never a silently-wrong estimate.

    hash_fn selects the row-hash family (xxhash64 default;
    functions.hashing.hash60 for engine-portable slot addressing —
    query with the SAME family)."""
    from ..functions.hashing import xx64

    hash_fn = hash_fn or xx64
    weight = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.select(
        F.posexplode(
            F.array(*[F.pmod(hash_fn(F.col(key_col), i), F.lit(w)) for i in range(d)])
        ).alias("row", "slot"),
        weight.cast("long").alias("__w"),
    )
    agg = rows.groupBy("row", "slot").agg(F.sum("__w").alias("cnt"))
    return agg.select("row", "slot", "cnt", F.lit(d).alias("d"), F.lit(w).alias("w"))


def _sketch_params(sketch: DataFrame) -> tuple[int, int]:
    """(d, w) embedded in the sketch — one driver read of a single
    row of the (tiny, ≤ d·w-row) sketch table."""
    if "d" not in sketch.columns or "w" not in sketch.columns:
        raise ValueError("not a cms sketch: missing embedded d/w parameter columns")
    params = sketch.select("d", "w").distinct().collect()
    if not params:
        raise ValueError("empty cms sketch: parameters unrecoverable")
    if len(params) > 1:
        raise ValueError(f"cms sketch mixes parameter sets {sorted((r.d, r.w) for r in params)}")
    return int(params[0]["d"]), int(params[0]["w"])


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Slot-wise sum — associative/commutative, exactly equal to a
    single build over the concatenated inputs. Grouping includes the
    embedded (d, w): sketches built with different parameters never
    blend into one wrong table (they surface as distinct parameter
    groups a query will then reject)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "slot", "d", "w").agg(F.sum("cnt").alias("cnt")).select(
        "row", "slot", "cnt", "d", "w"
    )


def cms_query(sketch: DataFrame, keys: DataFrame, key_col: str, hash_fn=None) -> DataFrame:
    """Estimated count per key = min over the d rows' counters
    (broadcast the tiny sketch; never shuffles the key stream).
    (d, w) come from the sketch itself — see cms_build; hash_fn
    must be the family the sketch was built with."""
    from ..functions.hashing import xx64

    hash_fn = hash_fn or xx64
    d, w = _sketch_params(sketch)
    probes = keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(*[F.pmod(hash_fn(F.col(key_col), i), F.lit(w)) for i in range(d)])
        ).alias("row", "slot"),
    )
    return (
        probes.join(F.broadcast(sketch.select("row", "slot", "cnt")), ["row", "slot"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cnt_est"))
    )


# ---------------------------------------------------------------------------
# Mergeable log2-histogram quantile sketch
# ---------------------------------------------------------------------------
#
# The third classic mergeable sketch next to HLL (distinct) and CMS
# (frequency): quantiles with bounded relative error and CRDT merge.
# Values >= 1 land in bucket floor(log2 v) — computed with the same
# binary-string-length trick HLL uses (length(bin(v)) - 1; no float
# log, so bucket boundaries are exact at powers of two where
# float log2 is not trustworthy). Values <= 0 take bucket -1. The
# q-quantile estimate is the UPPER bound of the first bucket whose
# cumulative count reaches rank ceil(q*n), so for v >= 1:
#
#   true_quantile <= estimate < 2 * true_quantile
#
# a guaranteed factor-2 envelope with 64 counters per group, merged
# by plain addition — per-day/per-partition sketches sum into
# per-month answers without rescanning raw data (the thing Spark's
# interpolating `percentile_approx` state can't do across jobs).
# Everything is integer expression work: build is one keyed shuffle
# with map-side partial counts; quantile evaluation runs on <= 65
# rows per group.


def _log2_bucket(value_col: str) -> F.Column:
    v = F.col(value_col)
    return (
        F.when(v >= 1, F.length(F.conv(v.cast("string"), 10, 2)).cast("long") - 1)
        .otherwise(F.lit(-1).cast("long"))
    )


def hist_build(df: DataFrame, value_col: str,
               group_cols: list[str] | None = None) -> DataFrame:
    """(group..., bucket, cnt) log2-histogram sketch of `value_col`."""
    gs = list(group_cols or [])
    return (
        df.groupBy(*gs, _log2_bucket(value_col).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Merge = bucket-wise count addition (associative, commutative —
    a CRDT join, same contract as hll_merge/cms_merge)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    gs = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*gs).agg(F.sum("cnt").alias("cnt"))


def hist_quantile(sketch: DataFrame, group_cols: list[str],
                  qs: list[tuple[str, int, int]] | None = None) -> DataFrame:
    """Per-group quantile upper bounds from a log2-histogram sketch.

    For each (label, num, den) fraction: rank = ceil(num*n/den) by
    integer DIV, answer bucket = first bucket (ascending) whose
    cumulative count reaches the rank, estimate = 2^(bucket+1) - 1
    (0 for the <=0 bucket). Returns
    (group..., n, <label>_bucket, <label>_ub ...) — all integers,
    engine-portable.
    """
    from pyspark.sql import Window

    qs = qs if qs is not None else [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    gs = list(group_cols)
    w_cum = (
        Window.partitionBy(*gs).orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*gs)
    cum = sketch.select(
        *gs,
        "bucket",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    ranks = cum.select(
        "*",
        *[
            F.expr(f"({num} * n + {den - 1}) DIV {den}").alias(f"_r_{label}")
            for label, num, den in qs
        ],
    )
    aggs = [F.max("n").alias("n")]
    for label, _num, _den in qs:
        aggs.append(
            F.min(F.when(F.col("cum") >= F.col(f"_r_{label}"), F.col("bucket")))
            .alias(f"{label}_bucket")
        )
    out = ranks.groupBy(*gs).agg(*aggs)
    for label, _num, _den in qs:
        out = out.withColumn(
            f"{label}_ub",
            F.when(
                F.col(f"{label}_bucket") >= 0,
                F.expr(f"shiftleft(1L, CAST({label}_bucket AS INT) + 1) - 1"),
            ).otherwise(F.lit(0).cast("long")),
        )
    return out
