"""Z-order (Morton) interleaving for 2-D data layout.

A 100-TB lakehouse prunes files by per-file min/max zone maps; a
layout sorted on ONE column prunes that column only. Interleaving
the bits of two columns (host-hash × time, user × day, …) into one
sort key clusters files into 2-D tiles, so a box predicate on EITHER
or BOTH columns skips most files — the technique behind
Delta/Iceberg `ZORDER BY`, here as a pure engine-portable
expression.

Spread is the classic magic-number doubling (5 shift/mask steps per
operand, not 32 per-bit terms — small enough for codegen); inputs
clamp to 31 bits so the interleaved key always fits int64 positive
and both engines agree bit-for-bit. The layout test (zone-map
pruning beats a linear sort on 2-D boxes) lives in
tests/test_zorder.py; production writes sort/repartitionByRange on
the key — the key itself is the operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shift, mask) doubling steps spreading 31 bits to even positions
_SPREAD_STEPS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread(x: Column) -> Column:
    v = x.cast("long").bitwiseAND(F.lit(0x7FFFFFFF))
    for shift, mask in _SPREAD_STEPS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def morton_key(a: Column | str, b: Column | str) -> Column:
    """62-bit Morton code of two 31-bit-clamped non-negative ints:
    bit i of `a` lands at position 2i, bit i of `b` at 2i+1. NULL in
    either input → NULL key (route to an unclustered residue, never
    silently to tile 0)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread(ca).bitwiseOR(F.shiftleft(_spread(cb), 1))


def _spread_sql(expr: str) -> str:
    v = f"(CAST({expr} AS BIGINT) & 2147483647)"
    for shift, mask in _SPREAD_STEPS:
        v = f"(({v} | ({v} << {shift})) & {mask})"
    return v


def morton_key_sql(a: str, b: str) -> str:
    """DuckDB fragment computing exactly ``morton_key(a, b)`` — the
    same doubling steps and masks."""
    return f"({_spread_sql(a)} | ({_spread_sql(b)} << 1))"


def zorder_file_stats(df: DataFrame, a: str, b: str,
                      n_files: int = 16) -> DataFrame:
    """Simulated zone maps for an ``n_files``-file layout z-ordered
    on (a, b): rows sort by the Morton key, split into equal-rank
    file slices, and each file reports min/max of both columns —
    exactly what a reader's pruning sees. Deterministic tie-break by
    (key, a, b) so the slicing replays in any engine. The window
    over the global key order is the SIMULATION's shape (test
    scale); a production write uses repartitionByRange(key) and
    never a single-partition sort."""
    from pyspark.sql import Window

    key = morton_key(a, b).alias("__zk")
    ranked = df.select(F.col(a), F.col(b), key).withColumn(
        "__rn",
        F.row_number().over(
            Window.orderBy(F.col("__zk").asc(), F.col(a).asc(), F.col(b).asc())
        ) - 1,
    )
    total = ranked.count()
    per = max(1, -(-total // n_files))
    return (
        ranked.withColumn("file_id", (F.col("__rn") / per).cast("int"))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(a).alias("min_a"), F.max(a).alias("max_a"),
            F.min(b).alias("min_b"), F.max(b).alias("max_b"),
        )
    )


def zorder_file_stats_sql(src: str, a: str, b: str,
                          n_files: int = 16, total: int | None = None) -> str:
    """DuckDB replay of :func:`zorder_file_stats` (pass the row
    count, or leave None to compute it inline)."""
    key = morton_key_sql(a, b)
    tot = str(total) if total is not None else f"(SELECT COUNT(*) FROM {src})"
    return f"""
        WITH zf_r AS (
          SELECT {a} AS a, {b} AS b,
                 CAST(ROW_NUMBER() OVER (ORDER BY {key} ASC, {a} ASC, {b} ASC)
                      - 1 AS BIGINT) AS rn
          FROM {src}
        ), zf_p AS (
          SELECT *, GREATEST(1, CAST(ceil({tot} / {n_files}.0) AS BIGINT)) AS per
          FROM zf_r
        )
        SELECT CAST(rn // per AS INT) AS file_id, COUNT(*) AS n_rows,
               MIN(a) AS min_a, MAX(a) AS max_a,
               MIN(b) AS min_b, MAX(b) AS max_b
        FROM zf_p GROUP BY 1
    """
