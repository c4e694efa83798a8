"""Exact distributed group quantiles (rank-based, interpolation-free).

Corpus curation reports distribution profiles per stratum (doc-length
percentiles per source/host/language are the standard corpus-quality
dashboard). Engines disagree on interpolated percentiles (Spark's
`percentile` lerps, DuckDB's `quantile_cont` lerps differently at the
boundaries, `quantile_disc` picks a different side) — so this
operator defines the quantile the rank-exact way: the q-quantile of
a group of n values is the value at sorted rank ceil(q·n), computed
with INTEGER arithmetic (q expressed as num/den, rank =
(num·n + den − 1) // den). Every engine that can sort agrees on the
answer bit-for-bit.

Scale shape: ONE group-keyed shuffle shared by both window specs
(row_number over the sorted group + count over the whole group),
then a same-key aggregation that collapses each group to one row
(max-of-when rank selection) — the exchange is reused, so the whole
operator is one shuffle + one agg. The per-group sort is the
irreducible cost of an EXACT quantile; for sketch-grade answers at
100 TB use a mergeable histogram instead (see operators/sketch.py
for the CRDT pattern) — this operator is the truth the sketch is
judged against.

Ties in the value column don't affect the selected VALUE (equal
values are interchangeable at a rank boundary), so no tie-break
column is needed for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (label, numerator, denominator) — q = num/den
DEFAULT_QS: list[tuple[str, int, int]] = [
    ("p50", 1, 2),
    ("p90", 9, 10),
    ("p99", 99, 100),
]


def exact_group_quantiles(df: DataFrame, value_col: str, group_col: str,
                          qs: list[tuple[str, int, int]] | None = None) -> DataFrame:
    """Per-group exact quantiles of `value_col` at the given
    (label, num, den) fractions, plus n, min, max.

    Returns one row per group: (group, n, min_<v>, max_<v>, <label>...).
    """
    qs = DEFAULT_QS if qs is None else qs
    wo = Window.partitionBy(group_col).orderBy(F.asc(value_col))
    wp = Window.partitionBy(group_col)
    ranked = df.select(
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(wo).alias("_rn"),
        F.count(F.lit(1)).over(wp).alias("_n"),
    )
    # rank_q = ceil(num*n/den) via integer DIV (float floor loses
    # exactness past 2^53) — a map-side projection on the window output
    ranked = ranked.select(
        "*",
        *[
            F.expr(f"({num} * _n + {den - 1}) DIV {den}").alias(f"_r_{label}")
            for label, num, den in qs
        ],
    )
    aggs = [
        F.max("_n").alias("n"),
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
    ]
    for label, _num, _den in qs:
        aggs.append(
            F.max(F.when(F.col("_rn") == F.col(f"_r_{label}"), F.col(value_col)))
            .alias(label)
        )
    return ranked.groupBy(group_col).agg(*aggs)
