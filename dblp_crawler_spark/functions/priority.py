"""Scheduler priority (T3, SURVEY.md §2.5).

The reference has no explicit queue: its priorities exist as filters
(year __main__.py:37-40, keyword keyword/__init__.py:24-32, CCF venue
rank parser.py:124-129) deciding what gets crawled at all. The engine
makes them an explicit, totally-ordered priority so the pop order is
deterministic and testable.

priority = (ccf_weight << 48) | (clamp(year) << 32) | (max_depth - depth)

Higher is better. Pure integer arithmetic → whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CCF_WEIGHT = {"A": 3, "B": 2, "C": 1, "N": 0}
_MAX_DEPTH = 1 << 16


def ccf_weight(rank: Column | str) -> Column:
    r = F.col(rank) if isinstance(rank, str) else rank
    w = F.lit(0)
    for k, v in CCF_WEIGHT.items():
        w = F.when(r == k, F.lit(v)).otherwise(w)
    return w


def priority_col(ccf_rank: Column | str, year: Column | str, depth: Column | str) -> Column:
    """Deterministic 64-bit priority; higher pops first."""
    y = F.col(year) if isinstance(year, str) else year
    d = F.col(depth) if isinstance(depth, str) else depth
    y_clamped = F.greatest(F.lit(0), F.least(F.coalesce(y, F.lit(0)), F.lit(9999)))
    d_term = F.greatest(F.lit(0), F.lit(_MAX_DEPTH) - F.coalesce(d, F.lit(0)))
    return (
        ccf_weight(ccf_rank).cast("long") * F.lit(1 << 48).cast("long")
        + y_clamped.cast("long") * F.lit(1 << 32).cast("long")
        + d_term.cast("long")
    ).alias("priority")
