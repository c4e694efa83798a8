"""Per-host crawl-budget apportionment — largest-remainder method.

A wave has a global fetch budget B (fetch-slot capacity of the
cluster) that must be split across hosts in proportion to a weight —
pending frontier mass, PageRank mass, or host importance. The
reference needs no such split (one host, one asyncio semaphore —
/root/reference/dblp_crawler/downloader.py:25-27); a web-scale
frontier does, and naive floor(B * w / W) under-allocates by up to
#hosts slots, while rounding can over-allocate past B. The
largest-remainder (Hamilton) method is the standard fix: floor
quotas, then hand the B - sum(floors) leftover slots to the hosts
with the largest remainders. The result is exactly B (when
B <= total weight of nonzero hosts it never exceeds any host's
need by more than 1), integer-exact, and engine-portable.

Scale shape: one 1-row aggregate broadcast (total weight W), a
map-side floor/remainder projection, then the leftover top-k via the
same two-pass distributed rank as crawl-order sequencing
(scheduler.global_sequence — range partition + per-partition
row_number + broadcast prefix sum; NO single-partition global
window, so it survives 10^8 hosts).

Overflow contract: B * max(weight) must stay below 2^62 (int64).
Scale weights down (they are ratios — apportionment is invariant to
a common divisor) if the product could overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_budget_alloc(hosts: DataFrame, budget: int, host_col: str = "host",
                      weight_col: str = "weight") -> DataFrame:
    """Apportion `budget` fetch slots across hosts proportionally to
    `weight_col` (non-negative int64) by largest remainder.

    Returns (host, weight, budget) with SUM(budget) == `budget`
    exactly (when total weight > 0). Deterministic: remainder ties
    break by host ascending.
    """
    from .scheduler import global_sequence

    b = int(budget)
    tot = hosts.agg(F.sum(F.col(weight_col)).cast("long").alias("__w"))
    # exact integer floor quota and remainder (`div`/`%` on longs —
    # float floor would silently lose precision past 2^53); zero
    # total weight guarded for ANSI division semantics
    based = (
        hosts.select(F.col(host_col), F.col(weight_col).cast("long").alias(weight_col))
        .join(F.broadcast(tot))
        .withColumn("__num", F.lit(b) * F.col(weight_col))
        .withColumn(
            "__base",
            F.when(F.col("__w") > 0, F.expr("__num div __w")).otherwise(F.lit(0)).cast("long"),
        )
        .withColumn(
            "__rem",
            F.when(F.col("__w") > 0, F.col("__num") % F.col("__w")).otherwise(F.lit(0)).cast("long"),
        )
    )
    # leftover slots = B - sum(floor quotas): a second 1-row broadcast
    leftover = based.agg(
        F.when(F.max("__w") > 0, F.lit(b) - F.sum("__base")).otherwise(F.lit(0))
        .cast("long").alias("__k")
    )
    ranked = global_sequence(
        based.join(F.broadcast(leftover)),
        start=1,
        order_cols=[F.desc("__rem"), F.asc(host_col)],
        out_type="long",
    )
    return ranked.select(
        host_col,
        weight_col,
        (F.col("__base") + (F.col("seq") <= F.col("__k")).cast("long")).alias("budget"),
    )


def allocation_gini(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Fairness of a per-group allocation as an EXACT rational Gini
    coefficient — the audit for host budgets and corpus source mixes
    (a crawl whose politeness budget drifts to Gini→1 is starving
    most hosts to hammer a few; a training mix at Gini 0 is perfectly
    uniform). For integer values x_1..x_n sorted ascending with
    1-based rank i:

        G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)

    — emitted as (gini_num, gini_den) int64 exactly plus the one
    rounded double, so verdicts are engine-portable. Ties in x are
    rank-order-independent (equal values contribute the same Σ i·x_i
    under any tie order), so the deterministic (x, group) ordering
    is for plan stability, not correctness.

    The global-order window runs over the PER-GROUP AGGREGATE —
    #groups rows (hosts/sources), not raw data — the same
    tiny-aggregate exception as the scheduler's prefix-sum offsets.
    """
    from pyspark.sql import Window

    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(value_col).cast("long").alias("x")
    )
    w = Window.orderBy("x", "grp")
    ranked = per.withColumn("i", F.row_number().over(w).cast("long"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("x").cast("long").alias("total"),
        (2 * F.sum(F.col("i") * F.col("x"))
         - (F.count(F.lit(1)) + 1) * F.sum("x")).cast("long").alias("gini_num"),
        (F.count(F.lit(1)) * F.sum("x")).cast("long").alias("gini_den"),
    ).select(
        "n_groups", "total", "gini_num", "gini_den",
        F.round(F.col("gini_num") / F.col("gini_den"), 6).alias("gini"),
    )


# ---- per-host byte-budget admission ------------------------------------------
#
# Politeness bounds fetch RATE; bandwidth and storage bound fetch
# BYTES — and a wave planner that admits by count alone lets one
# host's video-heavy pages eat the wave's whole byte budget.
# Candidates carry declared sizes (Content-Length from HEAD or the
# previous fetch); admission takes each host's candidates in
# (priority DESC, url) order until the running total passes the
# budget. The FIRST over-budget item still admits (a budget must
# admit at least one item per host or an oversized page starves a
# host forever — the bin-packing first-fit rule); everything after
# stops. One per-host running-sum window, all int64.

def byte_budget_admission(cand: DataFrame, budget_bytes: int,
                          host_col: str = "host", url_col: str = "url",
                          prio_col: str = "priority",
                          bytes_col: str = "bytes_est") -> DataFrame:
    """(host, url, priority, bytes_est, running_bytes, admitted) —
    per-host prefix sums in priority order; admitted while the
    PREVIOUS total is under budget."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(host_col)
        .orderBy(F.desc(prio_col), F.asc(url_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(bytes_col)).over(w)
    out = cand.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.col(prio_col).alias("priority"),
        F.col(bytes_col).alias("bytes_est"),
        run.cast("long").alias("running_bytes"),
    )
    prev = F.col("running_bytes") - F.col("bytes_est")
    return out.withColumn("admitted", prev < budget_bytes)


def byte_budget_admission_sql(src: str, budget_bytes: int,
                              host_col: str = "host", url_col: str = "url",
                              prio_col: str = "priority",
                              bytes_col: str = "bytes_est") -> str:
    """DuckDB replay of :func:`byte_budget_admission`."""
    return f"""
        WITH bb AS (
          SELECT {host_col} AS host, {url_col} AS url,
                 {prio_col} AS priority, {bytes_col} AS bytes_est,
                 CAST(SUM({bytes_col}) OVER (PARTITION BY {host_col}
                      ORDER BY {prio_col} DESC, {url_col}
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_bytes
          FROM {src}
        )
        SELECT *, running_bytes - bytes_est < {budget_bytes} AS admitted
        FROM bb
    """
