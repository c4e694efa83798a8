"""Frontier scheduling: priority pop, per-host politeness, robots,
global crawl-order sequencing (SURVEY.md T3/O5/O6).

Reference analogs: the year/venue filters ARE the priorities
(__main__.py:37-40, parser.py:124-129); concurrency control is one
global semaphore (downloader.py:25-27); there is no robots.txt. The
explicit queue/politeness/robots here are the north_rule upgrades,
with semantics pinned by the oracle (oracle.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def politeness_pop(pending: DataFrame, host_budget: int | None) -> DataFrame:
    """Per-host budgeted pop: within each host, highest (priority,
    url) first, at most `host_budget` rows; rest stay pending.

    Scale note: the window shuffles by host — the hot host (dblp.org,
    O6) lands in one partition, but the window only ranks and cuts at
    `host_budget`, so the per-partition work is bounded by the
    politeness budget itself; the expensive fetch/parse work is
    re-salted afterwards (functions.hashing.salted_repartition).
    """
    if host_budget is None:
        return pending
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    return (
        pending.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= host_budget)
        .drop("__rn")
    )


def global_sequence(df: DataFrame, start: int, order_cols: list) -> DataFrame:
    """Assign contiguous seq numbers following a total order.

    Implemented via sort + zipWithIndex (two distributed passes), not
    a global Window (which would funnel the whole batch through one
    partition). The scheduled batch is budget-bounded, but at
    10^10-URL scale a wave can still be millions of rows across
    thousands of hosts — this keeps sequencing parallel.
    """
    spark = df.sparkSession
    out_schema = df.schema.add("seq", "integer", False)
    ordered = df.orderBy(*order_cols)
    rdd = ordered.rdd.zipWithIndex().map(lambda t: (*t[0], start + t[1]))
    return spark.createDataFrame(rdd, out_schema)


def robots_status(df: DataFrame, robots: DataFrame) -> DataFrame:
    """Stamp status='disallowed' on urls matching a host's disallow
    prefixes; broadcast dim join (robots is tiny at any scale)."""
    r = robots.select("host", "disallow_prefixes")
    joined = df.join(F.broadcast(r), "host", "left")
    disallowed = F.when(
        F.col("disallow_prefixes").isNotNull()
        & F.exists("disallow_prefixes", lambda p: F.col("url").startswith(p)),
        F.lit("disallowed"),
    ).otherwise(F.col("status"))
    return joined.withColumn("status", disallowed).drop("disallow_prefixes")
