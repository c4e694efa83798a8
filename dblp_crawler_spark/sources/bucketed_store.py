"""Bucketed payload store — the no-broadcast fetch path at scale.

The per-wave fetch broadcasts the scheduled key set into the payload
scan (tools/throughput_job.py, plans/crawl.py) — correct while the
budget-bounded wave fits in a broadcast. When a wave is too large for
that (north_rule: 10^10-URL frontier), the same no-blob-shuffle
property comes from layout instead:

  * `write_partitioned`: payloads land under bucket=<k> directories,
    k = pmod(xxhash64(key), n). A fetch first computes the wanted
    bucket set from the scheduled keys (≤ n values) and scans ONLY
    those directories — Catalyst partition pruning, visible as
    PartitionFilters in the plan.
  * `write_bucketed_table` + `bucketed_join`: both sides persisted
    with identical `bucketBy(n, key)` + `sortBy(key)` layout; the
    join then needs NO Exchange on either side (SortMergeJoin over
    pre-bucketed, pre-sorted scans). This is the Iceberg
    `write.distribution-mode=hash` / bucket-transform equivalent
    expressed with Spark's native bucketing.

Both layouts are verified by plan-shape tests (tests/test_bucketed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_of(key, n_buckets: int):
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")


def write_partitioned(df: DataFrame, path: str, key_col: str, n_buckets: int) -> None:
    """Directory-partitioned layout: <path>/bucket=<k>/part-*.parquet."""
    df.withColumn("bucket", bucket_of(F.col(key_col), n_buckets)).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)


def pruned_fetch(
    spark: SparkSession, path: str, keys: DataFrame, key_col: str, n_buckets: int
) -> DataFrame:
    """Scan only the buckets the scheduled keys hash into, then join.
    The bucket set is ≤ n_buckets values — a driver-side collect of a
    tiny aggregate, never of the keys themselves."""
    wanted = [
        r[0]
        for r in keys.select(bucket_of(F.col(key_col), n_buckets).alias("b")).distinct().collect()
    ]
    store = spark.read.parquet(path).filter(F.col("bucket").isin(wanted))
    return store.join(keys, key_col, "inner")


def write_bucketed_table(df: DataFrame, table: str, key_col: str, n_buckets: int) -> None:
    """Hash-bucketed + sorted table layout (Spark native bucketing)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key_col)
        .sortBy(key_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key_col: str) -> DataFrame:
    """Join two identically-bucketed tables — planned without any
    Exchange (shuffle) on either side."""
    return spark.table(left_table).join(spark.table(right_table), key_col, "inner")
