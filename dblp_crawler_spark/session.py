"""SparkSession factory tuned for the frontier workload.

Scale posture (100 TB / 1000 executors): AQE on (runtime coalesce +
skew-join splitting), adaptive shuffle partition sizing, Arrow enabled
for every pandas-UDF stage, broadcast threshold sized for dimension
tables (ccf_rank, robots) which stay tiny even at full scale.
Locally we run `local[N]`; nothing here is local-mode specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark-frontier",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # local[N] → N is a good default; on a real cluster the driver
        # passes an explicit value (~2-3x total cores) or relies on AQE
        # coalescing from a higher initial number.
        n = master.split("[")[-1].rstrip("]") if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # The URL-resolution/canonicalization expressions are large
        # CASE trees; with the default 1024 split threshold the
        # generated doConsume for the HTML-harvest projections
        # exceeds the JVM's 64 KB method limit, janino hard-errors,
        # and the whole stage silently falls back to interpreted
        # rows. A lower threshold makes codegen emit more, smaller
        # methods: compiles cleanly, same steady-state time at
        # fixture scale, and keeps WholeStageCodegen spans wide at
        # real scale (A/B in BENCH.md notes).
        .config("spark.sql.codegen.methodSplitThreshold", "128")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Every unpartitioned Window in the package is a documented
    # tiny-aggregate (exclusive prefix-sum over ≤ a few thousand
    # partition/bucket offsets, a bounded LIMIT pop, a CDF over a
    # histogram's bins); WindowExec's "No Partition Defined" WARN on
    # those drowns out real skew warnings in gate logs, so silence
    # that one logger and keep everything else at WARN.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # log4j2 API absent (non-default logging backend)
    return spark
