"""Real-Iceberg readiness probe (run only when an Iceberg runtime jar
is present — this container ships none, see lakehouse.py docstring).

Exercises the Lakehouse merge contract through actual Iceberg SQL:
CREATE TABLE (hadoop catalog), MERGE INTO (matched update + not-
matched insert), snapshot rollback — proving the shim's verb set maps
onto Iceberg as config-not-code. Exits 0 on contract match.

Usage: python tools/iceberg_probe.py <warehouse_dir>
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> int:
    warehouse = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-probe")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.probe", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.probe.type", "hadoop")
        .config("spark.sql.catalog.probe.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    try:
        spark.sql("CREATE TABLE probe.db.t (key string, wave int) USING iceberg")
        spark.sql("INSERT INTO probe.db.t VALUES ('a', 0), ('b', 0)")
        snap0 = spark.sql("SELECT snapshot_id FROM probe.db.t.snapshots ORDER BY committed_at DESC LIMIT 1").collect()[0][0]
        # the exact merge_upsert contract (lakehouse.py): matched keys
        # take the new row, unmatched old rows survive, new keys insert
        spark.createDataFrame([("b", 9), ("c", 1)], "key string, wave int").createOrReplaceTempView("src")
        spark.sql(
            """
            MERGE INTO probe.db.t t USING src s ON t.key = s.key
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            """
        )
        got = {r.key: r.wave for r in spark.sql("SELECT * FROM probe.db.t").collect()}
        assert got == {"a": 0, "b": 9, "c": 1}, got
        # time travel / rollback parity with Lakehouse.rollback
        spark.sql(f"CALL probe.system.rollback_to_snapshot('db.t', {snap0})")
        got0 = {r.key: r.wave for r in spark.sql("SELECT * FROM probe.db.t").collect()}
        assert got0 == {"a": 0, "b": 0}, got0
        print("ICEBERG_CONTRACT_OK")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
