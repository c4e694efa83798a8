"""Cluster-level split leakage (operators/dedup.cluster_split_leakage)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.dedup import (
    cluster_split_leakage,
    cluster_split_leakage_sql,
)


def _members():
    return [
        # leaked cluster: spans train AND val
        ("a1", "cA", "train"), ("a2", "cA", "val"), ("a3", "cA", "train"),
        # clean multi-member cluster: one split
        ("b1", "cB", "train"), ("b2", "cB", "train"),
        # singleton: never leaked
        ("s1", "s1", "val"),
        # three-way split labels: min wins the repair deterministically
        ("d1", "cD", "val"), ("d2", "cD", "test"), ("d3", "cD", "train"),
    ]


def test_cluster_split_leakage_pins(spark):
    df = spark.createDataFrame(_members(), "id string, cluster string, split string")
    got = {r.id: (r.n_splits, r.leaked, r.move_to)
           for r in cluster_split_leakage(df).collect()}
    assert got["a1"] == (2, True, "train")
    assert got["a2"] == (2, True, "train")   # the val copy moves OUT of eval
    assert got["b1"] == (1, False, None)
    assert got["s1"] == (1, False, None)
    assert got["d2"] == (3, True, "test")    # min split name, deterministic


def test_cluster_split_leakage_duckdb_replay(spark):
    df = spark.createDataFrame(_members(), "id string, cluster string, split string")
    spark_pdf = (cluster_split_leakage(df).toPandas()
                 .sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("members", pd.DataFrame(
        _members(), columns=["id", "cluster", "split"]))
    duck_pdf = (con.sql(cluster_split_leakage_sql("members")).df()
                .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
