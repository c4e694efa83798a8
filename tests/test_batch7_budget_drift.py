"""Batch pins: per-host byte-budget admission (first-fit rule,
priority order, per-host independence) and snapshot embedding drift
(identical/opposite/orthogonal groups, quantized determinism) — with
DuckDB replays."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.budget import (
    byte_budget_admission,
    byte_budget_admission_sql,
)
from dblp_crawler_spark.operators.similarity import (
    embedding_drift,
    embedding_drift_sql,
)

CAND = [
    # host a, budget 1000: 600 admits, 600 admits (first over-budget
    # item still goes: prev total 600 < 1000), 600 stops
    ("a.org", "u1", 9, 600), ("a.org", "u2", 8, 600), ("a.org", "u3", 7, 600),
    # host b: oversized top item admits alone
    ("b.org", "v1", 9, 5000), ("b.org", "v2", 8, 10),
    # host c: everything fits
    ("c.org", "w1", 5, 100), ("c.org", "w2", 4, 100),
]


def test_byte_budget(spark):
    df = spark.createDataFrame(
        CAND, "host string, url string, priority long, bytes_est long")
    got = {r.url: r for r in byte_budget_admission(df, 1000).collect()}
    assert [got[u].admitted for u in ("u1", "u2", "u3")] == [True, True, False]
    assert got["v1"].admitted is True and got["v2"].admitted is False
    assert got["w1"].admitted and got["w2"].admitted
    assert got["u2"].running_bytes == 1200
    spark_pdf = (
        byte_budget_admission(df, 1000).toPandas()
        .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("cand", pd.DataFrame(
        CAND, columns=["host", "url", "priority", "bytes_est"]))
    duck_pdf = (
        con.sql(byte_budget_admission_sql("cand", 1000)).df()
        .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)


def _snaps():
    a, b = [], []
    # same: identical distributions -> cos 1, drift 0
    for i in range(4):
        a.append(("same", [1.0, 2.0, 3.0]))
        b.append(("same", [1.0, 2.0, 3.0]))
    # flip: opposite direction -> cos -1, drift 2
    a.append(("flip", [1.0, 0.0, 0.0]))
    b.append(("flip", [-1.0, 0.0, 0.0]))
    # orth: orthogonal -> cos 0, drift 1
    a.append(("orth", [0.5, 0.0, 0.0]))
    b.append(("orth", [0.0, 0.5, 0.0]))
    # zero side -> NULL cosine
    a.append(("zed", [0.0, 0.0, 0.0]))
    b.append(("zed", [1.0, 1.0, 0.0]))
    return a, b


def test_embedding_drift(spark):
    ra, rb = _snaps()
    a = spark.createDataFrame(ra, "label string, embedding array<double>")
    b = spark.createDataFrame(rb, "label string, embedding array<double>")
    got = {r.label: r for r in embedding_drift(a, b).collect()}
    assert (got["same"].cos_sim, got["same"].drift) == (1.0, 0.0)
    assert (got["flip"].cos_sim, got["flip"].drift) == (-1.0, 2.0)
    assert (got["orth"].cos_sim, got["orth"].drift) == (0.0, 1.0)
    assert (got["zed"].cos_sim, got["zed"].drift) == (None, None)
    assert got["same"].n_a == 4 and got["same"].n_b == 4
    spark_pdf = (
        embedding_drift(a, b).toPandas()
        .sort_values("label").reset_index(drop=True))
    con = duckdb.connect()
    con.register("sa", pd.DataFrame(ra, columns=["label", "embedding"]))
    con.register("sb", pd.DataFrame(rb, columns=["label", "embedding"]))
    duck_pdf = (
        con.sql(embedding_drift_sql("sa", "sb")).df()
        .sort_values("label").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
