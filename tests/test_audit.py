"""Dataset fingerprint: order/partitioning invariance, sensitivity
(cell edits, duplicates — incl. the XOR-cancellation trap the nibble
sums exist for), NULL vs 'NULL', shard-merge algebra, DuckDB replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.audit import (
    table_fingerprint,
    table_fingerprint_sql,
)

SCHEMA = "id long, val string, n long"
ROWS = [(i, f"v{i % 5}" if i % 7 else None, i * 11) for i in range(60)]


def _fp(spark, rows, **kw):
    return table_fingerprint(spark.createDataFrame(rows, SCHEMA), **kw).collect()


def test_order_and_partitioning_invariant(spark):
    base = _fp(spark, ROWS)
    shuffled = _fp(spark, list(reversed(ROWS)))
    df = spark.createDataFrame(ROWS, SCHEMA).repartition(13)
    repart = table_fingerprint(df).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in shuffled] == [tuple(r) for r in repart]


def test_single_cell_edit_detected(spark):
    base = _fp(spark, ROWS)[0]
    edited = [r if r[0] != 31 else (31, "vX", 31 * 11) for r in ROWS]
    got = _fp(spark, edited)[0]
    assert got.n_rows == base.n_rows
    assert (got.xor60, got.sum_lo, got.sum_mid, got.sum_hi) != (
        base.xor60, base.sum_lo, base.sum_mid, base.sum_hi)


def test_even_duplicate_xor_blindness_caught_by_sums(spark):
    """Adding the SAME row twice leaves xor60 unchanged (x^x=0) —
    the documented XOR weakness; n_rows and the additive sums catch
    it, which is why the fingerprint carries them."""
    base = _fp(spark, ROWS)[0]
    dup2 = _fp(spark, ROWS + [ROWS[0], ROWS[0]])[0]
    assert dup2.xor60 == base.xor60
    assert dup2.n_rows == base.n_rows + 2
    assert dup2.sum_lo != base.sum_lo or dup2.sum_mid != base.sum_mid


def test_null_vs_literal_null_string(spark):
    a = _fp(spark, [(1, None, 2)])[0]
    b = _fp(spark, [(1, "NULL", 2)])[0]
    c = _fp(spark, [(1, "", 2)])[0]
    assert len({(x.xor60, x.sum_lo, x.sum_mid, x.sum_hi) for x in (a, b, c)}) == 3


def test_group_fingerprints_fold_to_table_fingerprint(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", f"v{i}") for i in range(50)], "id long, g string, v string"
    )
    total = table_fingerprint(df, columns=["id", "v"]).first()
    groups = table_fingerprint(df, group_cols=["g"], columns=["id", "v"]).collect()
    xor = 0
    for r in groups:
        xor ^= r.xor60
    assert total.n_rows == sum(r.n_rows for r in groups)
    assert total.xor60 == xor
    assert total.sum_lo == sum(r.sum_lo for r in groups)
    assert total.sum_mid == sum(r.sum_mid for r in groups)
    assert total.sum_hi == sum(r.sum_hi for r in groups)


def test_duckdb_replay_identical(spark):
    spark_row = _fp(spark, ROWS)[0]
    con = duckdb.connect()
    con.register("t", pd.DataFrame(ROWS, columns=["id", "val", "n"]).astype(
        {"id": "int64", "n": "int64"}))
    duck_row = con.sql(
        table_fingerprint_sql("t", columns=["id", "val", "n"])
    ).fetchone()
    cols = ["n_rows", "xor60", "sum_lo", "sum_mid", "sum_hi"]
    duck = dict(zip([d[0] for d in con.sql(
        table_fingerprint_sql("t", columns=["id", "val", "n"])).description], duck_row))
    for c in cols:
        assert duck[c] == spark_row[c], c


def test_plan_is_one_partial_aggregation(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = (
        table_fingerprint(df, group_cols=["val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # map-side partials, one shuffle
    assert "partial_" in plan
