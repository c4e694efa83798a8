"""Rank-exact group quantiles (operators/quantiles.py)."""

from pyspark.sql import functions as F

from dblp_crawler_spark.operators.quantiles import exact_group_quantiles


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_exact_quantiles_hand_ranks(spark):
    """n=10 → p50 rank ceil(5)=5, p90 rank 9, p99 rank ceil(9.9)=10;
    n=1 → every quantile is the single value."""
    rows = [("a", v) for v in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]]
    rows += [("b", 7)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {r.g: (r.n, r.min_v, r.max_v, r.p50, r.p90, r.p99)
           for r in exact_group_quantiles(df, "v", "g").collect()}
    assert got["a"] == (10, 10, 100, 50, 90, 100)
    assert got["b"] == (1, 7, 7, 7, 7, 7)


def test_exact_quantiles_ties_at_boundary(spark):
    """Equal values straddling a rank boundary: the selected VALUE is
    deterministic regardless of which tied row takes the rank."""
    df = spark.createDataFrame([("a", v) for v in [1, 5, 5, 5, 9]], "g string, v int")
    r = exact_group_quantiles(df, "v", "g").collect()[0]
    assert (r.p50, r.p90, r.p99) == (5, 9, 9)  # rank 3, 5, 5


def test_quantiles_single_shuffle(spark):
    """Both window specs and the final agg share ONE group-keyed
    exchange — the operator is one shuffle end to end."""
    df = spark.range(100).select(
        (F.col("id") % 5).cast("string").alias("g"), F.col("id").alias("v")
    )
    import re

    plan = _plan(exact_group_quantiles(df, "v", "g"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
