"""Largest-remainder crawl-budget apportionment (operators/budget.py)."""

import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.budget import host_budget_alloc


def _alloc(spark, rows, budget):
    df = spark.createDataFrame(rows, "host string, weight long")
    out = host_budget_alloc(df, budget=budget)
    return {r.host: r.budget for r in out.collect()}


def test_exact_total_and_proportionality(spark):
    # weights 5:3:2 over budget 10 -> exact quotas, no remainders
    got = _alloc(spark, [("a", 50), ("b", 30), ("c", 20)], 10)
    assert got == {"a": 5, "b": 3, "c": 2}


def test_largest_remainder_gets_leftover(spark):
    # budget 10, weights 1:1:1 -> floors 3,3,3; one leftover slot goes
    # to the lexicographically first host (remainders all tie)
    got = _alloc(spark, [("x", 7), ("y", 7), ("z", 7)], 10)
    assert sum(got.values()) == 10
    assert got == {"x": 4, "y": 3, "z": 3}


def test_hamilton_classic_case(spark):
    # floors: 10*6//14=4, 10*5//14=3, 10*3//14=2 (sum 9); remainders
    # 4/14, 8/14, 2/14 -> the middle host wins the leftover slot
    got = _alloc(spark, [("a", 6), ("b", 5), ("c", 3)], 10)
    assert got == {"a": 4, "b": 4, "c": 2} and sum(got.values()) == 10


def test_zero_total_weight_allocates_nothing(spark):
    got = _alloc(spark, [("a", 0), ("b", 0)], 10)
    assert got == {"a": 0, "b": 0}


@pytest.mark.parametrize("budget", [1, 17, 999])
def test_sum_is_exactly_budget(spark, budget):
    rows = [(f"h{i:02d}", (i * 37 + 1) % 101) for i in range(25)]
    got = _alloc(spark, rows, budget)
    assert sum(got.values()) == budget
    assert all(v >= 0 for v in got.values())


def test_no_single_partition_window_on_hosts(spark):
    """The leftover top-k rank must come from the two-pass
    distributed sequence, not a global Window over all hosts: the
    only empty-partition-spec windows allowed are over the
    #partitions-row offsets aggregate."""
    df = spark.createDataFrame([("a", 5), ("b", 3)], "host string, weight long")
    plan = host_budget_alloc(df, 10)._jdf.queryExecution().executedPlan().toString()
    # per-partition ranking window is keyed by __pid
    assert "partitionBy=[__pid]" in plan.replace(" ", "") or "__pid" in plan


def test_allocation_gini_hand_computed(spark):
    from dblp_crawler_spark.operators.budget import allocation_gini

    # x = [1, 2, 3, 4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40
    rows = [("a", 1), ("b", 2), ("c", 3), ("d", 4)]
    df = spark.createDataFrame(rows, "host string, v long")
    r = allocation_gini(df, "host", "v").collect()[0]
    assert (r.n_groups, r.total, r.gini_num, r.gini_den) == (4, 10, 10, 40)
    assert r.gini == 0.25


def test_allocation_gini_uniform_and_extreme(spark):
    from dblp_crawler_spark.operators.budget import allocation_gini

    uni = spark.createDataFrame([(h, 5) for h in "abcd"], "host string, v long")
    assert allocation_gini(uni, "host", "v").collect()[0].gini == 0.0
    # one host gets everything: G = (n-1)/n = 0.75 for n=4
    ext = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0), ("d", 100)], "host string, v long")
    assert allocation_gini(ext, "host", "v").collect()[0].gini == 0.75


def test_allocation_gini_pre_aggregates(spark):
    from dblp_crawler_spark.operators.budget import allocation_gini

    # raw rows per host sum before ranking: same result as pre-summed
    raw = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("c", 3), ("d", 4)], "host string, v long")
    pre = spark.createDataFrame(
        [("a", 2), ("b", 2), ("c", 3), ("d", 4)], "host string, v long")
    g1 = allocation_gini(raw, "host", "v").collect()[0]
    g2 = allocation_gini(pre, "host", "v").collect()[0]
    assert (g1.gini_num, g1.gini_den) == (g2.gini_num, g2.gini_den)
