"""Anchor-text aggregation (operators/anchors.py): per-target top-k
anchor terms with spam-resistant distinct-source ranking."""

from pyspark.sql import functions as F

from dblp_crawler_spark.operators.anchors import anchor_terms, anchor_text_topk


def _links(spark):
    # target 100: 'spark' linked by 3 distinct pages; 'sql' by 1 page
    #             but spammed 5 times -> 'spark' must outrank it
    # target 200: two terms tied on (n_srcs, n_links) -> lexicographic
    rows = (
        [(1, 100, "spark engine"), (2, 100, "spark docs"), (3, 100, "spark")]
        + [(4, 100, "sql")] * 5
        + [(5, 200, "alpha"), (6, 200, "alpha"), (5, 200, "beta"), (6, 200, "beta")]
    )
    return spark.createDataFrame(rows, "src long, dst long, anchor string")


def test_distinct_source_ranking_beats_link_spam(spark):
    top = anchor_text_topk(anchor_terms(_links(spark)), k=1)
    got = {r.dst: r for r in top.collect()}
    assert got[100].term == "spark" and got[100].n_srcs == 3
    # the spammed term carried more raw links but fewer sources
    all_terms = {
        (r.dst, r.term): r
        for r in anchor_text_topk(anchor_terms(_links(spark)), k=10).collect()
    }
    assert all_terms[(100, "sql")].n_links == 5 and all_terms[(100, "sql")].n_srcs == 1
    # deterministic lexicographic tie-break
    assert got[200].term == "alpha"


def test_anchor_term_cap_bounds_stuffing(spark):
    stuffed = spark.createDataFrame(
        [(1, 9, " ".join(f"w{i}" for i in range(50)))], "src long, dst long, anchor string"
    )
    n = anchor_terms(stuffed, max_terms=8).count()
    assert n == 8


def test_topk_plans_as_window_group_limit(spark):
    plan = (
        anchor_text_topk(anchor_terms(_links(spark)), k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
