"""Inverted-index build + boolean search (operators/invindex.py).

The build must report EXACT pre-cap document frequency even when the
posting list is capped, prune hapax terms at min_df, and keep the
per-term top-k as a WindowGroupLimit (no full per-term sort).
Conjunctive search must be a true intersection (a doc missing ONE
query term never surfaces) and its global top-k must plan as
TakeOrderedAndProject.
"""

from pyspark.sql import functions as F

from dblp_crawler_spark.operators.invindex import build_inverted_index, search_and


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


_DOCS = [
    (1, "spark spark spark join"),
    (2, "spark join window"),
    (3, "spark join join window window window"),
    (4, "spark window"),
    (5, "zebra"),  # hapax
]


def test_inverted_index_exact_df_despite_cap(spark):
    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    idx = build_inverted_index(df, k=2, min_df=2)
    rows = {(r.term, r.rk): (r.doc_id, r.tf, r.df) for r in idx.collect()}
    # spark: in docs 1-4 (df=4); cap keeps top-2 by tf desc, doc asc
    assert rows[("spark", 1)] == (1, 3, 4)   # tf=3 wins
    assert rows[("spark", 2)] == (2, 1, 4)   # tf tie 1-1-1 → doc_id asc
    assert ("spark", 3) not in rows          # capped at k=2 ...
    # ... but df stayed the exact pre-cap 4 on every surviving row
    # window: docs 2,3,4 (df=3); top by tf: doc3 (3), then doc2 (1)
    assert rows[("window", 1)] == (3, 3, 3)
    assert rows[("window", 2)] == (2, 1, 3)
    # hapax pruned
    assert not any(t == "zebra" for t, _ in rows)


def test_search_and_requires_all_terms(spark):
    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    got = [(r.doc_id, r.n_terms_hit, r.score)
           for r in search_and(df, ["spark", "join", "window"], k=10).collect()]
    # doc1 has no 'window', doc4 no 'join', doc5 nothing → only 2, 3
    # doc3 score = 1+2+3 = 6 beats doc2 = 3
    assert got == [(3, 3, 6), (2, 3, 3)]


def test_search_and_topk_and_tiebreak(spark):
    rows = [(i, "alpha beta") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = [r.doc_id for r in search_and(df, ["alpha", "beta"], k=5).collect()]
    assert got == [0, 1, 2, 3, 4]  # all-tied scores → doc_id asc, k enforced


def test_invindex_plan_shapes(spark):
    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    build_plan = _plan(build_inverted_index(df, k=2, min_df=2))
    assert "WindowGroupLimit" in build_plan  # rank<=k pushed below the sort
    search_plan = _plan(search_and(df, ["spark", "join"], k=5))
    assert "TakeOrderedAndProject" in search_plan  # global top-k, no full sort
    assert "BroadcastHashJoin" in search_plan      # query terms broadcast
    assert "SortMergeJoin" not in search_plan
