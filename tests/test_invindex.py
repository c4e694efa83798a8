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


# ---------------------------------------------------------------------------
# Fixed-point BM25 (search_bm25)
# ---------------------------------------------------------------------------
# Corpus stats for _DOCS: dl = 4,3,6,2,1 → N=5, T=16, A = 16 div 5 = 3.
# comp(tf, dl) = (20e6·tf·A) div (8·A·tf + 3·A + 9·dl); idf_bits =
# len(bin(N div df)). Query {spark,join,window}: df = 4,3,3 → N div df
# = 1 → idf_bits = 1 for all three (quantized IDF: common terms flatten
# to one bit — the rare-term test below exercises idf_bits > 1).


def test_bm25_hand_scored_ranking(spark):
    from dblp_crawler_spark.operators.invindex import search_bm25

    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    got = [(r.doc_id, r.n_terms_hit, r.score)
           for r in search_bm25(df, ["spark", "join", "window"], k=10).collect()]
    # doc1: spark tf3 → 180e6 div (72+9+36=117) = 1538461; join tf1 →
    #       60e6 div (24+9+36=69) = 869565            → 2408026, 2 hits
    # doc2 (dl=3): three tf1 comps, den 24+9+27=60 → 1e6 each → 3000000
    # doc3 (dl=6): spark 60e6 div 87 = 689655; join tf2 120e6 div 111 =
    #       1081081; window tf3 180e6 div 135 = 1333333 → 3104069
    # doc4 (dl=2): two tf1 comps, den 24+9+18=51 → 1176470·2 = 2352940
    assert got == [
        (3, 3, 3104069),   # tf saturation beats doc2's flat tf=1
        (2, 3, 3000000),
        (1, 2, 2408026),   # 3× spark but missing 'window' and longer
        (4, 2, 2352940),
    ]


def test_bm25_rare_term_idf_bits(spark):
    from dblp_crawler_spark.operators.invindex import search_bm25

    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    got = [(r.doc_id, r.score) for r in search_bm25(df, ["zebra"], k=5).collect()]
    # zebra df=1 → idf_bits = len(bin(5)) = 3; doc5 dl=1 tf=1 →
    # comp = 60e6 div (24+9+9=42) = 1428571 → score 3·1428571
    assert got == [(5, 3 * 1428571)]


def test_bm25_min_hits_and_semantics(spark):
    from dblp_crawler_spark.operators.invindex import search_bm25

    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    got = [r.doc_id for r in
           search_bm25(df, ["spark", "join", "window"], k=10, min_hits=3).collect()]
    assert got == [3, 2]  # AND semantics: docs 1/4 miss a term


def test_bm25_plan_shapes(spark):
    from dblp_crawler_spark.operators.invindex import search_bm25

    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    plan = _plan(search_bm25(df, ["spark", "join"], k=5))
    assert "TakeOrderedAndProject" in plan  # global top-k, no full sort
    assert "BroadcastHashJoin" in plan      # query broadcast into tokens


def test_index_delta_update_equals_rebuild(spark):
    from dblp_crawler_spark.operators.invindex import (
        postings,
        update_inverted_index,
    )

    base_rows = [(i, f"common shared w{i % 3} text token{i}") for i in range(20)]
    docs = spark.createDataFrame(base_rows, "doc_id long, text string")
    added = spark.createDataFrame(
        [(100, "common fresh text"), (101, "fresh token5 words")],
        "doc_id long, text string")
    removed = spark.createDataFrame([(3,), (7,)], "doc_id long")

    state = postings(docs)
    new_state, delta = update_inverted_index(state, added, removed, k=3, min_df=2)

    # 1) new state == postings of the post-wave corpus
    post = docs.filter(~F.col("doc_id").isin(3, 7)).unionByName(added)
    want_state = {tuple(r) for r in postings(post).collect()}
    assert {tuple(r) for r in new_state.collect()} == want_state

    # 2) delta == full rebuild restricted to touched terms
    touched = {r.term for r in postings(added).select("term").union(
        state.join(removed.select(F.col("doc_id")), "doc_id", "left_semi")
        .select("term")).distinct().collect()}
    from dblp_crawler_spark.operators.invindex import build_inverted_index
    full = build_inverted_index(post, k=3, min_df=2)
    want_delta = {tuple(r) for r in full.collect() if r.term in touched}
    assert {tuple(r) for r in delta.collect()} == want_delta

    # 3) untouched terms never appear in the delta
    assert all(r.term in touched for r in delta.collect())


def test_index_delta_vanishing_term(spark):
    from dblp_crawler_spark.operators.invindex import postings, update_inverted_index

    # 'rare' appears only in docs 1,2; removing both drops it below
    # min_df=2 -> no delta rows (serving MERGE deletes it)
    docs = spark.createDataFrame(
        [(1, "rare common"), (2, "rare common"), (3, "common common")],
        "doc_id long, text string")
    empty_add = spark.createDataFrame([], "doc_id long, text string")
    removed = spark.createDataFrame([(1,), (2,)], "doc_id long")
    _, delta = update_inverted_index(postings(docs), empty_add, removed, k=3, min_df=2)
    terms = {r.term for r in delta.collect()}
    assert "rare" not in terms
    assert "common" not in terms or True  # common df falls to 1 as well -> pruned
    assert terms == set()  # both touched terms dropped below min_df


# ---- phrase search -------------------------------------------------------------

def test_phrase_order_sensitivity_and_overlaps(spark):
    from dblp_crawler_spark.operators.invindex import search_phrase

    docs = spark.createDataFrame(
        [
            (1, "key order sort key order"),   # 2 occurrences
            (2, "order key sort"),             # AND would match; phrase must not
            (3, "a b a b a"),                  # overlapping phrase sites
            (4, "the cat the cat"),            # duplicate-word phrase target
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.occurrences
           for r in search_phrase(docs, ["key", "order"]).collect()}
    assert got == {1: 2}
    got = {r.doc_id: r.occurrences
           for r in search_phrase(docs, ["a", "b", "a"]).collect()}
    assert got == {3: 2}                        # overlaps both count
    got = {r.doc_id: r.occurrences
           for r in search_phrase(docs, ["the", "cat", "the"]).collect()}
    assert got == {4: 1}


def test_phrase_duckdb_replay(spark):
    import duckdb
    import pandas as pd

    from dblp_crawler_spark.operators.invindex import (
        search_phrase,
        search_phrase_sql,
    )

    rows = [(i, f"w{i % 3} key order w{(i * 7) % 5} key order key") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spark_pdf = (
        search_phrase(docs, ["key", "order"], k=15).toPandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck_pdf = (
        con.sql(search_phrase_sql("documents", ["key", "order"], k=15)).df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


def test_phrase_plan_broadcasts_query(spark):
    from dblp_crawler_spark.operators.invindex import search_phrase

    docs = spark.createDataFrame([(1, "key order")], "doc_id long, text string")
    plan = (
        search_phrase(docs, ["key", "order"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
