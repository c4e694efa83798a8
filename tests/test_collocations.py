"""PMI collocations, stratified sampling, and the code-vs-prose gate:
hand-computed pins + DuckDB replay equality for each."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.textstats import (
    code_prose_detect,
    code_prose_detect_sql,
    pmi_collocations,
    pmi_collocations_sql,
    stratified_sample,
    stratified_sample_sql,
)


# ---- PMI collocations -------------------------------------------------------

def _pmi_corpus(spark):
    rows = [
        (0, "new york is big and new york is busy"),
        (1, "she moved to new york last year"),
        (2, "of the people and of the land"),
        (3, "the people of new york love the city"),
        (4, "of the of the of the"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pmi_phrase_beats_function_words(spark):
    out = pmi_collocations(_pmi_corpus(spark), k=10, min_count=2).collect()
    lifts = {r.bigram: r.lift for r in out}
    assert "new york" in lifts and "of the" in lifts
    # "new york": every 'new' is followed by 'york' → high lift;
    # "of the" is frequent but predictable from its very common parts
    assert lifts["new york"] > lifts["of the"]


def test_pmi_hand_value(spark):
    # corpus: one doc "a b a b" → tokens N1=4 (a:2, b:2),
    # bigrams N2=3 (ab, ba, ab) → lift(a b) = (2/3)/((2/4)*(2/4)) = 8/3
    df = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    out = {r.bigram: r for r in pmi_collocations(df, k=5, min_count=1).collect()}
    assert out["a b"].n_pair == 2
    assert abs(out["a b"].lift - round(8 / 3, 4)) < 1e-9


def test_pmi_min_count_suppresses_hapax(spark):
    out = pmi_collocations(_pmi_corpus(spark), k=50, min_count=3).collect()
    assert all(r.n_pair >= 3 for r in out)


def test_pmi_duckdb_replay_identical(spark):
    df = _pmi_corpus(spark)
    got = pmi_collocations(df, k=10, min_count=2).toPandas().reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    want = con.sql(pmi_collocations_sql("docs", k=10, min_count=2)).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


# ---- stratified sample ------------------------------------------------------

def _strat_docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3] if i < 60 else "rare") for i in range(62)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_exact_k_per_stratum_and_small_stratum_whole(spark):
    out = stratified_sample(_strat_docs(spark), k=5).toPandas()
    counts = out.groupby("lang")["doc_id"].count().to_dict()
    assert counts == {"en": 5, "de": 5, "fr": 5, "rare": 2}
    assert out["rk"].max() == 5


def test_sample_deterministic_across_runs(spark):
    docs = _strat_docs(spark)
    a = sorted(map(tuple, stratified_sample(docs, k=5).collect()))
    b = sorted(map(tuple, stratified_sample(docs, k=5).collect()))
    assert a == b
    # and a different seed draws a different set
    c = sorted(map(tuple, stratified_sample(docs, k=5, seed=9).collect()))
    assert {t[0] for t in a} != {t[0] for t in c}


def test_stratified_duckdb_replay_identical(spark):
    docs = _strat_docs(spark)
    got = (
        stratified_sample(docs, k=5)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = (
        con.sql(stratified_sample_sql("docs", k=5)).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


# ---- code-vs-prose gate -----------------------------------------------------

def test_code_detected_prose_not(spark):
    rows = [
        (0, "def main(): return [x for x in range(10) if x % 2 == 0]"),
        (1, "The quick brown fox jumps over the lazy dog near the river bank."),
        (2, "public static void main(String[] args) { System.out.println(x); }"),
        (3, "She said she would return the book to the library tomorrow."),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in code_prose_detect(df).collect()}
    assert got[0].is_code and got[2].is_code
    assert not got[1].is_code and not got[3].is_code
    # prose quoting one keyword ("return") is one distinct hit, not code
    assert got[3].kw_hits == 1
    assert got[4].code_score == 0.0 and not got[4].is_code


def test_code_duckdb_replay_identical(spark):
    rows = [
        (0, "def f(a, b): return a + b  # sum"),
        (1, "plain prose with no symbols at all"),
        (2, "x = [i*i for i in range(n)]; print(x)"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = code_prose_detect(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.sql(code_prose_detect_sql("docs")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
