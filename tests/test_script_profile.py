"""Unicode script profile: hand-counted pins (incl. a Latin/Cyrillic
tie broken by table order), empty/Common degenerates, and the DuckDB
replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.textstats import (
    script_profile,
    script_profile_sql,
)


def _run(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return {r.doc_id: r for r in script_profile(df).collect()}


def test_hand_counts_and_dominance(spark):
    got = _run(spark, [
        "abcПри汉字x",          # latin 4, cyr 3, han 2, other 0
        "При汉字абв",           # cyr 6 dominant
        "abc При",              # latin 3 = cyr 3 tie → table order → latin
        "123 .,!",              # no script → other
        "",                     # empty → none
        "مرحبا",                # arabic dominant
        "한글테스트",            # hangul
    ])
    r = got[0]
    assert (r.n_latin, r.n_cyrillic, r.n_han, r.n_other) == (4, 3, 2, 0)
    assert r.dominant == "latin"
    assert got[1].dominant == "cyrillic"
    assert got[2].dominant == "latin"          # tie breaks to table order
    assert got[3].dominant == "other" and got[3].n_other == 7
    assert got[4].dominant == "none" and got[4].n_chars == 0
    assert got[5].dominant == "arabic" and got[5].n_arabic == 5
    assert got[6].dominant == "hangul"


def test_counts_partition_n_chars(spark):
    texts = ["mix Прив 汉 ελ 123", "pure latin words", "عربي فقط"]
    for r in _run(spark, texts).values():
        listed = (r.n_latin + r.n_cyrillic + r.n_han + r.n_arabic
                  + r.n_greek + r.n_hangul + r.n_devanagari)
        assert listed + r.n_other == r.n_chars


def test_duckdb_replay_identical(spark):
    texts = ["abcПри汉字x", "", "123", "Ελληνικά και latin", "देवनागरी"]
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spark_pdf = (
        script_profile(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck_pdf = (
        con.sql(script_profile_sql("t")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
