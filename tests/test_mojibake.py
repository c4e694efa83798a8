"""Mojibake detection: pins on classic double-decode residue
(Latin, punctuation, Cyrillic), legit-accent false-positive guards,
the replacement-char count, flag thresholds, and the DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.textstats import (
    mojibake_stats,
    mojibake_stats_sql,
)


def _moji(s: str) -> str:
    """The classic damage: UTF-8 bytes re-decoded as Latin-1."""
    return s.encode("utf-8").decode("latin-1")


CASES = [
    # e-acute and curly quotes as residue: 1 two-byte + 2 three-byte
    (0, _moji("café said “hello”")),
    # Cyrillic word double-decoded: every letter a C2..DF lead pair
    (1, _moji("привет")),
    # legit accents / names: no continuation-image follower
    (2, "déjà vu at the café with José and não"),
    # replacement chars from a lossy decoder
    (3, "broken � page � here"),
    # a single stray hit stays under min_hits
    (4, "one " + _moji("é") + " only in otherwise clean text"),
    (5, ""),
    # dense damage in a tiny doc
    (6, _moji("éè")),
]


def _run(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    return {r.doc_id: r for r in mojibake_stats(df).collect()}


def test_mojibake_pins(spark):
    got = _run(spark)
    r = got[0]
    assert (r.n_moji2, r.n_moji3, r.n_replacement) == (1, 2, 0)
    assert r.mojibake_flag is True
    r = got[1]
    assert r.n_moji2 == 6 and r.mojibake_flag is True
    r = got[2]  # legit accents: zero hits
    assert (r.n_moji2, r.n_moji3, r.n_replacement) == (0, 0, 0)
    assert r.mojibake_flag is False
    r = got[3]
    assert r.n_replacement == 2 and r.mojibake_flag is True
    r = got[4]  # one hit < min_hits
    assert r.n_moji2 == 1 and r.mojibake_flag is False
    r = got[5]
    assert (r.n_chars, r.moji_per_kchar, r.mojibake_flag) == (0, 0.0, False)
    assert got[6].mojibake_flag is True


def test_mojibake_duckdb_replay(spark):
    spark_pdf = (
        mojibake_stats(
            spark.createDataFrame(CASES, "doc_id long, text string"))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(CASES, columns=["doc_id", "text"]))
    duck_pdf = (
        con.sql(mojibake_stats_sql("docs")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
