"""Parallel-corpus mining: reciprocity gate, canonical direction and
declared-language extraction from the back edge, integer length-ratio
gate, observed-vs-declared language gate, and the DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.sources.webparse import (
    parallel_corpus_mine,
    parallel_corpus_mine_sql,
)

A = "https://x.org/en/page"
B = "https://x.org/fr/page"
C = "https://x.org/de/page"
D = "https://y.org/en/only"
E = "https://y.org/es/only"
G = "https://z.org/en/g"
H = "https://z.org/it/g"

ALT = [
    # reciprocal en<->fr pair (+ spec-required self rows)
    (A, "en", A), (A, "fr", B), (B, "fr", B), (B, "en", A),
    # one-way: C declares D a translation, D never declares back
    (C, "en", D),
    (D, "en", D),
    # reciprocal but the es side's text is far too short (ratio gate)
    (D, "es", E), (E, "en", D),
    # reciprocal but H's observed doc lang contradicts the declaration
    (G, "it", H), (H, "en", G),
]

DOCS = [
    (A, "en", "the quick brown fox jumps over the lazy dog today"),
    (B, "fr", "le renard brun rapide saute par dessus le chien du jour"),
    (C, "en", "some english words here for counting purposes ok"),
    (D, "en", "a document with roughly ten tokens in it right here now"),
    (E, "es", "dos palabras"),
    (G, "en", "english page that claims an italian partner page here"),
    (H, "de", "eigentlich eine deutsche seite nicht italienisch ueberhaupt gar"),
]


def _run(spark):
    alt = spark.createDataFrame(ALT, "url string, hreflang string, alt_url string")
    docs = spark.createDataFrame(DOCS, "url string, lang string, text string")
    return {(r.src_url, r.tgt_url): r
            for r in parallel_corpus_mine(alt, docs).collect()}


def test_mine_gates(spark):
    got = _run(spark)
    # the good pair, canonical direction A < B, langs from both edges
    r = got[(A, B)]
    assert (r.src_lang, r.tgt_lang) == ("en", "fr")
    assert r.len_ok and r.lang_ok and r.aligned
    # one-way declaration never reaches the candidate set
    assert (C, D) not in got and (D, C) not in got
    # ratio violation: flagged, not silently dropped
    r = got[(D, E)]
    assert (r.len_ok, r.aligned) == (False, False)
    # declared it, observed de on the target side
    r = got[(G, H)]
    assert (r.lang_ok, r.aligned) == (False, False)
    assert len(got) == 3


def test_mine_duckdb_replay(spark):
    alt = spark.createDataFrame(ALT, "url string, hreflang string, alt_url string")
    docs = spark.createDataFrame(DOCS, "url string, lang string, text string")
    spark_pdf = (
        parallel_corpus_mine(alt, docs)
        .toPandas().sort_values(["src_url", "tgt_url"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("alt", pd.DataFrame(ALT, columns=["url", "hreflang", "alt_url"]))
    con.register("docs", pd.DataFrame(DOCS, columns=["url", "lang", "text"]))
    duck_pdf = (
        con.sql(parallel_corpus_mine_sql("alt", "docs")).df()
        .sort_values(["src_url", "tgt_url"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
