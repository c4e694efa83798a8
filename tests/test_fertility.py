"""Tokenizer fertility: hand-computed counts per language group,
the no-token NULL rule, and the DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.textstats import (
    tokenizer_fertility,
    tokenizer_fertility_sql,
)

DOCS = [
    # en: "hello, world!" -> tokens [hello, world]=2; bpe [hello][,][world][!]=4
    ("en", "hello, world!"),
    ("en", "ok"),                    # 1 token, 1 bpe
    # zz: punctuation-only doc: 0 whitespace tokens, 3 bpe marks
    ("zz", "!?!"),
    ("empty", ""),
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "lang string, text string")
    return {r.lang: r for r in tokenizer_fertility(df).collect()}


def test_fertility_pins(spark):
    got = _run(spark)
    en = got["en"]
    assert (en.n_docs, en.n_chars, en.n_tokens, en.n_bpe_tokens) == (2, 15, 3, 5)
    assert en.chars_per_bpe_token == 3.0
    assert en.bpe_per_token == round(5 / 3, 4)
    zz = got["zz"]
    assert (zz.n_tokens, zz.n_bpe_tokens) == (0, 3)
    assert zz.bpe_per_token is None          # no whitespace tokens: undefined
    em = got["empty"]
    assert (em.n_chars, em.n_bpe_tokens, em.chars_per_bpe_token) == (0, 0, 0.0)


def test_fertility_duckdb_replay(spark):
    spark_pdf = (
        tokenizer_fertility(spark.createDataFrame(DOCS, "lang string, text string"))
        .toPandas().sort_values("lang").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["lang", "text"]))
    duck_pdf = (
        con.sql(tokenizer_fertility_sql("docs")).df()
        .sort_values("lang").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
