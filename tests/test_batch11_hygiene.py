"""Batch pins: invisible/bidi character hygiene (counts, cleaning,
RLO spoof case) and per-host caption diversity (template detection,
case-fold collapse, missing captions) — with DuckDB replays."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.textstats import (
    invisible_chars,
    invisible_chars_sql,
)
from dblp_crawler_spark.sources.webparse import (
    caption_diversity,
    caption_diversity_sql,
)

DOCS = [
    (0, "clean text"),
    (1, "hid​den wa‍ter⁠mark"),            # 3 zero-width
    (2, "file‮gpj.exe"),                              # RLO spoof
    (3, "﻿BOM then ⁦isolate⁩"),             # mixed
    (4, ""),
]


def test_invisible_chars(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r for r in invisible_chars(df).collect()}
    assert got[0].has_invisible is False and got[0].clean_text == "clean text"
    r = got[1]
    assert (r.n_zero_width, r.n_bidi_ctrl) == (3, 0)
    assert r.clean_text == "hidden watermark"
    r = got[2]
    assert (r.n_zero_width, r.n_bidi_ctrl, r.clean_text) == (0, 1, "filegpj.exe")
    r = got[3]
    assert (r.n_zero_width, r.n_bidi_ctrl) == (1, 2)
    assert r.clean_text == "BOM then isolate"
    assert got[4].has_invisible is False
    spark_pdf = (
        invisible_chars(df).toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    duck_pdf = (
        con.sql(invisible_chars_sql("docs")).df()
        .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


IMGS = (
    # template farm: 10 images, 9 share one caption (case-folded)
    [("farm.net", "Beautiful Sunset Wallpaper HD")] * 5
    + [("farm.net", "beautiful sunset wallpaper hd ")] * 4
    + [("farm.net", "a real caption")]
    # organic: all distinct
    + [("good.org", f"caption {i}") for i in range(8)]
    # missing captions don't make a template
    + [("bare.org", None)] * 10
    + [("bare.org", "")] * 2
    # small host: top share high but under min_images
    + [("tiny.org", "same")] * 3
)


def test_caption_diversity(spark):
    df = spark.createDataFrame(IMGS, "host string, caption string")
    got = {r.host: r for r in caption_diversity(df).collect()}
    r = got["farm.net"]
    assert (r.n_images, r.n_captioned, r.n_distinct) == (10, 10, 2)
    assert r.top_share_milli == 900 and r.templated is True
    r = got["good.org"]
    assert (r.n_distinct, r.templated) == (8, False)
    r = got["bare.org"]
    assert (r.n_images, r.n_captioned, r.templated) == (12, 0, False)
    assert got["tiny.org"].templated is False
    spark_pdf = (
        caption_diversity(df).toPandas().sort_values("host").reset_index(drop=True))
    con = duckdb.connect()
    con.register("imgs", pd.DataFrame(IMGS, columns=["host", "caption"]))
    duck_pdf = (
        con.sql(caption_diversity_sql("imgs")).df()
        .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
