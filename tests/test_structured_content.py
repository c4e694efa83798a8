"""html_tables + code_blocks structured-content extraction
(sources/webparse)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.sources.webparse import (
    code_blocks,
    code_blocks_sql,
    html_tables,
    html_tables_sql,
)

_TABLE_HTML = (
    "<p>intro</p>"
    '<table class="data"><tr><th>Name</th><th>Qty &amp; price</th></tr>'
    "<tr><td><b>Apples</b></td><td>3 &lt; 5</td></tr>"
    "<tr><td>Pears\n  green</td><td></td></tr></table>"
    "<table><tr><td>solo</td></tr></table>"
)

_CODE_HTML = (
    '<pre><code class="language-python">def f(x):\n'
    "    return x &lt; 2</code></pre>"
    "<pre><code>plain &amp;&amp; unlabeled</code></pre>"
    "<p><code>inline, not a block</code></p>"
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_html_tables_pins(spark):
    pages = _pages(spark, [("https://ex.org/t", _TABLE_HTML)])
    got = {(r.table_idx, r.row_idx, r.col_idx): r
           for r in html_tables(pages).collect()}
    assert len(got) == 7
    assert got[(0, 0, 0)].cell == "Name"
    assert got[(0, 0, 1)].cell == "Qty & price"       # entity decoded
    assert got[(0, 0, 0)].is_header_row is True
    assert got[(0, 1, 0)].cell == "Apples"            # inner markup stripped
    assert got[(0, 1, 1)].cell == "3 < 5"
    assert got[(0, 1, 0)].is_header_row is False
    assert got[(0, 2, 0)].cell == "Pears green"       # ws folded
    assert got[(0, 2, 1)].cell == ""                  # empty cell kept
    assert got[(1, 0, 0)].cell == "solo"


def test_code_blocks_pins(spark):
    pages = _pages(spark, [("https://ex.org/c", _CODE_HTML)])
    got = {r.block_idx: r for r in code_blocks(pages).collect()}
    assert len(got) == 2                              # inline <code> ignored
    assert got[0].lang == "python"
    assert got[0].code == "def f(x):\n    return x < 2"   # newlines kept
    assert got[0].n_lines == 2
    assert got[1].lang is None
    assert got[1].code == "plain && unlabeled"


def test_structured_content_duckdb_replays(spark):
    pages = _pages(spark, [("https://ex.org/t", _TABLE_HTML),
                           ("https://ex.org/c", _CODE_HTML),
                           ("https://ex.org/n", "<p>nothing here</p>")])
    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    for fn, sql, keys in [
        (html_tables, html_tables_sql,
         ["url", "table_idx", "row_idx", "col_idx"]),
        (code_blocks, code_blocks_sql, ["url", "block_idx"]),
    ]:
        spark_pdf = (fn(pages).toPandas()
                     .sort_values(keys).reset_index(drop=True))
        duck_pdf = (con.sql(sql("pages")).df()
                    .sort_values(keys).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


_FEED = (
    "<rss><channel>"
    "<item><link>https://pod.ex/ep1</link>"
    '<enclosure url="https://cdn.ex/ep1.mp3" length="12345678" '
    'type="audio/mpeg"/>'
    "<itunes:duration>1:02:03</itunes:duration></item>"
    "<item><link>https://pod.ex/ep2</link>"
    '<enclosure type="video/mp4" url="https://cdn.ex/ep2.mp4"/>'
    "<itunes:duration>45:30</itunes:duration></item>"
    "<item><link>https://pod.ex/noenc</link></item>"
    '<item><enclosure url="https://cdn.ex/orphan.mp3" '
    'type="audio/mpeg" length="99"/></item>'
    "</channel></rss>"
)


def test_feed_enclosures(spark):
    from dblp_crawler_spark.sources.webparse import (
        feed_enclosures,
        feed_enclosures_sql,
    )
    pages = spark.createDataFrame([("pod.ex", _FEED)],
                                  "host string, feed_xml string")
    out = feed_enclosures(pages)
    got = {r.enclosure_url: r for r in out.collect()}
    assert len(got) == 3                          # item without enclosure drops
    e1 = got["https://cdn.ex/ep1.mp3"]
    assert (e1.item_url, e1.mime, e1.declared_bytes, e1.duration_s,
            e1.is_audio) == ("https://pod.ex/ep1", "audio/mpeg",
                             12345678, 3723, True)
    e2 = got["https://cdn.ex/ep2.mp4"]            # attr order free
    assert (e2.mime, e2.declared_bytes, e2.duration_s, e2.is_audio) == (
        "video/mp4", None, 2730, False)
    orphan = got["https://cdn.ex/orphan.mp3"]
    assert orphan.item_url is None and orphan.is_audio

    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    spark_pdf = (out.toPandas()
                 .sort_values("enclosure_url").reset_index(drop=True))
    duck_pdf = (con.sql(feed_enclosures_sql("pages")).df()
                .sort_values("enclosure_url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


def test_table_markdown(spark):
    from dblp_crawler_spark.sources.webparse import (
        html_tables,
        table_markdown,
        table_markdown_sql,
    )
    pages = _pages(spark, [("https://ex.org/t", _TABLE_HTML)])
    cells = html_tables(pages)
    got = {r.table_idx: r for r in table_markdown(cells).collect()}
    t0 = got[0]
    assert (t0.n_rows, t0.n_cols) == (3, 2)
    lines = t0.markdown.split("\n")
    assert lines[0] == "| Name | Qty & price |"
    assert lines[1] == "|---|---|"
    assert lines[2] == "| Apples | 3 < 5 |"
    assert lines[3] == "| Pears green |  |"
    assert got[1].markdown == "| solo |"

    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    cells_sql = html_tables_sql("pages")
    spark_pdf = (table_markdown(cells).toPandas()
                 .sort_values(["url", "table_idx"]).reset_index(drop=True))
    duck_pdf = (con.sql(table_markdown_sql(f"({cells_sql})")).df()
                .sort_values(["url", "table_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
