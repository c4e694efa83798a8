"""SVG structure/safety gate (sources/webparse.svg_structure) and
ICO favicon directory structure (operators/sniff.ico_structure)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    ico_structure,
    ico_structure_sql,
    sniff_case_sql,
    sniffed_type,
)
from dblp_crawler_spark.sources.webparse import (
    svg_structure,
    svg_structure_sql,
)

SVG_COLS = [
    "is_svg", "width_px", "height_px", "vb_w", "vb_h", "has_script",
    "has_event_handler", "has_foreign_object", "has_js_href", "unsafe",
    "is_animated",
]


def _svg_cases():
    return {
        "plain": '<svg width="100" height="50" viewBox="0 0 100 50">'
                 '<rect/></svg>',
        "script": '<svg viewBox="0 0 10 10"><script>alert(1)</script></svg>',
        "handler": '<svg width="10" height="10"><rect onload="evil()"/></svg>',
        # CSS-unit dims stay NULL; js href + foreignObject both fire
        "foreign_pt": '<svg height="20pt" width="20pt"><foreignObject>'
                      '<a xlink:href="javascript:x"></a></foreignObject></svg>',
        "anim": '<svg width="32px" height="32px"><circle>'
                '<animate attributeName="r"/></circle></svg>',
        "decl": '<?xml version="1.0"?><svg viewBox="0 0 300 150"></svg>',
        # stroke-width must NOT satisfy the width pattern
        "strokew": '<svg stroke-width="3" viewBox="0 0 8 4"></svg>',
        "html": '<html><body><p>hi onclick= nothing</p></body></html>',
        "pct": '<svg width="100%" height="100%"></svg>',
        # a <script> far past the prescan window still gates
        "late_script": '<svg viewBox="0 0 1 1">' + "<g></g>" * 800
                       + "<script>x</script></svg>",
    }


def test_svg_structure_pins(spark):
    cases = _svg_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, svg_text string")
    got = {r["name"]: r.asDict() for r in svg_structure(df).collect()}

    assert got["plain"]["width_px"] == 100.0
    assert got["plain"]["height_px"] == 50.0
    assert got["plain"]["vb_w"] == 100.0 and got["plain"]["vb_h"] == 50.0
    assert got["plain"]["unsafe"] is False

    assert got["script"]["has_script"] is True
    assert got["script"]["unsafe"] is True
    assert got["script"]["vb_w"] == 10.0

    assert got["handler"]["has_event_handler"] is True
    assert got["handler"]["unsafe"] is True

    # pt dims are a layout question, not pixels
    assert got["foreign_pt"]["width_px"] is None
    assert got["foreign_pt"]["has_foreign_object"] is True
    assert got["foreign_pt"]["has_js_href"] is True

    assert got["anim"]["is_animated"] is True
    assert got["anim"]["width_px"] == 32.0
    assert got["anim"]["unsafe"] is False

    assert got["decl"]["is_svg"] is True
    assert got["decl"]["vb_w"] == 300.0

    # stroke-width never matches the width attribute pattern
    assert got["strokew"]["width_px"] is None
    assert got["strokew"]["vb_w"] == 8.0

    assert got["html"]["is_svg"] is False
    assert got["html"]["unsafe"] is None

    assert got["pct"]["width_px"] is None  # % is not px

    # security scan covers the FULL text, not just the prescan window
    assert len(cases["late_script"]) > 4096
    assert got["late_script"]["has_script"] is True
    assert got["late_script"]["unsafe"] is True


def test_svg_structure_duckdb_replay(spark):
    cases = _svg_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, svg_text string")
    spark_pdf = (
        svg_structure(df).select("name", *SVG_COLS)
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pages", pd.DataFrame(cases.items(),
                                       columns=["name", "svg_text"]))
    duck_pdf = (
        con.sql(svg_structure_sql("pages", keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def _le(v, n):
    return "".join(f"{(v >> (8 * i)) & 255:02X}" for i in range(n))


def _entry(w, h, off):
    return (_le(w, 1) + _le(h, 1) + "0000" + _le(1, 2) + _le(32, 2)
            + _le(64, 4) + _le(off, 4))


def _ico_cases():
    return {
        "two": "0000" + "0100" + _le(2, 2)
               + _entry(16, 16, 38) + _entry(32, 32, 102),
        # 0-byte dims mean 256; payload at byte 22 is a PNG stream
        "pngemb": "0000" + "0100" + _le(1, 2) + _entry(0, 0, 22)
                  + "89504E470D0A1A0A" + "00" * 8,
        "cursor": "0000" + "0200" + _le(1, 2) + _entry(32, 32, 22),
        "trunc": "00000100",
        "png": "89504E470D0A1A0A" + "0000000D49484452",
        # five declared entries; only the first ICO_SCAN_ENTRIES=4
        # feed max dims (the 48px fifth entry is beyond the cap)
        "five": "0000" + "0100" + _le(5, 2) + _entry(8, 8, 86)
                + _entry(16, 16, 86) + _entry(24, 24, 86)
                + _entry(32, 32, 86) + _entry(48, 48, 86),
    }


def test_ico_magic_sniffs(spark):
    df = spark.createDataFrame(
        [("i", bytes.fromhex("00000100010010100000010020004000" + "00" * 8)),
         ("c", bytes.fromhex("000002000100")),
         ("z", b"\x00\x00\x00\x00rest")],
        "name string, bytes binary")
    got = {r.name: r.s for r in
           df.select("name", sniffed_type("bytes").alias("s")).collect()}
    assert got == {"i": "ico", "c": "ico", "z": "octet-stream"}


def test_ico_structure_pins_and_replay(spark):
    cases = _ico_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = ico_structure(df.select("name", F.unhex("hx").alias("bytes")))
    got = {r.name: (r.fmt, r.kind, r.n_images, r.max_w, r.max_h,
                    r.has_png_entry) for r in out.collect()}
    assert got["two"] == ("ico", "icon", 2, 32, 32, False)
    assert got["pngemb"] == ("ico", "icon", 1, 256, 256, True)
    assert got["cursor"] == ("ico", "cursor", 1, 32, 32, False)
    assert got["trunc"] == ("ico", "icon", None, None, None, None)
    assert got["png"] == ("png", None, None, None, None, None)
    assert got["five"] == ("ico", "icon", 5, 32, 32, False)

    spark_pdf = (
        out.select("name", "fmt", "kind", "n_images", "max_w", "max_h",
                   "has_png_entry")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("icos", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM icos)"
    duck_pdf = (
        con.sql(ico_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
