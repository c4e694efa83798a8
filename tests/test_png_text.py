"""PNG tEXt provenance: hand-built chunk layouts (keyword/value
pins, generator hints, park-at-IDAT ordering, NUL-scan bound,
printable-ASCII gate, empty values, truncation) and the DuckDB
staged replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    PNG_KEYWORD_MAX_BYTES,
    PNG_TEXT_MAX_BYTES,
    png_text_chunk,
    png_text_chunk_sql,
    sniff_case_sql,
)

SIG = "89504E470D0A1A0A"


def _chunk(ctype: bytes, data: bytes) -> str:
    return (f"{len(data):08X}" + ctype.hex().upper()
            + data.hex().upper() + "00000000")


IHDR = _chunk(b"IHDR", bytes.fromhex("00000010" "00000010") + bytes([8, 6, 0, 0, 0]))
IDAT0 = _chunk(b"IDAT", b"\x00")
GAMA = _chunk(b"gAMA", (45455).to_bytes(4, "big"))


def _text(keyword: bytes, value: bytes) -> str:
    return _chunk(b"tEXt", keyword + b"\x00" + value)


def _run(spark, cases):
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = png_text_chunk(df.select("name", F.unhex("hx").alias("bytes")))
    return {r.name: r for r in out.collect()}


def _cases():
    return {
        "software": SIG + IHDR + _text(b"Software", b"GIMP 2.10") + IDAT0,
        "sd_params": SIG + IHDR + _text(b"parameters", b"masterpiece, 8k") + IDAT0,
        "sd_software": SIG + IHDR + GAMA
        + _text(b"Software", b"Stable Diffusion web UI") + IDAT0,
        "comfy": SIG + IHDR + _text(b"Software", b"ComfyUI v1") + IDAT0,
        "no_text": SIG + IHDR + IDAT0,
        "text_after_idat": SIG + IHDR + IDAT0 + _text(b"Software", b"late"),
        "empty_value": SIG + IHDR + _text(b"Comment", b"") + IDAT0,
        "latin1_value": SIG + IHDR + _text(b"Author", b"Jos\xe9") + IDAT0,
        "no_nul": SIG + IHDR
        + _chunk(b"tEXt", b"k" * (PNG_KEYWORD_MAX_BYTES + 4)) + IDAT0,
        "long_value": SIG + IHDR
        + _text(b"Comment", b"x" * (PNG_TEXT_MAX_BYTES + 20)) + IDAT0,
        "jpeg": "FFD8FFE000104A464946000101000001000100" + "00" * 4,
    }


def test_png_text_pins(spark):
    got = _run(spark, _cases())
    r = got["software"]
    assert (r.text_keyword, r.text_value, r.gen_hint) == ("Software", "GIMP 2.10", False)
    r = got["sd_params"]
    assert (r.text_keyword, r.text_value, r.gen_hint) == (
        "parameters", "masterpiece, 8k", True)
    r = got["sd_software"]  # reached through a gAMA hop, regex hint
    assert (r.text_keyword, r.gen_hint) == ("Software", True)
    assert got["comfy"].gen_hint is True
    # no pre-IDAT tEXt: ordinary PNG and a spec-legal late tEXt both NULL
    for name in ("no_text", "text_after_idat"):
        r = got[name]
        assert r.fmt == "png"
        assert (r.text_keyword, r.text_value, r.gen_hint) == (None, None, None)
    # empty text field decodes to '' (still a hint-false keyword)
    r = got["empty_value"]
    assert (r.text_keyword, r.text_value, r.gen_hint) == ("Comment", "", False)
    # Latin-1 value fails the printable-ASCII gate; keyword survives
    r = got["latin1_value"]
    assert (r.text_keyword, r.text_value, r.gen_hint) == ("Author", None, False)
    # keyword with no NUL inside the scan bound NULL-absorbs
    r = got["no_nul"]
    assert (r.text_keyword, r.text_value) == (None, None)
    # value clamps at PNG_TEXT_MAX_BYTES
    assert got["long_value"].text_value == "x" * PNG_TEXT_MAX_BYTES
    r = got["jpeg"]
    assert r.fmt == "jpeg"
    assert (r.text_keyword, r.text_value, r.gen_hint) == (None, None, None)


def test_png_text_duckdb_replay(spark):
    cases = _cases()
    spark_pdf = (
        png_text_chunk(
            spark.createDataFrame(list(cases.items()), "name string, hx string")
            .select("name", F.unhex("hx").alias("bytes"))
        )
        .select("name", "fmt", "text_keyword", "text_value", "gen_hint")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(png_text_chunk_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
