"""Standalone TIFF structure + APNG detection (operators/sniff)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    png_animated,
    png_animated_sql,
    sniff_case_sql,
    tiff_structure,
    tiff_structure_sql,
)


# ---- TIFF fixtures ----------------------------------------------------------

def _tiff_ii(entries):
    """Little-endian TIFF: header, IFD at byte 8, given 12-byte entries."""
    return ("49492A00" + "08000000" + f"{len(entries):02X}00"
            + "".join(entries) + "00000000")


def _tiff_mm(entries):
    return ("4D4D002A" + "00000008" + f"{len(entries):04X}"
            + "".join(entries) + "00000000")


def _ent_ii(tag, typ, val):
    """LE entry: tag SHORT(3) stores val in the first 2 value bytes,
    LONG(4) in all 4."""
    t = f"{tag & 0xFF:02X}{tag >> 8:02X}"
    ty = f"{typ:02X}00"
    if typ == 3:
        v = f"{val & 0xFF:02X}{val >> 8:02X}0000"
    else:
        v = "".join(f"{(val >> (8 * i)) & 0xFF:02X}" for i in range(4))
    return t + ty + "01000000" + v


def _ent_mm(tag, typ, val):
    t = f"{tag:04X}"
    ty = f"{typ:04X}"
    v = f"{val:04X}0000" if typ == 3 else f"{val:08X}"
    return t + ty + "00000001" + v


def _tiff_cases():
    return {
        # LE: width SHORT 800, height LONG 600, compression SHORT 5 (LZW)
        "ii_lzw": _tiff_ii([_ent_ii(0x0100, 3, 800),
                            _ent_ii(0x0101, 4, 600),
                            _ent_ii(0x0103, 3, 5)]),
        # BE: height as LONG — the untyped 2-byte read would return 0
        # (a BE LONG's first two bytes are its HIGH half)
        "mm_none": _tiff_mm([_ent_mm(0x0100, 3, 1024),
                             _ent_mm(0x0101, 4, 600),
                             _ent_mm(0x0103, 3, 1)]),
        # old-style JPEG-in-TIFF (code 6) — the codec-divergence tier
        "ii_jpeg_old": _tiff_ii([_ent_ii(0x0100, 3, 32),
                                 _ent_ii(0x0101, 3, 32),
                                 _ent_ii(0x0103, 3, 6)]),
        # compression code off the table (3 = CCITT G3) -> 'other'
        "mm_other": _tiff_mm([_ent_mm(0x0100, 3, 8),
                              _ent_mm(0x0101, 3, 8),
                              _ent_mm(0x0103, 3, 3)]),
        # no compression tag -> NULL compression, dims still parse
        "ii_notag": _tiff_ii([_ent_ii(0x0100, 4, 70000),
                              _ent_ii(0x0101, 4, 50000)]),
        # non-TIFF rows: all-NULL structure
        "jpeg": "FFD8FFE000104A46494600010100000100010000",
        "trunc": "49492A",
    }


def test_tiff_structure_pins(spark):
    cases = _tiff_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.fmt, r.endian, r.width, r.height, r.compression)
        for r in tiff_structure(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["ii_lzw"] == ("tiff", "II", 800, 600, "lzw")
    # BE LONG height: typed read must see 600, not the high half (0)
    assert got["mm_none"] == ("tiff", "MM", 1024, 600, "none")
    assert got["ii_jpeg_old"] == ("tiff", "II", 32, 32, "jpeg-old")
    assert got["mm_other"] == ("tiff", "MM", 8, 8, "other")
    assert got["ii_notag"] == ("tiff", "II", 70000, 50000, None)
    assert got["jpeg"] == ("jpeg", None, None, None, None)
    assert got["trunc"][0] != "tiff"  # 3-byte prefix fails the magic


def test_tiff_structure_duckdb_replay(spark):
    cases = _tiff_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        tiff_structure(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "endian", "width", "height", "compression")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(tiff_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


# ---- APNG fixtures ----------------------------------------------------------

_PNG_MAGIC = "89504E470D0A1A0A"


def _chunk(ctype, data_hex):
    return f"{len(data_hex) // 2:08X}" + ctype.encode().hex().upper() + data_hex + "00000000"


_IHDR = _chunk("IHDR", "00000010" + "00000010" + "08" + "06" + "00" + "00" + "00")
_IDAT = _chunk("IDAT", "AB" * 4)
_IEND = _chunk("IEND", "")


def _apng_cases():
    return {
        "plain": _PNG_MAGIC + _IHDR + _IDAT + _IEND,
        # acTL before IDAT: 10 frames, loop forever (plays=0)
        "apng": _PNG_MAGIC + _IHDR + _chunk("acTL", "0000000A" + "00000000")
                + _IDAT + _IEND,
        # finite replay count
        "apng3": _PNG_MAGIC + _IHDR + _chunk("acTL", "00000002" + "00000003")
                 + _IDAT + _IEND,
        # acTL AFTER image data is not an APNG — the walk parks at IDAT
        "late_actl": _PNG_MAGIC + _IHDR + _IDAT
                     + _chunk("acTL", "0000000A" + "00000000") + _IEND,
        # ancillary chunks before acTL stay within the hop bound
        "deep": _PNG_MAGIC + _IHDR + _chunk("tEXt", "AA" * 6)
                + _chunk("pHYs", "00000B13" + "00000B13" + "01")
                + _chunk("acTL", "00000004" + "00000001") + _IDAT + _IEND,
        "gif": "474946383961" + "1000" + "1000",
        "trunc_png": _PNG_MAGIC + "000000",
    }


def test_png_animated_pins(spark):
    cases = _apng_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.fmt, r.is_apng, r.n_frames, r.n_plays)
        for r in png_animated(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["plain"] == ("png", False, None, None)
    assert got["apng"] == ("png", True, 10, 0)
    assert got["apng3"] == ("png", True, 2, 3)
    assert got["late_actl"] == ("png", False, None, None)
    assert got["deep"] == ("png", True, 4, 1)
    assert got["gif"] == ("gif", None, None, None)
    assert got["trunc_png"][0] == "png" and got["trunc_png"][1] in (False, None)


def test_png_animated_duckdb_replay(spark):
    cases = _apng_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        png_animated(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "is_apng", "n_frames", "n_plays")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(png_animated_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
