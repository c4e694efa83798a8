"""EXIF orientation walk: hand-computed pins for II/MM layouts
(orientation behind other entries, count limits, malformed byte
order, truncation, out-of-range values), swap semantics, and the
DuckDB staged replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    IFD_MAX_ENTRIES,
    exif_orientation,
    exif_orientation_sql,
    sniff_case_sql,
)

APP0 = "FFE00010" + "4A46494600" + "00" * 9


def _entry_le(tag, typ, cnt, val8):
    return f"{tag & 255:02X}{tag >> 8:02X}" + f"{typ:02X}00" + f"{cnt:02X}000000" + val8


def _entry_be(tag, typ, cnt, val8):
    return f"{tag:04X}" + f"00{typ:02X}" + f"{cnt:08X}" + val8


def _jpeg_ii(orientation, lead_entries=1):
    """JPEG + APP1/Exif little-endian; orientation after
    `lead_entries` Make entries."""
    n = lead_entries + 1
    entries = _entry_le(0x010F, 2, 4, "41424300") * lead_entries
    entries += _entry_le(0x0112, 3, 1, f"{orientation:02X}000000")
    tiff = "49492A00" + "08000000" + f"{n:02X}00" + entries + "00000000"
    seg_len = 2 + 6 + len(tiff) // 2
    return "FFD8" + APP0 + "FFE1" + f"{seg_len:04X}" + "457869660000" + tiff


def _tiff_mm(orientation, lead_entries=1):
    n = lead_entries + 1
    entries = _entry_be(0x010F, 2, 4, "41424300") * lead_entries
    entries += _entry_be(0x0112, 3, 1, f"00{orientation:02X}0000")
    return "4D4D002A" + "00000008" + f"{n:04X}" + entries + "00000000"


def _run(spark, cases):
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = exif_orientation(df.select("name", F.unhex("hx").alias("bytes")))
    return {r.name: r for r in out.collect()}


def test_orientation_pins(spark):
    cases = {
        "jpeg_o6": _jpeg_ii(6),
        "jpeg_o1": _jpeg_ii(1),
        "tiff_o8": _tiff_mm(8),
        "tiff_o3": _tiff_mm(3),
        "jpeg_deep": _jpeg_ii(5, lead_entries=IFD_MAX_ENTRIES - 1),
        "jpeg_too_deep": _jpeg_ii(5, lead_entries=IFD_MAX_ENTRIES),  # beyond scan
        "jpeg_bad_range": _jpeg_ii(9),            # 9 is not a valid orientation
        "png": "89504E470D0A1A0A0000000D49484452",
        "jpeg_no_exif": "FFD8" + APP0 + "FFC000110840004000400300" + "00" * 8,
        "truncated": "FFD8" + APP0 + "FFE1002E4578",
    }
    got = _run(spark, cases)
    assert (got["jpeg_o6"].orientation, got["jpeg_o6"].swap_dims) == (6, True)
    assert (got["jpeg_o1"].orientation, got["jpeg_o1"].swap_dims) == (1, False)
    assert (got["tiff_o8"].orientation, got["tiff_o8"].swap_dims) == (8, True)
    assert (got["tiff_o3"].orientation, got["tiff_o3"].swap_dims) == (3, False)
    assert got["jpeg_deep"].orientation == 5
    for name in ("jpeg_too_deep", "jpeg_bad_range", "png", "jpeg_no_exif", "truncated"):
        assert got[name].orientation is None, name
        assert got[name].swap_dims is False, name
    assert got["tiff_o8"].fmt == "tiff" and got["jpeg_o6"].fmt == "jpeg"


def test_count_limits_scan(spark):
    """IFD count says 1 entry → the orientation entry sitting at
    slot 1 must NOT be read even though its bytes are present."""
    entries = (
        _entry_le(0x010F, 2, 4, "41424300")
        + _entry_le(0x0112, 3, 1, "06000000")
    )
    tiff = "49492A00" + "08000000" + "0100" + entries + "00000000"
    seg_len = 2 + 6 + len(tiff) // 2
    hx = "FFD8" + APP0 + "FFE1" + f"{seg_len:04X}" + "457869660000" + tiff
    got = _run(spark, {"short_count": hx})
    assert got["short_count"].orientation is None


def test_duckdb_replay_identical(spark):
    cases = {
        "jpeg_o6": _jpeg_ii(6),
        "tiff_o7": _tiff_mm(7),
        "jpeg_o2": _jpeg_ii(2, lead_entries=3),
        "png": "89504E470D0A1A0A0000000D49484452",
        "jpeg_bad_range": _jpeg_ii(0),
        "truncated": "FFD8" + APP0 + "FFE1002E4578",
    }
    spark_pdf = (
        _run_df(spark, cases).toPandas()
        .sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(exif_orientation_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def _run_df(spark, cases):
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    return exif_orientation(
        df.select("name", F.unhex("hx").alias("bytes"))
    ).select("name", "fmt", "orientation", "swap_dims")


# ---- GPS privacy flag -------------------------------------------------------

def _gps_payloads():
    from dblp_crawler_spark.operators.sniff import exif_gps_flag  # noqa: F401

    jpeg_gps = (
        "FFD8" + APP0 + "FFE1002E" + "457869660000"
        + "49492A00" + "08000000" + "0200"
        + _entry_le(0x010F, 2, 4, "41424300")
        + _entry_le(0x8825, 4, 1, "1A000000")
        + "00000000"
    )
    tiff_gps = (
        "4D4D002A" + "00000008" + "0002"
        + _entry_be(0x010F, 2, 4, "41424300")
        + _entry_be(0x8825, 4, 1, "0000001A")
        + "00000000"
    )
    jpeg_no_gps = (
        "FFD8" + APP0 + "FFE1002E" + "457869660000"
        + "49492A00" + "08000000" + "0100"
        + _entry_le(0x0112, 3, 1, "01000000")
        + "00000000"
    )
    png = "89504E470D0A1A0A" + "0000000D49484452"
    return [(0, jpeg_gps), (1, tiff_gps), (2, jpeg_no_gps), (3, png)]


def test_gps_flag_pins(spark):
    from dblp_crawler_spark.operators.sniff import exif_gps_flag

    rows = _gps_payloads()
    df = spark.createDataFrame(rows, "doc_id long, h string").select(
        "doc_id", F.unhex("h").alias("bytes")
    )
    got = {r.doc_id: r for r in exif_gps_flag(df).collect()}
    assert got[0].has_gps and got[0].fmt == "jpeg"     # LE JPEG, geotagged
    assert got[1].has_gps and got[1].fmt == "tiff"     # BE TIFF, geotagged
    assert not got[2].has_gps                           # EXIF but no GPS tag
    assert not got[3].has_gps                           # PNG: no EXIF at all


def test_gps_flag_duckdb_replay(spark):
    from dblp_crawler_spark.operators.sniff import exif_gps_flag, exif_gps_flag_sql

    rows = _gps_payloads()
    df = spark.createDataFrame(rows, "doc_id long, h string").select(
        "doc_id", F.unhex("h").alias("bytes")
    )
    got = exif_gps_flag(df).select("doc_id", "fmt", "has_gps") \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "h"]))
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM t)"
    want = (
        con.sql(exif_gps_flag_sql(staged)).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def _dto_hex(dt="2023:07:14 12:34:56", le=True, sub_lead=0):
    """JPEG + APP1/Exif with IFD0 {orientation, ExifIFD pointer} and
    a sub-IFD holding DateTimeOriginal behind `sub_lead` filler
    entries; the 20-byte ASCII value sits right after the sub-IFD."""
    ent = _entry_le if le else _entry_be
    val4 = (lambda v: f"{v & 255:02X}{(v >> 8) & 255:02X}{(v >> 16) & 255:02X}00") if le \
        else (lambda v: f"{v:08X}")
    sub_off = 8 + (2 + 2 * 12 + 4)                      # after a 2-entry IFD0
    n_sub = sub_lead + 1
    str_off = sub_off + 2 + n_sub * 12 + 4
    ifd0 = ("0200" if le else "0002") \
        + ent(0x0112, 3, 1, "01000000" if le else "00010000") \
        + ent(0x8769, 4, 1, val4(sub_off)) + "00000000"
    sub = (f"{n_sub & 255:02X}{n_sub >> 8:02X}" if le else f"{n_sub:04X}") \
        + ent(0x829A, 5, 1, val4(0)) * sub_lead \
        + ent(0x9003, 2, 20, val4(str_off)) + "00000000"
    payload = (dt.encode() + b"\x00").hex().upper()
    tiff = ("49492A00" + "08000000" if le else "4D4D002A" + "00000008") \
        + ifd0 + sub + payload
    seg_len = 2 + 6 + len(tiff) // 2
    return "FFD8" + APP0 + "FFE1" + f"{seg_len:04X}" + "457869660000" + tiff


def test_exif_datetime_pins_and_replay(spark):
    from dblp_crawler_spark.operators.sniff import (
        exif_datetime,
        exif_datetime_sql,
    )

    cases = {
        "ii": _dto_hex(),
        "mm": _dto_hex(le=False),
        "ii_deep": _dto_hex(sub_lead=IFD_MAX_ENTRIES - 1),
        "ii_too_deep": _dto_hex(sub_lead=IFD_MAX_ENTRIES),
        "no_pointer": _jpeg_ii(1),               # orientation only
        "garbage_str": _dto_hex(dt="2023:07:14 12:34:5X"),
        "short_str": _dto_hex(dt="2023:07:14"),
        "png": "89504E470D0A1A0A0000000D49484452",
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = exif_datetime(df.select("name", F.unhex("hx").alias("bytes")))
    got = {r.name: (r.datetime_original, r.capture_year) for r in out.collect()}
    assert got["ii"] == ("2023:07:14 12:34:56", 2023)
    assert got["mm"] == ("2023:07:14 12:34:56", 2023)
    assert got["ii_deep"] == ("2023:07:14 12:34:56", 2023)
    for name in ("ii_too_deep", "no_pointer", "garbage_str", "short_str", "png"):
        assert got[name] == (None, None), name
    # replay
    spark_pdf = (
        out.select("name", "fmt", "datetime_original", "capture_year")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(exif_datetime_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
