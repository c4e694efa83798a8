"""EXIF IFD1 thumbnail presence: LE/MM layouts with and without a
next-IFD pointer, zero-terminator semantics, insane entry counts,
non-EXIF rows, and the DuckDB staged replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    IFD_MAX_ENTRIES,
    exif_thumbnail,
    exif_thumbnail_sql,
    sniff_case_sql,
)

APP0 = "FFE00010" + "4A46494600" + "00" * 9


def _tiff_ii(n_entries: int, next_off: int, ifd1_entries: int = 2) -> str:
    """LE TIFF: IFD0 with `n_entries` dummy entries, next-IFD
    pointer, and (when nonzero) an IFD1 with `ifd1_entries`."""
    entries = ("0F01" + "0200" + "04000000" + "41424300") * n_entries
    body = "49492A00" + "08000000" + f"{n_entries:02X}00" + entries
    body += "".join(f"{(next_off >> (8 * i)) & 255:02X}" for i in range(4))
    if next_off:
        body += f"{ifd1_entries:02X}00"
    return body


def _jpeg(tiff: str) -> str:
    seg_len = 2 + 6 + len(tiff) // 2
    return "FFD8" + APP0 + "FFE1" + f"{seg_len:04X}" + "457869660000" + tiff


def _tiff_mm(n_entries: int, next_off: int, ifd1_entries: int = 2) -> str:
    entries = ("010F" + "0002" + "00000004" + "41424300") * n_entries
    body = "4D4D002A" + "00000008" + f"{n_entries:04X}" + entries
    body += f"{next_off:08X}"
    if next_off:
        body += f"{ifd1_entries:04X}"
    return body


def _cases():
    # next-IFD offset for 1 entry: header(8) + count(2) + 12 + ptr(4) = 26
    return {
        "jpeg_thumb": _jpeg(_tiff_ii(1, 26, ifd1_entries=3)),
        "jpeg_no_thumb": _jpeg(_tiff_ii(1, 0)),
        "tiff_thumb": _tiff_mm(1, 26, ifd1_entries=4),
        "tiff_no_thumb": _tiff_mm(1, 0),
        "jpeg_plain": "FFD8" + APP0 + "FFC000110840004000400300" + "00" * 8,
        "png": "89504E470D0A1A0A" + "00" * 8,
        "insane_count": _jpeg("49492A00" + "08000000"
                              + f"{IFD_MAX_ENTRIES + 9:02X}00" + "00" * 8),
    }


def _run(spark, cases):
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = exif_thumbnail(df.select("name", F.unhex("hx").alias("bytes")))
    return {r.name: r for r in out.collect()}


def test_thumbnail_pins(spark):
    got = _run(spark, _cases())
    r = got["jpeg_thumb"]
    assert (r.has_thumbnail, r.ifd1_entries) == (True, 3)
    r = got["tiff_thumb"]
    assert (r.has_thumbnail, r.ifd1_entries) == (True, 4)
    for name in ("jpeg_no_thumb", "tiff_no_thumb"):
        r = got[name]
        assert (r.has_thumbnail, r.ifd1_entries) == (False, None)
    for name in ("jpeg_plain", "png", "insane_count"):
        r = got[name]
        assert (r.has_thumbnail, r.ifd1_entries) == (None, None)


def test_thumbnail_duckdb_replay(spark):
    cases = _cases()
    spark_pdf = (
        exif_thumbnail(
            spark.createDataFrame(list(cases.items()), "name string, hx string")
            .select("name", F.unhex("hx").alias("bytes"))
        )
        .select("name", "fmt", "has_thumbnail", "ifd1_entries")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(exif_thumbnail_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
