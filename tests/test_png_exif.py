"""EXIF-in-PNG (eXIf chunk): LE/BE orientation pins, chunk-hop
reach, missing chunk/tag, out-of-range values, non-PNG rows, and
the DuckDB replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    png_exif_orientation,
    png_exif_orientation_sql,
    sniff_case_sql,
)

SIG = "89504E470D0A1A0A"


def _chunk(ctype: bytes, data: bytes) -> str:
    return (f"{len(data):08X}" + ctype.hex().upper()
            + data.hex().upper() + "00000000")


IHDR = _chunk(b"IHDR", bytes.fromhex("00000010" "00000010") + bytes([8, 6, 0, 0, 0]))
IDAT0 = _chunk(b"IDAT", b"\x00")
GAMA = _chunk(b"gAMA", (45455).to_bytes(4, "big"))


def _tiff_ii(orientation: int) -> bytes:
    ent = bytes.fromhex("1201") + bytes.fromhex("0300") \
        + (1).to_bytes(4, "little") + orientation.to_bytes(2, "little") + b"\x00\x00"
    return (b"II*\x00" + (8).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + ent + b"\x00\x00\x00\x00")


def _tiff_mm(orientation: int) -> bytes:
    ent = bytes.fromhex("0112") + bytes.fromhex("0003") \
        + (1).to_bytes(4, "big") + orientation.to_bytes(2, "big") + b"\x00\x00"
    return (b"MM\x00*" + (8).to_bytes(4, "big")
            + (1).to_bytes(2, "big") + ent + b"\x00\x00\x00\x00")


def _png_exif(tiff: bytes, pre: str = "") -> str:
    return SIG + IHDR + pre + _chunk(b"eXIf", tiff) + IDAT0


def _cases():
    return {
        "le_o6": _png_exif(_tiff_ii(6)),
        "be_o8": _png_exif(_tiff_mm(8)),
        "le_o1_behind_gama": _png_exif(_tiff_ii(1), pre=GAMA),
        "bad_range": _png_exif(_tiff_ii(9)),
        "no_exif": SIG + IHDR + IDAT0,
        "jpeg": "FFD8FFE000104A464946000101000001000100" + "00" * 4,
    }


def _run(spark, cases):
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = png_exif_orientation(df.select("name", F.unhex("hx").alias("bytes")))
    return {r.name: r for r in out.collect()}


def test_png_exif_pins(spark):
    got = _run(spark, _cases())
    assert (got["le_o6"].orientation, got["le_o6"].swap_dims) == (6, True)
    assert (got["be_o8"].orientation, got["be_o8"].swap_dims) == (8, True)
    assert (got["le_o1_behind_gama"].orientation,
            got["le_o1_behind_gama"].swap_dims) == (1, False)
    for n in ("bad_range", "no_exif", "jpeg"):
        assert (got[n].orientation, got[n].swap_dims) == (None, None)


def test_png_exif_duckdb_replay(spark):
    cases = _cases()
    spark_pdf = (
        png_exif_orientation(
            spark.createDataFrame(list(cases.items()), "name string, hx string")
            .select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "orientation", "swap_dims")
        .toPandas().sort_values("name").reset_index(drop=True))
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(png_exif_orientation_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
