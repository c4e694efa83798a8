"""EXIF strip byte surgery (operators/sniff.exif_strip)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    exif_orientation,
    exif_strip,
    exif_strip_sql,
    sniff_case_sql,
)

_SOI = "FFD8"
_APP0 = "FFE0" + "0010" + "4A46494600010100000100010000"
_DQT = "FFDB" + "0006" + "0001020304"


def _app1_exif(orientation=6):
    """Minimal Exif APP1: II header, one-entry IFD0 with 0x0112."""
    ifd = ("49492A00" + "08000000" + "0100"
           + "1201" + "0300" + "01000000" + f"{orientation:02X}000000"
           + "00000000")
    payload = "457869660000" + ifd
    return "FFE1" + f"{len(payload) // 2 + 2:04X}" + payload


def _cases():
    return {
        "with_exif": _SOI + _APP0 + _app1_exif() + _DQT,
        "exif_first": _SOI + _app1_exif(3) + _APP0 + _DQT,
        "no_exif": _SOI + _APP0 + _DQT,
        # APP1 whose declared length runs past the payload: detected
        # but NOT removable — payload must come back untouched
        "trunc_len": _SOI + "FFE1" + "0FFF" + "457869660000" + "AA" * 4,
        "png": "89504E470D0A1A0A" + "00" * 8,
    }


def test_exif_strip_pins(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = exif_strip(df.select("name", F.unhex("hx").alias("bytes")))
    got = {r.name: (r.fmt, r.had_exif, r.removed_bytes,
                    bytes(r.stripped).hex().upper())
           for r in out.collect()}
    app1 = _app1_exif()
    seg = len(app1) // 2
    assert got["with_exif"] == ("jpeg", True, seg, _SOI + _APP0 + _DQT)
    assert got["exif_first"][1:] == (True, len(_app1_exif(3)) // 2,
                                     _SOI + _APP0 + _DQT)
    assert got["no_exif"] == ("jpeg", False, None, cases["no_exif"])
    assert got["trunc_len"] == ("jpeg", True, None, cases["trunc_len"])
    assert got["png"] == ("png", False, None, cases["png"])


def test_exif_strip_removes_orientation(spark):
    """End-to-end: the stripped payload no longer carries EXIF — the
    orientation reader returns NULL on it while finding 6 before."""
    cases = {"x": _cases()["with_exif"]}
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    imgs = df.select("name", F.unhex("hx").alias("bytes"))
    before = exif_orientation(imgs).collect()[0]
    assert before.orientation == 6
    stripped = exif_strip(imgs).select(
        "name", F.col("stripped").alias("bytes"))
    after = exif_orientation(stripped).collect()[0]
    assert after.fmt == "jpeg" and after.orientation is None


def test_exif_strip_duckdb_replay(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = exif_strip(df.select("name", F.unhex("hx").alias("bytes")))
    spark_pdf = out.select(
        "name", "fmt", "had_exif", "removed_bytes",
        F.hex(F.col("stripped")).alias("stripped_hex"),
    ).toPandas().sort_values("name").reset_index(drop=True)
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (con.sql(exif_strip_sql(staged, keep="name")).df()
                .sort_values("name").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
