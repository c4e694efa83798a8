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


# ---- EXIF camera model ------------------------------------------------------------

def _model_app1(model: str, le=True, inline=False):
    """Exif APP1 with a Model (0x0110) entry, LE or BE, inline or
    offset-stored. Offset values land right after the IFD."""
    val = model.encode() + b"\x00"
    cnt = len(val)
    if le:
        ent_prefix = "1001" + "0200" + "".join(
            f"{(cnt >> (8 * i)) & 0xFF:02X}" for i in range(4))
    else:
        ent_prefix = "0110" + "0002" + f"{cnt:08X}"
    if inline:
        assert cnt <= 4
        v = val.hex().upper().ljust(8, "0")
        ifd_tail = "00000000"
        extra = ""
    else:
        # one 12-byte entry: value offset = 8 (hdr) + 2 + 12 + 4
        off = 8 + 2 + 12 + 4
        v = ("".join(f"{(off >> (8 * i)) & 0xFF:02X}" for i in range(4))
             if le else f"{off:08X}")
        ifd_tail = "00000000"
        extra = val.hex().upper()
    hdr = "49492A00" + "08000000" + "0100" if le else "4D4D002A" + "00000008" + "0001"
    payload = "457869660000" + hdr + ent_prefix + v + ifd_tail + extra
    return "FFE1" + f"{len(payload) // 2 + 2:04X}" + payload


def test_exif_camera_model_pins(spark):
    from pyspark.sql import functions as F2
    from dblp_crawler_spark.operators.sniff import exif_camera_model

    cases = {
        "le_offset": "FFD8" + _model_app1("Canon EOS R5", le=True),
        "be_offset": "FFD8" + _model_app1("NIKON Z9", le=False),
        "le_inline": "FFD8" + _model_app1("X1", le=True, inline=True),
        "no_exif": "FFD8" + _APP0,
        "png": "89504E470D0A1A0A" + "00" * 8,
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {r.name: r.camera_model for r in exif_camera_model(
        df.select("name", F2.unhex("hx").alias("bytes"))).collect()}
    assert got["le_offset"] == "Canon EOS R5"
    assert got["be_offset"] == "NIKON Z9"
    assert got["le_inline"] == "X1"
    assert got["no_exif"] is None
    assert got["png"] is None


def test_exif_camera_model_duckdb_replay(spark):
    from pyspark.sql import functions as F2
    from dblp_crawler_spark.operators.sniff import (
        exif_camera_model,
        exif_camera_model_sql,
    )

    cases = {
        "le": "FFD8" + _model_app1("Canon EOS R5", le=True),
        "be": "FFD8" + _model_app1("NIKON Z9", le=False),
        "inl": "FFD8" + _model_app1("X1", le=True, inline=True),
        "none": "FFD8" + _APP0,
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (exif_camera_model(
        df.select("name", F2.unhex("hx").alias("bytes")))
        .select("name", "fmt", "camera_model")
        .toPandas().sort_values("name").reset_index(drop=True))
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (con.sql(exif_camera_model_sql(staged, keep="name")).df()
                .sort_values("name").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
