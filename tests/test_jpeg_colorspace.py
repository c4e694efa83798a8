"""JPEG colorspace routing (operators/sniff.jpeg_colorspace)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    jpeg_colorspace,
    jpeg_colorspace_sql,
    sniff_case_sql,
)


def _seg(marker, payload):
    ln = len(payload) // 2 + 2
    return marker + f"{ln:04X}" + payload


def _sof(ncomp, marker="FFC0"):
    comps = "".join(
        f"{i + 1:02X}" + ("22" if i == 0 else "11") + "00"
        for i in range(ncomp)
    )
    return _seg(marker, "08" + "0010" + "0010" + f"{ncomp:02X}" + comps)


def _adobe(tr):
    return _seg("FFEE", "41646F6265" + "0064" + "0000" + "0000" + f"{tr:02X}")


_APP0 = _seg("FFE0", "4A46494600010100000100010000")
_ICC = _seg("FFE2", "4943435F50524F46494C4500" + "0101" + "00" * 16)
_SOS = _seg("FFDA", "01" + "010000")


def _cases():
    return {
        "jfif3": "FFD8" + _APP0 + _sof(3) + _SOS,
        "adobe_rgb": "FFD8" + _APP0 + _adobe(0) + _sof(3) + _SOS,
        "adobe_ycbcr": "FFD8" + _adobe(1) + _sof(3) + _SOS,
        "ycck": "FFD8" + _adobe(2) + _sof(4) + _SOS,
        "cmyk": "FFD8" + _APP0 + _sof(4) + _SOS,
        "icc": "FFD8" + _APP0 + _ICC + _sof(3) + _SOS,
        "icc_cmyk": "FFD8" + _ICC + _adobe(2) + _sof(4) + _SOS,
        "gray": "FFD8" + _sof(1) + _SOS,
        "progressive3": "FFD8" + _APP0 + _sof(3, marker="FFC2") + _SOS,
        "png": "89504E470D0A1A0A" + "0000000D49484452",
        "trunc": "FFD8FF",
        # APP14 whose payload is NOT 'Adobe' — transform must not count
        "fake14": "FFD8" + _seg("FFEE", "58585858580064000000000002")
                  + _sof(4) + _SOS,
        # APP2 that is NOT an ICC segment
        "app2_noicc": "FFD8" + _seg("FFE2", "00" * 14) + _sof(3) + _SOS,
    }


def test_jpeg_colorspace_pins(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.fmt, r.n_components, r.adobe_transform, r.has_icc,
                 r.colorspace, r.cmyk_risk)
        for r in jpeg_colorspace(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["jfif3"] == ("jpeg", 3, None, False, "ycbcr", False)
    assert got["adobe_rgb"] == ("jpeg", 3, 0, False, "rgb", False)
    assert got["adobe_ycbcr"] == ("jpeg", 3, 1, False, "ycbcr", False)
    assert got["ycck"] == ("jpeg", 4, 2, False, "ycck", True)
    assert got["cmyk"] == ("jpeg", 4, None, False, "cmyk", True)
    assert got["icc"] == ("jpeg", 3, None, True, "ycbcr", False)
    assert got["icc_cmyk"] == ("jpeg", 4, 2, True, "ycck", True)
    assert got["gray"] == ("jpeg", 1, None, False, "gray", False)
    # progressive SOF2 is still an SOF for component purposes
    assert got["progressive3"] == ("jpeg", 3, None, False, "ycbcr", False)
    assert got["png"] == ("png", None, None, None, None, None)
    assert got["trunc"] == ("jpeg", None, None, False, None, None)
    # foreign APP14 payload carries no Adobe transform
    assert got["fake14"] == ("jpeg", 4, None, False, "cmyk", True)
    assert got["app2_noicc"] == ("jpeg", 3, None, False, "ycbcr", False)


def test_jpeg_colorspace_duckdb_replay(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        jpeg_colorspace(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "n_components", "adobe_transform", "has_icc",
                "colorspace", "cmyk_risk")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(jpeg_colorspace_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
