"""ICC profile header parsing (operators/sniff.icc_profile)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    icc_profile,
    icc_profile_sql,
    sniff_case_sql,
)

_SOI = "FFD8"
_ICC_SIG = "4943435F50524F46494C4500"  # ICC_PROFILE\0


def _profile(size=200, cls="6D6E7472", cs="52474220", acsp=True, intent=0):
    """128-byte ICC header (body truncated — header-only reads)."""
    h = f"{size:08X}"            # 0: size
    h += "00" * 4                # 4: CMM
    h += "04400000"              # 8: version 4.4
    h += cls                     # 12: device class
    h += cs                      # 16: data colour space
    h += "58595A20"              # 20: PCS 'XYZ '
    h += "00" * 12               # 24: datetime
    h += "61637370" if acsp else "DEADBEEF"  # 36: magic
    h += "00" * 24               # 40..63
    h += f"{intent:08X}"         # 64: rendering intent
    h += "00" * 60               # pad to 128
    return h


def _app2(profile_hex, seq=1, total=1):
    payload = _ICC_SIG + f"{seq:02X}{total:02X}" + profile_hex
    length = len(payload) // 2 + 2
    return "FFE2" + f"{length:04X}" + payload


def _app1_exif():
    payload = "457869660000" + "49492A0008000000" + "0000"
    return "FFE1" + f"{len(payload) // 2 + 2:04X}" + payload


def _app0():
    payload = "4A46494600010100000100010000"
    return "FFE0" + f"{len(payload) // 2 + 2:04X}" + payload


def _cases():
    return {
        "srgb": _SOI + _app0() + _app2(_profile()),
        "cmyk_out": _SOI + _app2(_profile(cls="70727472", cs="434D594B",
                                          intent=1, size=544)),
        # walk must hop APP0 + an EXIF APP1 before the ICC APP2
        "behind_exif": _SOI + _app0() + _app1_exif()
                       + _app2(_profile(intent=3)),
        # bad magic: found but not trusted
        "bad_acsp": _SOI + _app2(_profile(acsp=False)),
        # off-table signatures -> 'other'; intent 7 -> 'other'
        "exotic": _SOI + _app2(_profile(cls="AAAAAAAA", cs="BBBBBBBB",
                                        intent=7)),
        "no_icc": _SOI + _app0() + "FFDB000401" + "00",
        "png": "89504E470D0A1A0A" + "00" * 8,
    }


def test_icc_profile_pins(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.fmt, r.has_icc, r.icc_size, r.icc_class,
                 r.icc_colorspace, r.icc_intent)
        for r in icc_profile(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["srgb"] == ("jpeg", True, 200, "display", "rgb", "perceptual")
    assert got["cmyk_out"] == ("jpeg", True, 544, "output", "cmyk", "relative")
    assert got["behind_exif"] == ("jpeg", True, 200, "display", "rgb",
                                  "absolute")
    assert got["bad_acsp"] == ("jpeg", True, None, None, None, None)
    assert got["exotic"] == ("jpeg", True, 200, "other", "other", "other")
    assert got["no_icc"] == ("jpeg", False, None, None, None, None)
    assert got["png"] == ("png", None, None, None, None, None)


def test_icc_profile_duckdb_replay(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        icc_profile(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "has_icc", "icc_size", "icc_class",
                "icc_colorspace", "icc_intent")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(icc_profile_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
