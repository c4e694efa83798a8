"""WebP ANIM/ANMF animation walk (operators/sniff.webp_animation)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    sniff_case_sql,
    webp_animation,
    webp_animation_sql,
)


def _le32(n):
    return "".join(f"{(n >> (8 * i)) & 0xFF:02X}" for i in range(4))


def _chunk(fourcc, payload_hex):
    size = len(payload_hex) // 2
    pad = "00" if size % 2 else ""
    return fourcc.encode().hex().upper() + _le32(size) + payload_hex + pad


def _riff(body_hex):
    return "52494646" + _le32(len(body_hex) // 2 + 4) + "57454250" + body_hex


_VP8X_ANIM = _chunk("VP8X", "02" + "000000" + "0F0000" + "0F0000")
_VP8X_STILL = _chunk("VP8X", "00" + "000000" + "0F0000" + "0F0000")


def _anim(loop):
    return _chunk("ANIM", "00000000" + f"{loop & 0xFF:02X}{loop >> 8:02X}")


_ANMF = _chunk("ANMF", "AB" * 16)
#: odd-sized chunk before ANIM: the pad byte must be hopped
_ODD = _chunk("ICCP", "CD" * 7)


def _cases():
    return {
        "lossy_still": _riff(_chunk("VP8 ", "9D012A" + "00" * 8)),
        "anim_loop0": _riff(_VP8X_ANIM + _anim(0) + _ANMF + _ANMF + _ANMF),
        "anim_loop5": _riff(_VP8X_ANIM + _anim(5) + _ANMF + _ANMF),
        # odd-payload chunk before ANIM: even-pad hop must land exactly
        "padded": _riff(_VP8X_ANIM + _ODD + _anim(3) + _ANMF),
        # extended but still: VP8X without ANIM
        "vp8x_still": _riff(_VP8X_STILL + _chunk("VP8 ", "9D012A" + "00" * 8)),
        "gif": "474946383961" + "1000" + "1000",
    }


def test_webp_animation_pins(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.fmt, r.is_animated, r.loop_count, r.n_frames_lb)
        for r in webp_animation(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["lossy_still"] == ("webp", False, None, None)
    assert got["anim_loop0"] == ("webp", True, 0, 3)
    assert got["anim_loop5"] == ("webp", True, 5, 2)
    assert got["padded"] == ("webp", True, 3, 1)
    assert got["vp8x_still"] == ("webp", False, None, None)
    assert got["gif"] == ("gif", None, None, None)


def test_webp_animation_duckdb_replay(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        webp_animation(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "is_animated", "loop_count", "n_frames_lb")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(webp_animation_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
