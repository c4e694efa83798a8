"""Payload completeness: trailer-byte + RIFF declared-size checks
(operators/sniff.payload_complete)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    payload_complete,
    payload_complete_sql,
    sniff_case_sql,
)

_PNG_MAGIC = "89504E470D0A1A0A"
_IEND = "0000000049454E44AE426082"  # length-0 + 'IEND' + fixed CRC


def _chunk(ctype, data_hex):
    return f"{len(data_hex) // 2:08X}" + ctype.encode().hex().upper() + data_hex + "00000000"


def _riff(form, payload_hex, declared=None):
    """RIFF container: declared size defaults to the true size-8."""
    body = form.encode().hex().upper() + payload_hex
    size = declared if declared is not None else len(body) // 2
    le = "".join(f"{(size >> (8 * i)) & 0xFF:02X}" for i in range(4))
    return "52494646" + le + body


def _cases():
    jfif = "FFD8FFE000104A46494600010100000100010000" + "AB" * 8
    return {
        "jpeg_ok": jfif + "FFD9",
        "jpeg_cut": jfif,                         # no EOI
        "png_ok": _PNG_MAGIC + _chunk("IHDR", "00" * 13)
                  + _chunk("IDAT", "AB" * 4) + _IEND,
        "png_cut": _PNG_MAGIC + _chunk("IHDR", "00" * 13)
                   + _chunk("IDAT", "AB" * 4),    # ends after IDAT CRC
        "gif_ok": "474946383961" + "1000" + "1000" + "00" * 6 + "3B",
        "gif_cut": "474946383961" + "1000" + "1000" + "00" * 6,
        "webp_ok": _riff("WEBP", "AB" * 10),
        "webp_cut": _riff("WEBP", "AB" * 10, declared=64),  # declares more
        "bmp": "424D" + "00" * 20,                # no trailer convention
        "tiny": "FF",                             # shorter than any trailer
    }


def test_payload_complete_pins(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.fmt, r.trailer_ok, r.truncated)
        for r in payload_complete(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["jpeg_ok"] == ("jpeg", True, False)
    assert got["jpeg_cut"] == ("jpeg", False, True)
    assert got["png_ok"] == ("png", True, False)
    assert got["png_cut"] == ("png", False, True)
    assert got["gif_ok"] == ("gif", True, False)
    assert got["gif_cut"] == ("gif", False, True)
    assert got["webp_ok"] == ("webp", True, False)
    assert got["webp_cut"] == ("webp", False, True)
    # no convention -> NULL, never false-positive truncation
    assert got["bmp"] == ("bmp", None, None)
    assert got["tiny"][1:] == (None, None)


def test_payload_bytes_exact(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: r.payload_bytes
        for r in payload_complete(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    for name, hx in cases.items():
        assert got[name] == len(hx) // 2


def test_payload_complete_duckdb_replay(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        payload_complete(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "payload_bytes", "trailer_ok", "truncated")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(payload_complete_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_payload_admission_precedence(spark):
    """Composed verdict precedence: truncation outranks mismatch,
    mismatch outranks bomb, NULL declared skips the mismatch tier."""
    from pyspark.sql import functions as F2
    from dblp_crawler_spark.operators.sniff import payload_admission

    jfif = "FFD8FFE000104A46494600010100000100010000" + "AB" * 8
    png_bomb = ("89504E470D0A1A0A"
                + _chunk("IHDR", "00007530" * 2 + "0806000000")
                + _chunk("IDAT", "AB" * 4) + _IEND)
    rows = [
        # truncated AND mismatched: truncated wins
        ("t_over_m", jfif, "png"),
        # complete but mismatched AND a bomb: mismatch wins
        ("m_over_b", png_bomb, "gif"),
        # same bytes, declared correctly: bomb
        ("bomb", png_bomb, "png"),
        # same bytes, declared NULL: mismatch tier skipped -> bomb
        ("null_decl", png_bomb, None),
        ("notimage", "1F8B08000000", "gzip"),
    ]
    df = spark.createDataFrame(rows, "name string, hx string, declared string")
    got = {r.name: r.verdict for r in payload_admission(
        df.select("name", F2.unhex("hx").alias("bytes"), "declared"),
        declared_col="declared").collect()}
    assert got == {"t_over_m": "truncated", "m_over_b": "mismatch",
                   "bomb": "bomb", "null_decl": "bomb",
                   "notimage": "notimage"}
