"""zstd frame header + parquet file audit tiers (operators/sniff)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    parquet_structure,
    parquet_structure_sql,
    sniff_case_sql,
    zstd_structure,
    zstd_structure_sql,
)

_ZMAGIC = "28B52FFD"


def _zstd_cases():
    return {
        # fhd 0x00: fcs 0, no ss, no cksum, no dict → window desc 0x58
        # (exp 11 → log 21); content size undeclared
        "plain": _ZMAGIC + "00" + "58" + "AA" * 4,
        # fhd 0x20: single-segment, fcs flag 0 → 1-byte size 200
        "ss_small": _ZMAGIC + "20" + "C8" + "AA" * 4,
        # fhd 0x45: fcs 1 (2B, +256), cksum, dict flag 1 (1B id 7)
        # window 0x00 → log 10; fcs raw 0x0102=258 → 514
        "dict_cksum": _ZMAGIC + "45" + "00" + "07" + "0201" + "AA" * 2,
        # fhd 0x80: fcs 2 → 4-byte size 70000 (0x11170)
        "big": _ZMAGIC + "80" + "10" + "70110100" + "AA" * 2,
        "png": "89504E470D0A1A0A" + "00" * 4,
    }


def test_zstd_structure_pins(spark):
    cases = _zstd_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.fmt, r.single_segment, r.has_checksum, r.window_log,
                 r.dict_id, r.content_size)
        for r in zstd_structure(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["plain"] == ("zstd", False, False, 21, None, None)
    assert got["ss_small"] == ("zstd", True, False, None, None, 200)
    assert got["dict_cksum"] == ("zstd", False, True, 10, 7, 514)
    assert got["big"] == ("zstd", False, False, 12, None, 70000)
    assert got["png"] == ("png", None, None, None, None, None)


def test_zstd_structure_duckdb_replay(spark):
    cases = _zstd_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        zstd_structure(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "single_segment", "has_checksum",
                "window_log", "dict_id", "content_size")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(zstd_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def _pq_cases():
    # 96-byte file, declared footer 40 → complete
    good = "50415231" + "BB" * 84 + "28000000" + "50415231"
    torn = "50415231" + "BB" * 40                     # no tail magic
    # footer claims more bytes than the file holds
    bloat = "50415231" + "BB" * 8 + "FF000000" + "50415231"
    return {"good": good, "torn": torn, "bloat": bloat,
            "png": "89504E470D0A1A0A" + "00" * 4}


def test_parquet_structure_pins(spark):
    cases = _pq_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.fmt, r.file_bytes, r.tail_magic_ok, r.footer_bytes,
                 r.complete)
        for r in parquet_structure(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["good"] == ("parquet", 96, True, 40, True)
    assert got["torn"] == ("parquet", 44, False, None, False)
    assert got["bloat"] == ("parquet", 20, True, 255, False)
    assert got["png"][0] == "png" and got["png"][2] is None


def test_parquet_structure_duckdb_replay(spark):
    cases = _pq_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        parquet_structure(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "file_bytes", "tail_magic_ok",
                "footer_bytes", "complete")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(parquet_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


# ---- zip EOCD ---------------------------------------------------------------

def _zip_cases():
    import io
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("a.txt", "hello world")
        z.writestr("sub/b.bin", b"\x00" * 64)
    real = buf.getvalue()
    # comment CONTAINING the EOCD signature — the aligned
    # longest-prefix pick must still find the real (last) record
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as z:
        z.writestr("x", "y")
        z.comment = b"PK\x05\x06 fake"
    tricky = buf2.getvalue()
    return {
        "real": real.hex().upper(),
        "tricky": tricky.hex().upper(),
        "trunc": real[: len(real) // 2].hex().upper(),
        "png": "89504E470D0A1A0A" + "00" * 4,
    }, real


def test_zip_structure_pins(spark):
    from dblp_crawler_spark.operators.sniff import zip_structure
    cases, real = _zip_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.fmt, r.has_eocd, r.n_entries, r.cd_offset, r.cd_bytes,
                 r.complete)
        for r in zip_structure(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    # pin against the stdlib's own EOCD numbers
    import struct
    eocd_at = real.rindex(b"PK\x05\x06")
    n, cdsz, cdoff = struct.unpack("<H", real[eocd_at + 10:eocd_at + 12])[0], \
        struct.unpack("<I", real[eocd_at + 12:eocd_at + 16])[0], \
        struct.unpack("<I", real[eocd_at + 16:eocd_at + 20])[0]
    assert got["real"] == ("zip", True, n, cdoff, cdsz, True)
    assert n == 2
    assert got["tricky"][1] and got["tricky"][2] == 1 and got["tricky"][5]
    assert got["trunc"][1] is False
    assert got["png"][0] == "png" and got["png"][1] is None


def test_zip_structure_duckdb_replay(spark):
    from dblp_crawler_spark.operators.sniff import zip_structure_sql
    from dblp_crawler_spark.operators.sniff import zip_structure
    cases, _ = _zip_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        zip_structure(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "file_bytes", "has_eocd", "n_entries",
                "cd_offset", "cd_bytes", "complete")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(zip_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
