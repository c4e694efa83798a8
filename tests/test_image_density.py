"""Physical density extraction: JFIF dpi/dpcm/aspect pins, PNG pHYs
metric + aspect pins, EXIF-first JPEG exclusion, density-less rows,
integer half-up inch conversion, and the DuckDB replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    image_density,
    image_density_sql,
    sniff_case_sql,
)

SIG = "89504E470D0A1A0A"


def _chunk(ctype: bytes, data: bytes) -> str:
    return (f"{len(data):08X}" + ctype.hex().upper()
            + data.hex().upper() + "00000000")


IHDR = _chunk(b"IHDR", bytes.fromhex("00000010" "00000010") + bytes([8, 6, 0, 0, 0]))
IDAT0 = _chunk(b"IDAT", b"\x00")


def _jfif(unit: int, dx: int, dy: int) -> str:
    return ("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101"
            + f"{unit:02X}" + f"{dx:04X}" + f"{dy:04X}" + "0000")


def _phys(dx: int, dy: int, unit: int) -> str:
    return _chunk(b"pHYs", dx.to_bytes(4, "big") + dy.to_bytes(4, "big")
                  + bytes([unit]))


CASES = {
    "jfif_dpi": _jfif(1, 72, 72),
    "jfif_dpcm": _jfif(2, 28, 28),
    "jfif_aspect": _jfif(0, 1, 1),
    "exif_first": "FFD8FFE1002E457869660000" + "00" * 20,
    "png_meter": SIG + IHDR + _phys(2835, 2835, 1) + IDAT0,
    "png_aspect": SIG + IHDR + _phys(4, 3, 0) + IDAT0,
    "png_plain": SIG + IHDR + IDAT0,
    "gif": "474946383961" + "00" * 8,
}


def _run(spark):
    df = spark.createDataFrame(list(CASES.items()), "name string, hx string")
    out = image_density(df.select("name", F.unhex("hx").alias("bytes")))
    return {r.name: r for r in out.collect()}


def test_density_pins(spark):
    got = _run(spark)
    r = got["jfif_dpi"]
    assert (r.density_unit, r.density_x, r.dpi_x, r.dpi_y) == ("dpi", 72, 72, 72)
    r = got["jfif_dpcm"]
    assert (r.density_unit, r.density_x, r.dpi_x) == ("dpcm", 28, 71)
    r = got["jfif_aspect"]
    assert (r.density_unit, r.density_x, r.dpi_x) == ("aspect", 1, None)
    r = got["exif_first"]  # EXIF density belongs to the IFD family
    assert (r.density_unit, r.density_x, r.dpi_x) == (None, None, None)
    r = got["png_meter"]
    assert (r.density_unit, r.density_x, r.dpi_x) == ("per_meter", 2835, 72)
    r = got["png_aspect"]
    assert (r.density_unit, r.density_x, r.dpi_x) == ("aspect", 4, None)
    for name in ("png_plain", "gif"):
        r = got[name]
        assert (r.density_unit, r.density_x, r.dpi_x) == (None, None, None)


def test_density_duckdb_replay(spark):
    spark_pdf = (
        image_density(
            spark.createDataFrame(list(CASES.items()), "name string, hx string")
            .select("name", F.unhex("hx").alias("bytes"))
        )
        .select("name", "fmt", "density_unit", "density_x", "density_y",
                "dpi_x", "dpi_y")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(CASES.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(image_density_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
