"""XMP rights/license extraction (operators/sniff.xmp_license)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    sniff_case_sql,
    xmp_license,
    xmp_license_sql,
)

_SOI = "FFD8"
_APP0 = "FFE0" + "0010" + "4A46494600010100000100010000"
_XMP_NS = "http://ns.adobe.com/xap/1.0/\x00"


def _xmp_app1(xml):
    payload = (_XMP_NS + xml).encode()
    return "FFE1" + f"{len(payload) + 2:04X}" + payload.hex().upper()


_CC_XML = ('<x:xmpmeta><rdf:RDF><rdf:Description '
           'xmpRights:Marked="True" '
           'xmpRights:WebStatement="https://creativecommons.org/licenses/by/4.0/">'
           "<dc:rights><rdf:Alt><rdf:li xml:lang='x-default'>"
           "(c) Jane Doe</rdf:li></rdf:Alt></dc:rights>"
           "</rdf:Description></rdf:RDF></x:xmpmeta>")
_ELEM_XML = ("<rdf:Description><xmpRights:Marked>False</xmpRights:Marked>"
             "</rdf:Description>")
_BARE_XML = "<x:xmpmeta><rdf:RDF/></x:xmpmeta>"


def _cases():
    return {
        "cc": _SOI + _APP0 + _xmp_app1(_CC_XML) + "FFDB0006" + "0001020304",
        "elem": _SOI + _xmp_app1(_ELEM_XML),
        "bare": _SOI + _xmp_app1(_BARE_XML),
        "no_xmp": _SOI + _APP0,
        "png": "89504E470D0A1A0A" + "00" * 8,
    }


def test_xmp_license_pins(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {r.name: (r.fmt, r.has_xmp, r.xmp_marked, r.license_url, r.rights)
           for r in xmp_license(
               df.select("name", F.unhex("hx").alias("bytes"))).collect()}
    assert got["cc"] == ("jpeg", True, True,
                         "https://creativecommons.org/licenses/by/4.0/",
                         "(c) Jane Doe")
    # element spelling of the Marked flag
    assert got["elem"] == ("jpeg", True, False, None, None)
    # packet without rights fields: found, nothing asserted
    assert got["bare"] == ("jpeg", True, None, None, None)
    assert got["no_xmp"] == ("jpeg", False, None, None, None)
    assert got["png"] == ("png", None, None, None, None)


def test_xmp_license_duckdb_replay(spark):
    cases = _cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        xmp_license(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "has_xmp", "xmp_marked", "license_url", "rights")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(xmp_license_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
