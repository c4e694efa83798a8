"""Magic-byte content sniffing (operators/sniff.py)."""

from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    content_type_mismatch,
    sniff_content_type,
)


def _payloads(spark, rows):
    return spark.createDataFrame(rows, "image_id string, bytes binary")


def test_sniff_known_magics(spark):
    cases = {
        "png": bytes.fromhex("89504E470D0A1A0A") + b"rest",
        "gif87": b"GIF87a" + b"x" * 4,
        "gif89": b"GIF89a" + b"x" * 4,
        "jpeg": bytes.fromhex("FFD8FFE000104A46") + b"IF",
        "webp": b"RIFF\x10\x00\x00\x00WEBPVP8 ",
        "wav": b"RIFF\x10\x00\x00\x00WAVEfmt ",
        "avi": b"RIFF\x10\x00\x00\x00AVI LIST",
        "pdf": b"%PDF-1.7\n",
        "gzip": bytes.fromhex("1F8B08") + b"x",
        "zip": b"PK\x03\x04rest",
        "mp3": b"ID3\x04tag",
        "mp4": bytes.fromhex("00000018") + b"ftypisom",
        "bmp": b"BM1234",
    }
    df = _payloads(spark, list(cases.items()))
    got = {r.image_id: r.sniffed for r in sniff_content_type(df).collect()}
    want = {k: ("gif" if k.startswith("gif") else k) for k in cases}
    assert got == want


def test_sniff_unknown_short_null(spark):
    rows = [("junk", b"\x00\x01\x02\x03junkjunk"),
            ("short", b"\x89P"),          # PNG magic truncated → no match
            ("riff_only", b"RIFF\x10\x00\x00\x00XXXX"),  # unknown form type
            ("empty", b"")]
    df = _payloads(spark, rows).unionByName(
        _payloads(spark, [("isnull", None)])
    )
    got = {r.image_id: r.sniffed for r in sniff_content_type(df).collect()}
    assert set(got.values()) == {"octet-stream"}


def test_mismatch_flag(spark):
    rows = [("a", bytes.fromhex("FFD8FFE0") + b"tail", "jpeg"),
            ("b", bytes.fromhex("FFD8FFE0") + b"tail", "png"),  # spoofed
            ("c", b"%PDF-1.4", "pdf")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r.image_id: (r.sniffed, r.mismatch)
           for r in content_type_mismatch(df).collect()}
    assert got == {"a": ("jpeg", False), "b": ("jpeg", True), "c": ("pdf", False)}


def test_sniff_is_projection_no_shuffle(spark):
    df = _payloads(spark, [("a", b"%PDF-1.4")])
    plan = sniff_content_type(df)._sc._jvm.PythonSQLUtils.explainString(
        sniff_content_type(df)._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan  # map-side only
    # no UDF: pure JVM expressions (createDataFrame's
    # applySchemaToPythonRDD is a local-fixture artifact, not an eval)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
