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


# ---- header-only image dimensions ------------------------------------------
import struct

from dblp_crawler_spark.operators.sniff import image_dims, image_dims_sql


def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x06" + b"\x00" * 40)


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00" + b"\x00" * 40


def _bmp(w, h):
    return (b"BM" + struct.pack("<I", 100) + b"\x00" * 4 + struct.pack("<I", 54)
            + struct.pack("<I", 40) + struct.pack("<ii", w, h) + b"\x00" * 30)


def _jpeg(w, h, n_app=1):
    b = b"\xff\xd8"
    for i in range(n_app):
        payload = b"JFIF\x00" + bytes(5 + i)
        b += b"\xff\xe0" + struct.pack(">H", 2 + len(payload)) + payload
    return (b + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 20)


def test_image_dims_real_headers_and_duckdb_parity(spark):
    import duckdb

    rows = [(1, _png(640, 480)), (2, _gif(320, 200)), (3, _bmp(800, 600)),
            (4, _jpeg(1024, 768)), (5, _jpeg(99, 77, n_app=3)),
            (6, b"\x00\x01junk"), (7, None), (8, b"\xff\xd8\xff")]
    df = spark.createDataFrame(rows, "doc_id long, bytes binary")
    got = [(r.doc_id, r.fmt, r.width, r.height)
           for r in image_dims(df).select("doc_id", "fmt", "width", "height")
           .orderBy("doc_id").collect()]
    assert got[:5] == [(1, "png", 640, 480), (2, "gif", 320, 200),
                       (3, "bmp", 800, 600), (4, "jpeg", 1024, 768),
                       (5, "jpeg", 99, 77)]
    # unknown / NULL / truncated-jpeg all yield NULL dims
    assert [(g[2], g[3]) for g in got[5:]] == [(None, None)] * 3
    assert got[5][1] == "octet-stream" and got[7][1] == "jpeg"

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, bytes BLOB)")
    for i, b in rows:
        con.execute("INSERT INTO t VALUES (?, ?)", [i, b])
    fmt, w, h = image_dims_sql("h")
    ducks = [tuple(x) for x in con.sql(
        f"SELECT doc_id, {fmt} AS fmt, {w} AS width, {h} AS height "
        f"FROM (SELECT doc_id, substr(hex(bytes),1,128) AS h FROM t) ORDER BY doc_id"
    ).fetchall()]
    assert ducks == got


def test_image_dims_walk_depth_bound(spark):
    # more APP segments than JPEG_MAX_HOPS-1: SOF is out of reach —
    # NULL dims rather than garbage
    from dblp_crawler_spark.operators.sniff import JPEG_MAX_HOPS

    deep = _jpeg(50, 60, n_app=JPEG_MAX_HOPS)
    df = spark.createDataFrame([(1, deep)], "doc_id long, bytes binary")
    r = image_dims(df).collect()[0]
    assert r.fmt == "jpeg" and r.width is None and r.height is None


# ---- charset declaration ------------------------------------------------------

def test_bom_charset_ordering_and_values(spark):
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.sniff import bom_charset

    cases = {
        "utf8": ("EFBBBF3C68746D6C3E", "utf-8"),
        "utf16le": ("FFFE3C00", "utf-16le"),
        "utf16be": ("FEFF003C", "utf-16be"),
        "utf32le_trap": ("FFFE00003C000000", "utf-32le"),  # prefix of utf-16le!
        "utf32be": ("0000FEFF0000003C", "utf-32be"),
        "none": ("3C68746D6C3E", None),
    }
    df = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "name string, hx string"
    )
    got = {
        r.name: r.bom
        for r in df.select(
            "name", bom_charset(F.unhex("hx")).alias("bom")
        ).collect()
    }
    assert got == {k: v[1] for k, v in cases.items()}


def test_meta_charset_precedence_and_shapes(spark):
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.sniff import meta_charset

    cases = {
        '<meta charset="UTF-8">': "utf-8",
        "<meta charset='iso-8859-1'>": "iso-8859-1",
        "<meta charset=WINDOWS-1252 >": "windows-1252",
        '<meta http-equiv="Content-Type" content="text/html; charset=Big5">': "big5",
        "<?xml version='1.0' encoding='Shift_JIS'?>": "shift_jis",
        # meta beats xml decl when both present
        "<?xml encoding='a'?><meta charset=b>": "b",
        "<html>no declaration</html>": None,
    }
    df = spark.createDataFrame([(h,) for h in cases], "html string")
    got = {r.html: r.m for r in df.select("html", meta_charset("html").alias("m")).collect()}
    assert got == cases


def test_charset_decl_duckdb_replay(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.sniff import (
        bom_charset_sql,
        charset_decl,
        meta_charset_sql,
    )

    rows = [
        ("bom_and_meta", "EFBBBF48", '<meta charset="KOI8-R">x'),  # BOM wins
        ("meta_only", "48544D4C", "<meta charset=latin1>y"),
        ("neither", "48544D4C", "plain"),
        ("trap", "FFFE0000", "z"),
    ]
    df = spark.createDataFrame(rows, "name string, hx string, html string")
    spark_pdf = (
        charset_decl(df.select("name", F.unhex("hx").alias("bytes"), "html"))
        .select("name", "bom", "meta", "charset")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cs", pd.DataFrame(rows, columns=["name", "bh", "html"]))
    duck_pdf = (
        con.sql(f"""
            SELECT name, {bom_charset_sql('bh')} AS bom,
                   {meta_charset_sql('html')} AS meta,
                   COALESCE({bom_charset_sql('bh')}, {meta_charset_sql('html')}, 'utf-8') AS charset
            FROM cs
        """).df().sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


# ---- decompression-bomb gate ---------------------------------------------------

def test_bomb_gate_pins(spark):
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.sniff import image_bomb_gate

    png_pre = "89504E470D0A1A0A0000000D49484452"
    cases = {
        "honest": png_pre + "0000002800000032" + "0806000000",      # 40×50
        "oversized": png_pre + "0000753000007530" + "0806000000",   # 30000²
        "ratio_bomb": png_pre + "00000BB800000BB8" + "0806000000",  # 3000² in 33 B
        "garbage": "DEADBEEF00112233",
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.oversized, r.bomb_ratio, r.safe)
        for r in image_bomb_gate(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["honest"] == (False, False, True)
    assert got["oversized"] == (True, True, False)       # 9e8 px: both gates
    assert got["ratio_bomb"] == (False, True, False)     # under cap, over ratio
    assert got["garbage"] == (False, False, False)       # unknown dims ≠ safe


def test_bomb_gate_duckdb_replay(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.sniff import (
        image_bomb_gate,
        image_bomb_gate_sql,
    )

    png_pre = "89504E470D0A1A0A0000000D49484452"
    cases = {
        "a": png_pre + "0000002800000032" + "0806000000",
        "b": png_pre + "0000753000007530" + "0806000000",
        "c": "DEADBEEF00112233",
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        image_bomb_gate(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "width", "height", "pixels", "payload_bytes",
                "oversized", "bomb_ratio", "safe")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    duck_pdf = (
        con.sql(image_bomb_gate_sql("cases", keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


# ---- png structure --------------------------------------------------------------

def test_png_structure_pins_and_replay(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.sniff import (
        png_structure,
        png_structure_sql,
        sniff_case_sql,
    )

    pre = "89504E470D0A1A0A" + "0000000D49484452" + "0000004000000040"
    cases = {
        "rgba8": pre + "0806" + "0000" + "00",
        "palette8": pre + "0803" + "0000" + "00",
        "gray16_adam7": pre + "1000" + "0000" + "01",
        "rgb8": pre + "0802" + "0000" + "00",
        "gray_alpha": pre + "0804" + "0000" + "00",
        "weird_ctype": pre + "0805" + "0000" + "00",
        "jpeg": "FFD8FFE000104A464946",
        "truncated": "89504E470D0A1A0A0000000D494844",
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.bit_depth, r.color_type, r.interlaced, r.has_alpha)
        for r in png_structure(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["rgba8"] == (8, "rgba", False, True)
    assert got["palette8"] == (8, "palette", False, False)
    assert got["gray16_adam7"] == (16, "gray", True, False)
    assert got["rgb8"] == (8, "rgb", False, False)
    assert got["gray_alpha"] == (8, "gray-alpha", False, True)
    assert got["weird_ctype"][1] == "other"
    assert got["jpeg"] == (None, None, None, None)
    assert got["truncated"] == (None, None, None, None)  # IHDR cut short
    # replay
    spark_pdf = (
        png_structure(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "bit_depth", "color_type", "interlaced", "has_alpha")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(png_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_webp_structure_pins_and_replay(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.sniff import (
        sniff_case_sql,
        webp_structure,
        webp_structure_sql,
    )

    R = "52494646" + "24000000" + "57454250"
    cases = {
        # lossy 320x240 with scaling bits set in the upper 2 bits
        # (0x4140 → masked 320) — the & 0x3FFF must strip them
        "lossy_scaled": R + "56503820" + "10000000" + "000000"
                        + "9D012A" + "4041" + "F000",
        # lossy with a corrupt frame sync → variant known, dims NULL
        "lossy_badsync": R + "56503820" + "10000000" + "000000"
                         + "9D012B" + "4001" + "F000",
        # lossless 100x50 with the alpha bit (bits = 99 | 49<<14 | 1<<28)
        "lossless_alpha": R + "5650384C" + "0D000000" + "2F" + "63400C10",
        # lossless 16x1, no alpha (bits = 15)
        "lossless_tiny": R + "5650384C" + "0D000000" + "2F" + "0F000000",
        # extended, animated + alpha (flags 0x12), canvas 1024x768
        "vp8x_anim": R + "56503858" + "0A000000" + "12" + "000000"
                     + "FF0300" + "FF0200",
        # extended still, no alpha, 64x32
        "vp8x_still": R + "56503858" + "0A000000" + "00" + "000000"
                      + "3F0000" + "1F0000",
        # extended truncated before the flags byte → NULL structure
        "vp8x_cut": R + "56503858" + "0A000000",
        # RIFF/WEBP but the first chunk is not a VP8 form → NULL variant
        "alph_first": R + "414C5048" + "04000000" + "00000000",
        # bare RIFF/WEBP header only
        "riff_only": R,
        # non-webp
        "png": "89504E470D0A1A0A" + "0000000D49484452",
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.variant, r.width, r.height, r.has_alpha, r.is_animated)
        for r in webp_structure(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["lossy_scaled"] == ("lossy", 320, 240, False, False)
    assert got["lossy_badsync"] == ("lossy", None, None, False, False)
    assert got["lossless_alpha"] == ("lossless", 100, 50, True, False)
    assert got["lossless_tiny"] == ("lossless", 16, 1, False, False)
    assert got["vp8x_anim"] == ("extended", 1024, 768, True, True)
    assert got["vp8x_still"] == ("extended", 64, 32, False, False)
    assert got["vp8x_cut"] == ("extended", None, None, None, None)
    assert got["alph_first"] == (None, None, None, None, None)
    assert got["riff_only"] == (None, None, None, None, None)
    assert got["png"] == (None, None, None, None, None)
    # replay
    spark_pdf = (
        webp_structure(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "variant", "width", "height",
                "has_alpha", "is_animated")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(webp_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_gif_structure_pins_and_replay(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.sniff import (
        NETSCAPE_SIG_HEX,
        gif_structure,
        gif_structure_sql,
        sniff_case_sql,
    )

    gct4 = "FF0000" + "00FF00" + "0000FF" + "FFFFFF"
    hdr89 = "474946383961" + "0A00" + "0A00" + "A1" + "02" + "00"
    # 15 bytes whose hex spells the NETSCAPE signature starting at an
    # EVEN (misaligned) hex offset — a bare `contains` false-positives
    trap = "4" + NETSCAPE_SIG_HEX + "0"
    assert len(trap) % 2 == 0
    cases = {
        "static89": hdr89 + gct4 + "2C00000000" + "3B",
        "anim89": hdr89 + gct4 + NETSCAPE_SIG_HEX + "030100000000" + "3B",
        "gif87_nogct": "474946383761" + "0500" + "0500" + "00" + "00" + "00",
        # GCT=16 entries (packed 0x83), trap bytes inside the palette
        "misaligned": "474946383961" + "0A000A00" + "83" + "05" + "00"
                      + trap + "00" * 33,
        "truncated": "474946383961",
        "png": "89504E470D0A1A0A" + "0000000D49484452",
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.version, r.has_gct, r.palette_size, r.bg_index,
                 r.is_animated_hint)
        for r in gif_structure(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["static89"] == ("89a", True, 4, 2, False)
    assert got["anim89"] == ("89a", True, 4, 2, True)
    assert got["gif87_nogct"] == ("87a", False, 0, 0, False)
    assert got["misaligned"] == ("89a", True, 16, 5, False)
    assert got["truncated"] == ("89a", None, None, None, False)
    assert got["png"] == (None, None, None, None, None)
    # the trap WOULD fool a bare containment check
    assert NETSCAPE_SIG_HEX in cases["misaligned"]
    # replay
    spark_pdf = (
        gif_structure(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "version", "has_gct", "palette_size",
                "bg_index", "is_animated_hint")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(gif_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def _box(fourcc_hex, payload_hex):
    size = 8 + len(payload_hex) // 2
    return f"{size:08X}" + fourcc_hex + payload_hex


def test_isobmff_structure_pins_and_replay(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.sniff import (
        isobmff_structure,
        isobmff_structure_sql,
        sniff_case_sql,
    )

    def ftyp(brand_hex):
        return _box("66747970", brand_hex + "00000000" + brand_hex)

    ispe = _box("69737065", "00000000" + "00000280" + "000001E0")  # 640x480
    mvhd_v0 = _box("6D766864",
                   "00000000" + "00000000" + "00000000"
                   + "000003E8" + "00007530")                      # 30 s
    mvhd_v1 = _box("6D766864",
                   "01000000" + "00" * 8 + "00" * 8
                   + "000003E8" + "0000000000002EE0")              # 12 s
    mvhd_ts0 = _box("6D766864",
                    "00000000" + "00000000" + "00000000"
                    + "00000000" + "00007530")                     # ts = 0
    cases = {
        "avif": ftyp("61766966") + ispe,
        "heic": ftyp("68656963") + ispe,
        "mp4_v0": ftyp("6D703432") + mvhd_v0,
        "mp4_v1": ftyp("69736F6D") + mvhd_v1,
        "mp4_ts0": ftyp("6D703431") + mvhd_ts0,
        "unknown_brand": ftyp("58595A30"),
        # 'ispe' spelled at a misaligned offset inside opaque data
        "misaligned": ftyp("61766966") + _box(
            "6D646174", "4" + "69737065" + "0" + "00" * 11),
        "png": "89504E470D0A1A0A" + "0000000D49484452",
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = isobmff_structure(df.select("name", F.unhex("hx").alias("bytes")))
    got = {r.name: (r.brand, r.width, r.height, r.duration_sec)
           for r in out.collect()}
    assert got["avif"] == ("avif", 640, 480, None)
    assert got["heic"] == ("heic", 640, 480, None)
    assert got["mp4_v0"] == ("mp42", None, None, 30)
    assert got["mp4_v1"] == ("isom", None, None, 12)
    assert got["mp4_ts0"] == ("mp41", None, None, None)
    assert got["unknown_brand"] == ("other", None, None, None)
    assert got["misaligned"] == ("avif", None, None, None)
    assert got["png"] == (None, None, None, None)
    # replay
    spark_pdf = (
        out.select("name", "fmt", "brand", "width", "height", "duration_sec")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(isobmff_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_image_role_pins_and_replay(spark):
    import duckdb
    import pandas as pd

    from dblp_crawler_spark.operators.sniff import (
        image_role_classify,
        image_role_sql,
    )

    cases = [
        ("pix", 1, 1, "tracking_pixel"),
        ("pix2", 2, 2, "tracking_pixel"),
        ("icon", 32, 32, "icon"),
        ("icon_rect", 64, 40, "icon"),
        ("small_strip", 64, 10, "banner"),       # 64x10: icon aspect fails
        ("banner", 728, 90, "banner"),
        ("skyscraper", 120, 600, "banner"),
        ("thumb", 160, 120, "thumbnail"),
        ("photo", 1024, 768, "content"),
        ("tallish", 200, 390, "content"),        # < 4:1, > 160
        ("unknown", None, None, None),
    ]
    df = spark.createDataFrame(
        [(n, w, h) for n, w, h, _ in cases],
        "name string, width int, height int")
    got = {r.name: r.role for r in image_role_classify(df).collect()}
    for n, _, _, want in cases:
        assert got[n] == want, (n, got[n], want)
    con = duckdb.connect()
    con.register("c", pd.DataFrame(
        [(n, w, h) for n, w, h, _ in cases],
        columns=["name", "width", "height"]))
    duck = {r[0]: r[1] for r in con.sql(
        f"SELECT name, {image_role_sql()} FROM c").fetchall()}
    assert duck == got


def test_pdf_structure_pins_and_replay(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.sniff import (
        pdf_structure,
        pdf_structure_sql,
        sniff_case_sql,
    )

    def pdf(ver, body=b""):
        return (b"%PDF-" + ver.encode() + b"\n" + body).hex().upper()

    cases = {
        "v17": pdf("1.7"),
        "v14_lin": pdf("1.4", b"1 0 obj\n<< /Linearized 1 >>"),
        "v16_enc": pdf("1.6", b"trailer << /Encrypt 5 0 R >>"),
        "junk_ver": (b"%PDF-x.y\n").hex().upper(),
        "png": "89504E470D0A1A0A" + "0000000D49484452",
        # '/Linearized' bytes at a misaligned offset must not hint
        "misaligned": pdf("1.5") + "4" + "2F4C696E656172697A6564" + "0",
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = pdf_structure(df.select("name", F.unhex("hx").alias("bytes")))
    got = {r.name: (r.pdf_version, r.linearized_hint, r.encrypted_hint)
           for r in out.collect()}
    assert got["v17"] == ("1.7", False, False)
    assert got["v14_lin"] == ("1.4", True, False)
    assert got["v16_enc"] == ("1.6", False, True)
    assert got["junk_ver"] == (None, False, False)
    assert got["png"] == (None, None, None)
    assert got["misaligned"] == ("1.5", False, False)
    spark_pdf = (
        out.select("name", "fmt", "pdf_version", "linearized_hint",
                   "encrypted_hint")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(pdf_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_gzip_structure_pins_and_replay(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.sniff import (
        gzip_structure,
        gzip_structure_sql,
        sniff_case_sql,
    )

    def gz(flg, mtime, tail=b""):
        return ("1F8B08" + f"{flg:02X}"
                + mtime.to_bytes(4, "little").hex().upper()
                + "0003" + tail.hex().upper())

    cases = {
        "named": gz(0x08, 1700000000, b"dump.warc\x00payload"),
        "unnamed": gz(0x00, 1600000000, b"payload"),
        "zero_mtime": gz(0x08, 0, b"a.txt\x00x"),
        "fextra_blocks_name": gz(0x0C, 1500000000, b"\x02\x00XXa.txt\x00"),
        "unprintable_name": gz(0x08, 1500000000, b"\x01\x02\x00x"),
        "truncated": "1F8B08",
        "png": "89504E470D0A1A0A" + "0000000D49484452",
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = gzip_structure(df.select("name", F.unhex("hx").alias("bytes")))
    got = {r.name: (r.mtime, r.has_fname, r.fname) for r in out.collect()}
    assert got["named"] == (1700000000, True, "dump.warc")
    assert got["unnamed"] == (1600000000, False, None)
    assert got["zero_mtime"] == (None, True, "a.txt")
    assert got["fextra_blocks_name"] == (1500000000, True, None)
    assert got["unprintable_name"] == (1500000000, True, None)
    assert got["truncated"] == (None, None, None)
    assert got["png"] == (None, None, None)
    spark_pdf = (
        out.select("name", "fmt", "mtime", "has_fname", "fname")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(gzip_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
