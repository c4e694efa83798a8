"""WAV + MP3 container structure tiers (operators/sniff).

Reference scope note: the reference crawls dblp XML pages only
(/root/reference/dblp_crawler/downloader.py:52-84); these tiers
exist for the audio half of the multimodal graft axes.
"""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    mp3_structure,
    mp3_structure_sql,
    sniff_case_sql,
    wav_structure,
    wav_structure_sql,
)


# ---- WAV fixtures -----------------------------------------------------------

def _le_hex(v, n):
    return "".join(f"{(v >> (8 * i)) & 0xFF:02X}" for i in range(n))


def _chunk(cc_hex, data_hex):
    size = len(data_hex) // 2
    pad = "00" if size % 2 else ""
    return cc_hex + _le_hex(size, 4) + data_hex + pad


def _fmt_chunk(code, ch, sr, bits):
    br = sr * ch * bits // 8
    block = ch * bits // 8
    return _chunk(
        "666D7420",
        _le_hex(code, 2) + _le_hex(ch, 2) + _le_hex(sr, 4)
        + _le_hex(br, 4) + _le_hex(block, 2) + _le_hex(bits, 2),
    )


def _wav(body_hex):
    return "52494646" + _le_hex(4 + len(body_hex) // 2, 4) + "57415645" + body_hex


def _data_decl(nbytes):
    """data chunk declaring nbytes but carrying none (header-only
    fixture — wav_structure reads the declaration, not the payload)."""
    return "64617461" + _le_hex(nbytes, 4)


def _wav_cases():
    return {
        # CD PCM stereo: 352800 B at 176400 B/s → exactly 2000 ms
        "pcm_cd": _wav(_fmt_chunk(1, 2, 44100, 16) + _data_decl(352800)),
        # float mono 48k behind a LIST chunk (walk must hop it)
        "float_list": _wav(_chunk("4C495354", "AA" * 4)
                           + _fmt_chunk(3, 1, 48000, 32)
                           + _data_decl(96000)),       # 500 ms
        # telephony mulaw 8k/8-bit behind an ODD-sized JUNK (pad rule)
        "mulaw_junk": _wav(_chunk("4A554E4B", "BB" * 3)
                           + _fmt_chunk(7, 1, 8000, 8)
                           + _data_decl(12345)),       # 1543 ms (floor)
        # unknown codec code → 'other'
        "odd_codec": _wav(_fmt_chunk(80, 2, 22050, 16) + _data_decl(100)),
        # data chunk before any fmt chunk: duration NULL, size kept
        "data_first": _wav(_data_decl(4096)),
        "jpeg": "FFD8FFE0" + "00" * 8,
        "trunc": "52494646" + "04000000" + "57415645",
    }


def test_wav_structure_pins(spark):
    cases = _wav_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.fmt, r.codec, r.channels, r.sample_rate,
                 r.bits_per_sample, r.data_bytes, r.duration_ms)
        for r in wav_structure(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["pcm_cd"] == ("wav", "pcm", 2, 44100, 16, 352800, 2000)
    assert got["float_list"] == ("wav", "ieee_float", 1, 48000, 32, 96000, 500)
    assert got["mulaw_junk"] == ("wav", "mulaw", 1, 8000, 8, 12345, 1543)
    assert got["odd_codec"][1] == "other"
    assert got["data_first"] == ("wav", None, None, None, None, 4096, None)
    assert got["jpeg"] == ("jpeg", None, None, None, None, None, None)
    assert got["trunc"][0] == "wav" and got["trunc"][5] is None


def test_wav_structure_duckdb_replay(spark):
    cases = _wav_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        wav_structure(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "codec", "channels", "sample_rate",
                "bits_per_sample", "data_bytes", "duration_ms")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(wav_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


# ---- MP3 fixtures -----------------------------------------------------------

def _id3(major, size, flags=0):
    ss = (f"{(size >> 21) & 0x7F:02X}{(size >> 14) & 0x7F:02X}"
          f"{(size >> 7) & 0x7F:02X}{size & 0x7F:02X}")
    return f"494433{major:02X}00{flags:02X}" + ss


def _mp3_cases():
    return {
        # v2.3 empty tag; MPEG1 L3 128kbps 44100 stereo (FF FB 90 00)
        "v1_128": _id3(3, 0) + "FFFB9000" + "00" * 8,
        # v2.4, 129-byte tag of zeros; MPEG2 L3 48kbps 22050 mono
        "v2_48": _id3(4, 129) + "00" * 129 + "FFF362C0" + "00" * 4,
        # v2.4 with footer flag: frame sits 10 bytes later
        "footer": _id3(4, 20, flags=0x10) + "00" * 30 + "FFFBA040" + "00" * 4,
        # MPEG2.5 L3 64kbps 11025 joint stereo (FF E2 82 40)
        "v25_64": _id3(3, 0) + "FFE28240" + "00" * 4,
        # tag present but garbage where the frame should be
        "no_sync": _id3(3, 4) + "00" * 4 + "41424344",
        # free-format bitrate index 0 → bitrate NULL, rest parsed
        "free_br": _id3(3, 0) + "FFFB0000" + "00" * 4,
        "png": "89504E470D0A1A0A" + "00" * 8,
    }


def test_mp3_structure_pins(spark):
    cases = _mp3_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    got = {
        r.name: (r.fmt, r.id3_major, r.tag_bytes, r.mpeg_version, r.layer,
                 r.bitrate_kbps, r.sample_rate, r.channel_mode)
        for r in mp3_structure(
            df.select("name", F.unhex("hx").alias("bytes"))
        ).collect()
    }
    assert got["v1_128"] == ("mp3", 3, 10, "1", 3, 128, 44100, "stereo")
    assert got["v2_48"] == ("mp3", 4, 139, "2", 3, 48, 22050, "mono")
    assert got["footer"] == ("mp3", 4, 40, "1", 3, 160, 44100, "joint_stereo")
    assert got["v25_64"] == ("mp3", 3, 10, "2.5", 3, 64, 11025, "joint_stereo")
    assert got["no_sync"] == ("mp3", 3, 14, None, None, None, None, None)
    assert got["free_br"] == ("mp3", 3, 10, "1", 3, None, 44100, "stereo")
    assert got["png"] == ("png", None, None, None, None, None, None, None)


def test_mp3_structure_duckdb_replay(spark):
    cases = _mp3_cases()
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    spark_pdf = (
        mp3_structure(df.select("name", F.unhex("hx").alias("bytes")))
        .select("name", "fmt", "id3_major", "tag_bytes", "mpeg_version",
                "layer", "bitrate_kbps", "sample_rate", "channel_mode")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(mp3_structure_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


# ---- ID3v2 text frames ------------------------------------------------------

def _ss4(n):
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F]).hex().upper()


def _frame23(fid, payload_hex):
    size = len(payload_hex) // 2
    return fid.encode().hex().upper() + f"{size:08X}" + "0000" + payload_hex


def _frame24(fid, payload_hex):
    size = len(payload_hex) // 2
    return fid.encode().hex().upper() + _ss4(size) + "0000" + payload_hex


def _txt(s, enc="00"):
    return enc + s.encode().hex().upper()


def _id3_cases():
    v23_frames = (_frame23("TIT2", _txt("My Title") + "00")
                  + _frame23("APIC", "AA" * 6)
                  + _frame23("TPE1", _txt("Artist")))
    v23 = "4944330300" + "00" + _ss4(len(v23_frames) // 2) + v23_frames
    v24_frames = (_frame24("TIT2", _txt("Tïtle", enc="03"))
                  + _frame24("TALB", "01" + "FFFE" + "4100"))  # UTF-16 → NULL
    v24 = "4944330400" + "00" + _ss4(len(v24_frames) // 2) + v24_frames
    return {
        "v23": v23 + "00" * 8,
        "v24": v24 + "00" * 8,
        "empty_tag": "4944330300" + "00" + _ss4(0) + "FFFB9000",
        "png": "89504E470D0A1A0A" + "00" * 8,
    }


def test_id3_text_frames_pins(spark):
    from dblp_crawler_spark.operators.sniff import id3_text_frames
    cases = _id3_cases()
    df = spark.createDataFrame(list(cases.items()), "doc_id string, hx string")
    rows = id3_text_frames(
        df.select("doc_id", F.unhex("hx").alias("bytes"))).collect()
    got = {(r.doc_id, r.frame_id): r.text for r in rows}
    assert got[("v23", "TIT2")] == "My Title"     # trailing NUL trimmed
    assert got[("v23", "TPE1")] == "Artist"
    assert got[("v24", "TIT2")] == "Tïtle"        # UTF-8, syncsafe size
    assert got[("v24", "TALB")] is None           # UTF-16 NULL-absorbs
    assert len(rows) == 4                         # APIC skipped, others none


def test_id3_text_frames_duckdb_replay(spark):
    from dblp_crawler_spark.operators.sniff import (
        id3_text_frames,
        id3_text_frames_sql,
    )
    cases = _id3_cases()
    df = spark.createDataFrame(list(cases.items()), "doc_id string, hx string")
    spark_pdf = (
        id3_text_frames(df.select("doc_id", F.unhex("hx").alias("bytes")))
        .toPandas().sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["doc_id", "h"]))
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(id3_text_frames_sql(staged)).df()
        .sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_audio_admission(spark):
    from dblp_crawler_spark.operators.sniff import (
        audio_admission,
        audio_admission_sql,
    )
    cases = dict(_wav_cases())
    cases.update(_mp3_cases())
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = audio_admission(df.select("name", F.unhex("hx").alias("bytes")))
    got = {r.name: (r.verdict, r.admit) for r in out.collect()}
    assert got["pcm_cd"] == ("admit", True)
    assert got["float_list"] == ("too_short", False)       # 500 ms
    assert got["mulaw_junk"] == ("codec_unsupported", False)
    assert got["odd_codec"] == ("codec_unsupported", False)
    assert got["data_first"] == ("no_fmt_chunk", False)
    assert got["jpeg"] == ("not_audio", False)
    assert got["v1_128"] == ("admit", True)
    assert got["free_br"] == ("unknown_bitrate", False)
    assert got["no_sync"] == ("no_sync", False)
    assert got["v25_64"] == ("low_sample_rate", False)     # 11025

    spark_pdf = (
        out.select("name", "fmt", "verdict", "admit")
        .toPandas().sort_values("name").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(audio_admission_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_id3_extended_header_skipped(spark):
    """ADVICE r3: flags bit 6 announces an extended header at byte
    10; without skipping it the frame walk fails the id grammar
    immediately and yields zero text frames. v2.4's ext size is
    syncsafe and includes the whole header; v2.3's is BE32 and
    excludes its own 4 size bytes."""
    from dblp_crawler_spark.operators.sniff import (
        id3_text_frames,
        id3_text_frames_sql,
        sniff_case_sql,
    )

    # v2.4: 6-byte ext header = syncsafe size (=6, incl. itself)
    #       + number-of-flag-bytes (01) + ext flags (00)
    ext24 = _ss4(6) + "01" + "00"
    fr24 = _frame24("TIT2", _txt("ExtT", enc="03"))
    v24e = ("4944330400" + "40"
            + _ss4((len(ext24) + len(fr24)) // 2) + ext24 + fr24)
    # v2.3: size (BE32 = 6, excl. itself) + ext flags (2) + padding
    #       size (4) → 10 bytes total
    ext23 = "00000006" + "0000" + "00000000"
    fr23 = _frame23("TIT2", _txt("Ext3"))
    v23e = ("4944330300" + "40"
            + _ss4((len(ext23) + len(fr23)) // 2) + ext23 + fr23)
    # no-ext control alongside, to pin that flags=0 is unchanged
    fr0 = _frame23("TPE1", _txt("Plain"))
    v23p = "4944330300" + "00" + _ss4(len(fr0) // 2) + fr0
    cases = {"v24_ext": v24e + "00" * 8, "v23_ext": v23e + "00" * 8,
             "plain": v23p + "00" * 8}
    df = spark.createDataFrame(list(cases.items()), "doc_id string, hx string")
    rows = id3_text_frames(
        df.select("doc_id", F.unhex("hx").alias("bytes"))).collect()
    got = {(r.doc_id, r.frame_id): r.text for r in rows}
    assert got[("v24_ext", "TIT2")] == "ExtT"
    assert got[("v23_ext", "TIT2")] == "Ext3"
    assert got[("plain", "TPE1")] == "Plain"
    assert len(rows) == 3

    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["doc_id", "h"]))
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    spark_pdf = (
        id3_text_frames(df.select("doc_id", F.unhex("hx").alias("bytes")))
        .toPandas().sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    duck_pdf = (
        con.sql(id3_text_frames_sql(staged)).df()
        .sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
