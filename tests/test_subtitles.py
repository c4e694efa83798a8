"""WebVTT cue parsing + scene-transcript alignment (sources/
subtitles, operators/multimodal.scene_segments/scene_transcripts)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.multimodal import (
    scene_segments,
    scene_segments_sql,
    scene_transcripts,
    scene_transcripts_sql,
)
from dblp_crawler_spark.sources.subtitles import (
    webvtt_cues,
    webvtt_cues_sql,
)

_VTT = """WEBVTT

NOTE this block is a comment and must not parse as a cue

intro
00:01.000 --> 00:03.500 align:start position:0%
<v Narrator>Hello <i>world</i>

00:04.000 --> 01:00:02.250
line one
line two

bad cue without payload follows (must not match)
00:09.000 --> 00:10.000

99:00:00.000 --> 99:00:01.000
deep timestamp
"""


def test_webvtt_cues_pins(spark):
    files = spark.createDataFrame([("v1", _VTT)], "video_id string, vtt string")
    rows = {r.cue_idx: r for r in webvtt_cues(files).collect()}
    assert len(rows) == 3
    assert (rows[0].start_ms, rows[0].end_ms, rows[0].text) == (
        1000, 3500, "Hello world")
    # hours-optional start, hours-bearing end; multi-line joins
    assert (rows[1].start_ms, rows[1].end_ms, rows[1].text) == (
        4000, 3602250, "line one line two")
    # unbounded hours
    assert (rows[2].start_ms, rows[2].end_ms) == (99 * 3600000, 99 * 3600000 + 1000)
    assert rows[2].text == "deep timestamp"


def test_webvtt_cues_duckdb_replay(spark):
    files = spark.createDataFrame(
        [("v1", _VTT), ("v2", "WEBVTT\n\nno cues here"),
         ("v3", "00:00.100 --> 00:00.200\nhi\n")],
        "video_id string, vtt string")
    spark_pdf = (
        webvtt_cues(files).toPandas()
        .sort_values(["video_id", "cue_idx"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("files", files.toPandas())
    duck_pdf = (
        con.sql(webvtt_cues_sql("files")).df()
        .sort_values(["video_id", "cue_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def _frames(spark):
    # two videos, 6 frames each, scenes of 2 frames (phash jumps by
    # 0xFFFF between scenes, jitter 1 bit inside), ts = idx * 500 ms
    bases = [0x0, 0xFFFF, 0xFFFF0000]   # pairwise hamming 16/32 > 10
    rows = []
    for v, vid in enumerate(("a", "b")):
        for i in range(6):
            base = bases[i // 2] | (v << 40)
            rows.append((vid, i, base ^ (i % 2), i * 500))
    return spark.createDataFrame(
        rows, "video_id string, frame_idx int, phash long, ts_ms long")


def test_scene_segments_pins(spark):
    segs = {
        (r.video_id, r.scene): (r.start_ms, r.end_ms, r.n_frames)
        for r in scene_segments(_frames(spark), max_hamming=10).collect()
    }
    assert segs[("a", 1)] == (0, 500, 2)
    assert segs[("a", 2)] == (1000, 1500, 2)
    assert segs[("a", 3)] == (2000, 2500, 2)
    assert len(segs) == 6


def test_scene_transcripts_pins_and_replay(spark):
    vtt_a = ("WEBVTT\n\n"
             "00:00.000 --> 00:00.400\nfirst\n\n"
             # straddles the scene-1/scene-2 cut at 500..1000
             "00:00.450 --> 00:01.100\nsecond\n\n"
             "00:02.000 --> 00:02.300\nthird\n")
    files = spark.createDataFrame(
        [("a", vtt_a)], "video_id string, vtt string")
    frames = _frames(spark)
    segs = scene_segments(frames, max_hamming=10)
    cues = webvtt_cues(files)
    out = {
        (r.video_id, r.scene): (r.n_cues, r.transcript)
        for r in scene_transcripts(segs, cues).collect()
    }
    assert out[("a", 1)] == (2, "first second")     # cue 1 straddles
    assert out[("a", 2)] == (1, "second")
    assert out[("a", 3)] == (1, "third")
    # video b has no vtt at all: scenes survive with empty transcript
    assert out[("b", 1)] == (0, "")
    assert len(out) == 6

    # DuckDB replay of the full chain
    con = duckdb.connect()
    con.register("frames", frames.toPandas())
    con.register("files", files.toPandas())
    seg_sql = scene_segments_sql("frames", max_hamming=10)
    cue_sql = webvtt_cues_sql("files")
    duck = con.sql(
        scene_transcripts_sql(f"({seg_sql})", f"({cue_sql})")
    ).df().sort_values(["video_id", "scene"]).reset_index(drop=True)
    spark_pdf = (
        scene_transcripts(segs, cues).toPandas()
        .sort_values(["video_id", "scene"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck[spark_pdf.columns], check_dtype=False
    )


_SRT = """1
00:00:01,000 --> 00:00:03,500
<i>Hello</i> world

7
00:01:00,250 --> 01:00:00,000
line one
line two

not a cue
"""


def test_srt_cues_pins_and_replay(spark):
    from dblp_crawler_spark.sources.subtitles import srt_cues, srt_cues_sql
    files = spark.createDataFrame([("v1", _SRT), ("v2", "no cues")],
                                  "video_id string, srt string")
    rows = {r.cue_idx: r for r in srt_cues(files).collect()}
    assert len(rows) == 2
    assert (rows[0].start_ms, rows[0].end_ms, rows[0].text) == (
        1000, 3500, "Hello world")
    assert (rows[1].start_ms, rows[1].end_ms, rows[1].text) == (
        60250, 3600000, "line one line two")

    con = duckdb.connect()
    con.register("files", files.toPandas())
    spark_pdf = (srt_cues(files).toPandas()
                 .sort_values(["video_id", "cue_idx"]).reset_index(drop=True))
    duck_pdf = (con.sql(srt_cues_sql("files")).df()
                .sort_values(["video_id", "cue_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
