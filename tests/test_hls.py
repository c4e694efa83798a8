"""HLS playlist parsing (sources/hls)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.sources.hls import (
    hls_playlist,
    hls_playlist_sql,
    hls_segments,
    hls_segments_sql,
    hls_variants,
    hls_variants_sql,
)

_MEDIA = (
    "#EXTM3U\n#EXT-X-VERSION:3\n#EXT-X-TARGETDURATION:10\n"
    "#EXTINF:9.009,\nseg0.ts\n"
    "#EXTINF:10,\nseg1.ts\n"
    "#EXTINF:4.5,title with comma, yes\n/abs/seg2.ts\n"
    "#EXT-X-ENDLIST\n"
)
_LIVE = "#EXTM3U\n#EXTINF:6.0,\nlive0.ts\n#EXTINF:6.0,\nlive1.ts\n"
_MASTER = (
    "#EXTM3U\n"
    "#EXT-X-STREAM-INF:BANDWIDTH=800000,RESOLUTION=640x360\nlow/index.m3u8\n"
    "#EXT-X-STREAM-INF:BANDWIDTH=2500000,RESOLUTION=1280x720,CODECS=\"avc1\"\n"
    "mid/index.m3u8\n"
    "#EXT-X-STREAM-INF:BANDWIDTH=6000000,RESOLUTION=1920x1080\n"
    "https://cdn.ex.net/hi/index.m3u8\n"
)


def _files(spark):
    return spark.createDataFrame(
        [("https://v.ex.org/a/media.m3u8", _MEDIA),
         ("https://v.ex.org/b/live.m3u8", _LIVE),
         ("https://v.ex.org/c/master.m3u8", _MASTER),
         ("https://v.ex.org/d/empty.m3u8", "#EXTM3U\n")],
        "url string, m3u8 string")


def test_hls_segments_pins(spark):
    segs = {(r.url, r.seg_idx): (r.seg_url, r.duration_ms)
            for r in hls_segments(_files(spark)).collect()}
    assert segs[("https://v.ex.org/a/media.m3u8", 0)] == (
        "https://v.ex.org/a/seg0.ts", 9009)
    assert segs[("https://v.ex.org/a/media.m3u8", 1)] == (
        "https://v.ex.org/a/seg1.ts", 10000)
    assert segs[("https://v.ex.org/a/media.m3u8", 2)] == (
        "https://v.ex.org/abs/seg2.ts", 4500)
    assert len(segs) == 5       # 3 VOD + 2 live


def test_hls_variants_pins(spark):
    vs = {r.variant_idx: r for r in hls_variants(_files(spark)).collect()}
    assert len(vs) == 3
    assert (vs[0].bandwidth, vs[0].width, vs[0].height) == (800000, 640, 360)
    assert vs[0].variant_url == "https://v.ex.org/c/low/index.m3u8"
    assert (vs[1].bandwidth, vs[1].height) == (2500000, 720)
    assert vs[2].variant_url == "https://cdn.ex.net/hi/index.m3u8"


def test_hls_playlist_pins(spark):
    got = {r.url.split("/")[-1]: r for r in
           hls_playlist(_files(spark)).collect()}
    m = got["media.m3u8"]
    assert (m.kind, m.n_segments, m.total_duration_ms, m.live) == (
        "media", 3, 23509, False)
    lv = got["live.m3u8"]
    assert (lv.kind, lv.total_duration_ms, lv.live) == ("media", 12000, True)
    ms = got["master.m3u8"]
    assert (ms.kind, ms.n_variants, ms.max_bandwidth,
            ms.total_duration_ms) == ("master", 3, 6000000, None)
    assert got["empty.m3u8"].kind == "empty"


def test_hls_duckdb_replays(spark):
    files = _files(spark)
    con = duckdb.connect()
    con.register("files", files.toPandas())
    for fn, sql, keys in [
        (hls_segments, hls_segments_sql, ["url", "seg_idx"]),
        (hls_variants, hls_variants_sql, ["url", "variant_idx"]),
        (hls_playlist, hls_playlist_sql, ["url"]),
    ]:
        spark_pdf = (fn(files).toPandas()
                     .sort_values(keys).reset_index(drop=True))
        duck_pdf = (con.sql(sql("files")).df()
                    .sort_values(keys).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


def test_hls_media_renditions(spark):
    from dblp_crawler_spark.sources.hls import (
        hls_media_renditions,
        hls_media_renditions_sql,
    )
    master = (
        "#EXTM3U\n"
        '#EXT-X-MEDIA:TYPE=AUDIO,GROUP-ID="aud",NAME="English",'
        'LANGUAGE="en",DEFAULT=YES\n'
        '#EXT-X-MEDIA:TYPE=SUBTITLES,GROUP-ID="subs",NAME="Deutsch",'
        'LANGUAGE="de",DEFAULT=NO,URI="subs/de.m3u8"\n'
        "#EXT-X-STREAM-INF:BANDWIDTH=800000\nlow.m3u8\n"
    )
    files = spark.createDataFrame(
        [("https://v.ex.org/c/master.m3u8", master)], "url string, m3u8 string")
    out = hls_media_renditions(files)
    got = {r.media_idx: r for r in out.collect()}
    assert len(got) == 2
    a = got[0]
    assert (a.type, a.language, a.is_default, a.rendition_url) == (
        "AUDIO", "en", True, None)        # muxed: no URI
    s = got[1]
    assert (s.type, s.group_id, s.name, s.language, s.is_default) == (
        "SUBTITLES", "subs", "Deutsch", "de", False)
    assert s.rendition_url == "https://v.ex.org/c/subs/de.m3u8"

    con = duckdb.connect()
    con.register("files", files.toPandas())
    spark_pdf = (out.toPandas()
                 .sort_values(["url", "media_idx"]).reset_index(drop=True))
    duck_pdf = (con.sql(hls_media_renditions_sql("files")).df()
                .sort_values(["url", "media_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


def test_hls_interposed_tags_and_unparsable_extinf(spark):
    """ADVICE r3: (1) per-segment tags (EXT-X-BYTERANGE,
    EXT-X-PROGRAM-DATE-TIME) between EXTINF and the URI must not
    drop the segment; (2) '#EXTINF:.5' (no whole seconds) must not
    match on EITHER engine (previously Spark's fold NULL-absorbed
    the playlist sum while DuckDB's SUM skipped the NULL); (3)
    back-to-back EXTINF lines must not merge into one segment."""
    tagged = (
        "#EXTM3U\n"
        "#EXTINF:4.0,\n"
        "#EXT-X-BYTERANGE:1000@0\n"
        "#EXT-X-PROGRAM-DATE-TIME:2024-01-01T00:00:00Z\n"
        "segA.ts\n"
        "#EXTINF:.5,\nfractional.ts\n"      # out of grammar → dropped
        "#EXTINF:6,\nsegB.ts\n"
        "#EXT-X-ENDLIST\n"
    )
    merged = "#EXTM3U\n#EXTINF:3,\n#EXTINF:7,\nonly.ts\n#EXT-X-ENDLIST\n"
    files = spark.createDataFrame(
        [("https://v.ex.org/t/tagged.m3u8", tagged),
         ("https://v.ex.org/t/merged.m3u8", merged)],
        "url string, m3u8 string")
    segs = {(r.url.split("/")[-1], r.seg_idx): (r.seg_url, r.duration_ms)
            for r in hls_segments(files).collect()}
    assert segs[("tagged.m3u8", 0)] == ("https://v.ex.org/t/segA.ts", 4000)
    assert segs[("tagged.m3u8", 1)] == ("https://v.ex.org/t/segB.ts", 6000)
    # the malformed first EXTINF:3 has no URI of its own; only the
    # second (7 s) block matches
    assert segs[("merged.m3u8", 0)] == ("https://v.ex.org/t/only.ts", 7000)
    assert len(segs) == 3
    pl = {r.url.split("/")[-1]: r for r in hls_playlist(files).collect()}
    assert (pl["tagged.m3u8"].n_segments,
            pl["tagged.m3u8"].total_duration_ms) == (2, 10000)
    assert (pl["merged.m3u8"].n_segments,
            pl["merged.m3u8"].total_duration_ms) == (1, 7000)

    con = duckdb.connect()
    con.register("files", files.toPandas())
    for fn, sql, keys in [
        (hls_segments, hls_segments_sql, ["url", "seg_idx"]),
        (hls_playlist, hls_playlist_sql, ["url"]),
    ]:
        spark_pdf = (fn(files).toPandas()
                     .sort_values(keys).reset_index(drop=True))
        duck_pdf = (con.sql(sql("files")).df()
                    .sort_values(keys).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
