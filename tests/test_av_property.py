"""Property harness for the AV tiers (SURVEY.md §5.6 extension):
subtitle render→parse round-trips and WebDataset layout invariants
over random inputs — the generators produce canonical files, the
parsers must recover the generating cue/sample lists exactly."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.archive import webdataset_manifest
from dblp_crawler_spark.sources.subtitles import srt_cues, webvtt_cues

_TEXT = st.text(
    alphabet="abcdefghij XYZ'!?.,:0123456789", min_size=1, max_size=40
).map(lambda s: " ".join(s.split())).filter(
    lambda s: s and not s.startswith("#")
)


def _fmt_vtt(ms):
    h, rem = divmod(ms, 3600000)
    m, rem = divmod(rem, 60000)
    s, milli = divmod(rem, 1000)
    if h:
        return f"{h:02d}:{m:02d}:{s:02d}.{milli:03d}"
    return f"{m:02d}:{s:02d}.{milli:03d}"


def _fmt_srt(ms):
    h, rem = divmod(ms, 3600000)
    m, rem = divmod(rem, 60000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{milli:03d}"


@st.composite
def _cue_list(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    cues, t = [], 0
    for _ in range(n):
        t += draw(st.integers(min_value=0, max_value=5_000_000))
        start = t
        t += draw(st.integers(min_value=1, max_value=600_000))
        cues.append((start, t, draw(_TEXT)))
    return cues


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(cues=_cue_list())
def test_webvtt_roundtrip(spark, cues):
    vtt = "WEBVTT\n\n" + "\n\n".join(
        f"{_fmt_vtt(a)} --> {_fmt_vtt(b)}\n{txt}" for a, b, txt in cues
    ) + "\n"
    files = spark.createDataFrame([("v", vtt)], "video_id string, vtt string")
    got = [
        (r.start_ms, r.end_ms, r.text)
        for r in webvtt_cues(files).orderBy("cue_idx").collect()
    ]
    assert got == cues


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(cues=_cue_list())
def test_srt_roundtrip(spark, cues):
    srt = "\n\n".join(
        f"{i + 1}\n{_fmt_srt(a)} --> {_fmt_srt(b)}\n{txt}"
        for i, (a, b, txt) in enumerate(cues)
    ) + "\n"
    files = spark.createDataFrame([("v", srt)], "video_id string, srt string")
    got = [
        (r.start_ms, r.end_ms, r.text)
        for r in srt_cues(files).orderBy("cue_idx").collect()
    ]
    assert got == cues


def _pad512(n):
    return 512 + ((n + 511) // 512) * 512


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=3000),
                   min_size=1, max_size=25),
    target=st.sampled_from([2048, 8192, 1 << 20]),
)
def test_webdataset_layout_invariants(spark, sizes, target):
    pairs = [(f"s{i:05d}", b"Z" * n, f"cap {i}") for i, n in enumerate(sizes)]
    df = spark.createDataFrame(
        pairs, "image_id string, bytes binary, caption string")
    rows = webdataset_manifest(df, target_bytes=target).collect()
    assert len(rows) == 2 * len(pairs)

    # sample atomicity: both members share the sample's shard
    shard_of = {}
    for r in rows:
        shard_of.setdefault(r.image_id, set()).add(r.shard)
    assert all(len(s) == 1 for s in shard_of.values())

    # shard assignment is monotone in id order
    ordered = sorted(shard_of.items())
    shards = [next(iter(s)) for _, s in ordered]
    assert shards == sorted(shards)

    # within a shard, members tile contiguously from offset 0
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r.header_offset)
        expect = 0
        for r in members:
            assert r.header_offset == expect
            assert r.data_offset == expect + 512
            expect += _pad512(r.data_bytes)

    # .jpg precedes .txt within every sample
    for iid, _, _ in pairs:
        jpg = next(r for r in rows if r.member_name == iid + ".jpg")
        txt = next(r for r in rows if r.member_name == iid + ".txt")
        assert jpg.header_offset < txt.header_offset
