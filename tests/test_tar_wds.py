"""tar member walk (sniff.tar_structure) + WebDataset shard layout
(archive.webdataset_manifest) — including the round-trip against
Python's own tarfile writer: the manifest's arithmetic must place
members exactly where a real ustar writer puts them, and the walk
must read them back."""

import io
import tarfile

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.archive import (
    webdataset_manifest,
    webdataset_manifest_sql,
)
from dblp_crawler_spark.operators.sniff import (
    tar_structure,
    tar_structure_sql,
)


def _make_tar(members):
    """members: list of (name, payload bytes) → (tar bytes, infos)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(payload)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(payload))
    data = buf.getvalue()
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        infos = [(m.name, m.size, m.offset, m.offset_data)
                 for m in tf.getmembers()]
    return data, infos


_SAMPLES = [
    ("img00001.jpg", b"\xff\xd8\xff" + b"J" * 700),
    ("img00001.txt", b"a red bicycle"),
    ("img00002.jpg", b"\x89PNG" + b"P" * 511),     # 515 B → pads to 1024
    ("img00002.txt", b"two dogs"),
]


def test_tar_structure_matches_tarfile(spark):
    data, infos = _make_tar(_SAMPLES)
    df = spark.createDataFrame([("t1", data.hex().upper())],
                               "doc_id string, hx string")
    got = [
        (r.name, r.size_bytes, r.header_offset, r.data_offset)
        for r in tar_structure(
            df.select("doc_id", F.unhex("hx").alias("bytes"))
        ).orderBy("member_idx").collect()
    ]
    assert got == infos
    # typeflag: regular file
    rows = tar_structure(
        df.select("doc_id", F.unhex("hx").alias("bytes"))).collect()
    assert all(r.typeflag == "0" for r in rows)


def test_tar_structure_non_tar_no_rows(spark):
    df = spark.createDataFrame(
        [("png", "89504E470D0A1A0A" + "00" * 600)],
        "doc_id string, hx string")
    assert tar_structure(
        df.select("doc_id", F.unhex("hx").alias("bytes"))).count() == 0


def test_tar_structure_duckdb_replay(spark):
    data, _ = _make_tar(_SAMPLES)
    cases = {"t1": data.hex().upper(),
             "png": "89504E470D0A1A0A" + "00" * 600}
    df = spark.createDataFrame(list(cases.items()), "doc_id string, hx string")
    spark_pdf = (
        tar_structure(df.select("doc_id", F.unhex("hx").alias("bytes")))
        .toPandas().sort_values(["doc_id", "member_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["doc_id", "h"]))
    duck_pdf = (
        con.sql(tar_structure_sql("cases")).df()
        .sort_values(["doc_id", "member_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_webdataset_manifest_matches_tarfile(spark):
    pairs = [
        ("img00001", b"\xff\xd8" + b"J" * 700, "a red bicycle"),
        ("img00002", b"\x89PNG" + b"P" * 511, "two dogs"),
        ("img00003", b"RIFF" + b"W" * 100, "café au lait"),
    ]
    df = spark.createDataFrame(pairs, "image_id string, bytes binary, caption string")
    got = {
        (r.image_id, r.member_name): (r.shard, r.header_offset,
                                      r.data_offset, r.data_bytes)
        for r in webdataset_manifest(df, target_bytes=1 << 30).collect()
    }
    # write the same members with tarfile and compare actual offsets
    members = []
    for iid, payload, cap in pairs:
        members.append((iid + ".jpg", payload))
        members.append((iid + ".txt", cap.encode()))
    _, infos = _make_tar(members)
    for name, size, off, off_data in infos:
        iid = name.split(".")[0]
        assert got[(iid, name)] == (0, off, off_data, size)


def test_webdataset_manifest_shard_split_and_replay(spark):
    pairs = [(f"img{i:05d}", b"X" * (200 + 137 * i), f"caption {i}")
             for i in range(20)]
    df = spark.createDataFrame(pairs, "image_id string, bytes binary, caption string")
    out = webdataset_manifest(df, target_bytes=4096)
    rows = out.collect()
    # samples whole: both members of a sample share a shard
    by_sample = {}
    for r in rows:
        by_sample.setdefault(r.image_id, set()).add(r.shard)
    assert all(len(s) == 1 for s in by_sample.values())
    assert len({r.shard for r in rows}) > 1          # actually split
    # every shard starts at offset 0
    first = {}
    for r in rows:
        first[r.shard] = min(first.get(r.shard, 1 << 60), r.header_offset)
    assert set(first.values()) == {0}

    con = duckdb.connect()
    con.register(
        "pairs",
        pd.DataFrame(
            [(i, b.hex().upper(), c) for i, b, c in pairs],
            columns=["image_id", "h", "caption"],
        ),
    )
    duck = (
        con.sql(webdataset_manifest_sql("pairs", target_bytes=4096)).df()
        .sort_values(["image_id", "member_name"]).reset_index(drop=True)
    )
    spark_pdf = (
        out.toPandas().sort_values(["image_id", "member_name"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck[spark_pdf.columns], check_dtype=False
    )


def test_wds_roundtrip_through_tar_structure(spark):
    """Writer arithmetic == reader walk: render the manifest's tar
    with tarfile, parse it with tar_structure, offsets must agree."""
    pairs = [("a00001", b"Q" * 300, "one"), ("a00002", b"R" * 900, "two")]
    df = spark.createDataFrame(pairs, "image_id string, bytes binary, caption string")
    man = {
        (r.member_name): (r.header_offset, r.data_offset, r.data_bytes)
        for r in webdataset_manifest(df, target_bytes=1 << 30).collect()
    }
    members = []
    for iid, payload, cap in pairs:
        members.append((iid + ".jpg", payload))
        members.append((iid + ".txt", cap.encode()))
    data, _ = _make_tar(members)
    tdf = spark.createDataFrame([("t", data.hex().upper())],
                                "doc_id string, hx string")
    parsed = tar_structure(
        tdf.select("doc_id", F.unhex("hx").alias("bytes"))).collect()
    assert len(parsed) == 4
    for r in parsed:
        assert man[r.name] == (r.header_offset, r.data_offset, r.size_bytes)
