"""Payload invariants (BASELINE.json input_hint): decoded-pixel
allclose (PSNR ≥ 40 dB for lossy), caption equality, phash recompute
— plus corruption detection and the feature-extraction template."""

import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark import codecs, fixtures, schemas
from dblp_crawler_spark.operators.multimodal import (
    decode_and_verify,
    extract_features,
    fetch_images_for_pubs,
    payload_gate,
)


@pytest.fixture(scope="module")
def images_df(spark, universe):
    return spark.createDataFrame(universe.images, schemas.IMAGES).cache()


def test_codec_roundtrip_and_psnr():
    px = codecs.synth_pixels("img_x", 64, 32)
    assert px.shape == (32, 64, 3)
    lossless = codecs.decode_image(codecs.encode_image(px, "png"))
    assert (lossless == px).all()
    lossy = codecs.decode_image(codecs.encode_image(px, "jpeg"))
    assert codecs.psnr(px, lossy) >= 40.0  # the input_hint lossy gate
    assert codecs.psnr(px, px) == float("inf")


def test_all_fixture_images_pass_gate(spark, images_df):
    gated = payload_gate(decode_and_verify(images_df))
    n = images_df.count()
    assert gated.filter("payload_ok").count() == n
    # lossy images really are lossy (the gate isn't vacuous)
    jpg = gated.filter("fmt = 'jpeg'")
    assert jpg.filter(F.col("psnr_db") < 99.0).count() == jpg.count()
    assert jpg.filter(F.col("psnr_db") >= 40.0).count() == jpg.count()


def test_corruption_detected(spark, images_df):
    one = images_df.limit(1)

    # flip payload bytes → decode produces wrong pixels or fails
    corrupted = one.withColumn(
        "bytes", F.concat(F.col("bytes").substr(F.lit(1), F.lit(9)), F.lit(b"\x00\x00\x00\x00\x00\x00"))
    )
    gated = payload_gate(decode_and_verify(corrupted))
    assert gated.filter("payload_ok").count() == 0

    # wrong metadata (w) → dimension check trips
    bad_meta = one.withColumn("w", F.col("w") + F.lit(8))
    gated2 = payload_gate(decode_and_verify(bad_meta))
    assert gated2.filter("payload_ok").count() == 0


def test_caption_equality_gate(spark, universe, images_df):
    # emitted pubs ↔ their image pages: captions must match the title
    pubs = spark.createDataFrame(
        [
            {"key": p["key"], "title": p["title"], "image_id": p["image_id"]}
            for p in universe.pubs.values()
        ],
        "key string, title string, image_id string",
    )
    fetched = fetch_images_for_pubs(pubs, images_df)
    assert fetched.count() == len(universe.pubs)
    assert fetched.filter(~F.col("caption_ok")).count() == 0
    # a tampered caption is caught
    tampered = images_df.withColumn(
        "caption", F.when(F.col("image_id") == "img_000000", F.lit("wrong")).otherwise(F.col("caption"))
    )
    bad = fetch_images_for_pubs(pubs, tampered).filter(~F.col("caption_ok"))
    assert bad.count() == 1


def test_extract_features_plumbing(spark, images_df):
    feats = extract_features(images_df.limit(20))
    rows = feats.collect()
    assert len(rows) == 20
    assert all(r.mean_r is not None and 0.0 <= r.mean_r <= 255.0 for r in rows)
    assert all(r.thumb_phash is not None for r in rows)


def test_resize_images_roundtrip(spark):
    from dblp_crawler_spark import codecs
    from dblp_crawler_spark.operators.multimodal import resize_images

    rows = [
        (f"img_{i}", codecs.encode_image(codecs.synth_pixels(f"img_{i}", 64, 48), "png"))
        for i in range(6)
    ] + [("bad", b"not an image")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r.image_id: r for r in resize_images(df, 16, 16).collect()}
    assert len(got) == 7
    assert not got["bad"].resize_ok and got["bad"].bytes is None
    for i in range(6):
        r = got[f"img_{i}"]
        assert r.resize_ok and (r.w, r.h) == (16, 16)
        px = codecs.decode_image(bytes(r.bytes))
        assert px.shape == (16, 16, 3)  # decodable, exact target dims


def test_sample_frames_every_nth_with_timestamps(spark):
    from dblp_crawler_spark import codecs
    from dblp_crawler_spark.operators.multimodal import sample_frames

    rows = [
        ("vid_a", codecs.synth_video("vid_a", n_frames=23, w=32, h=24, fps=10)),
        ("vid_b", codecs.synth_video("vid_b", n_frames=7, w=16, h=16, fps=5)),
        ("vid_bad", b"mp4 soup"),  # real containers: stubbed decode, row dropped
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    got = sample_frames(df, every_n=5).collect()
    a = sorted((r.frame_idx, r.ts_ms) for r in got if r.video_id == "vid_a")
    b = sorted((r.frame_idx, r.ts_ms) for r in got if r.video_id == "vid_b")
    assert a == [(0, 0), (5, 500), (10, 1000), (15, 1500), (20, 2000)]
    assert b == [(0, 0), (5, 1000)]
    assert not any(r.video_id == "vid_bad" for r in got)
    # each sampled frame's phash matches an independent re-decode
    for r in got:
        if r.video_id == "vid_a":
            ref = codecs.synth_pixels(f"vid_a#{r.frame_idx}", 32, 24)
            assert r.frame_phash == codecs.phash64(ref)
            assert (r.w, r.h) == (32, 24)


def test_audio_features_analytic_values(spark):
    """REAL wav decode (stdlib): a pure sine's RMS and zero-crossing
    rate are analytic — RMS = A/sqrt(2), ZCR = 2f crossings/sec →
    zero_crossing_hz ~= f."""
    import math

    from dblp_crawler_spark import codecs
    from dblp_crawler_spark.operators.multimodal import audio_features

    rows = [
        ("a440", codecs.synth_wav("a440", seconds=2.0, freq_hz=440.0, amplitude=0.5)),
        ("a100", codecs.synth_wav("a100", seconds=1.0, freq_hz=100.0, amplitude=0.9)),
        ("bad", b"\x00\x01 not wav"),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    got = {r.audio_id: r for r in audio_features(df).collect()}
    assert not got["bad"].decode_ok
    r = got["a440"]
    assert r.decode_ok and r.sample_rate == 16000
    assert abs(r.duration_s - 2.0) < 1e-3
    assert abs(r.rms - 0.5 / math.sqrt(2)) < 0.01
    assert abs(r.zero_crossing_hz - 440.0) < 5.0
    assert 0.45 <= r.peak <= 0.5
    r2 = got["a100"]
    assert abs(r2.rms - 0.9 / math.sqrt(2)) < 0.01
    assert abs(r2.zero_crossing_hz - 100.0) < 2.0


def test_phash_near_dup_images(spark):
    """Planted near-identical images (slight pixel perturbation) must
    pair up by phash; unrelated images must not."""
    import numpy as np

    from dblp_crawler_spark import codecs
    from dblp_crawler_spark.operators.multimodal import phash_near_dup_images

    # per-id random pixels, NOT synth_pixels: the fixture gradient is
    # shared across images, so block-mean hashes genuinely collide
    # there (visually homogeneous corpus = all near-dups — correct
    # but vacuous for this test)
    rows = []
    for i in range(6):
        rng = np.random.Generator(np.random.PCG64(1000 + i))
        px = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
        rows.append((f"img{i}", int(codecs.phash64(px))))
        if i < 2:  # plant a near-dup twin: tiny brightness nudge
            twin = np.clip(px.astype(np.int16) + 1, 0, 255).astype(np.uint8)
            rows.append((f"img{i}_twin", int(codecs.phash64(twin))))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = {(r.a, r.b) for r in phash_near_dup_images(df, max_hamming=4, prefix_bits=8).collect()}
    assert ("img0", "img0_twin") in pairs
    assert ("img1", "img1_twin") in pairs
    # distinct synthetic images are far apart in phash space
    assert not any({a, b} <= {"img0", "img1", "img2", "img3", "img4", "img5"} for a, b in pairs)


def test_aspect_bucket_nearest_and_metadata_only(spark):
    """Bucket assignment picks the nearest-aspect-ratio target (ties
    to the lower index) and the plan is a pure projection: no
    exchange, no bytes — it must run on a two-int-column scan."""
    from dblp_crawler_spark.operators.multimodal import (
        DEFAULT_ASPECT_BUCKETS,
        aspect_bucket,
    )

    rows = [
        ("sq", 1024, 1024),    # exact square bucket
        ("wide", 2048, 512),   # exact 4:1
        ("tall", 512, 2048),   # exact 1:4
        ("photo", 800, 600),   # 1.333 -> nearest 1152/896 = 1.2857
    ]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    got = {r.image_id: (r.bucket_id, r.target_w, r.target_h)
           for r in aspect_bucket(df).collect()}
    assert got["sq"] == (6, 1024, 1024)
    assert got["wide"] == (12, 2048, 512)
    assert got["tall"] == (0, 512, 2048)
    assert got["photo"] == (7, 1152, 896)
    assert DEFAULT_ASPECT_BUCKETS[got["photo"][0]] == (1152, 896)
    plan = aspect_bucket(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_image_caption_pipeline_gates(spark):
    """The multimodal curation pass drops extreme-aspect pairs and
    non-language captions, and the per-bucket report aggregates the
    survivors exactly."""
    from dblp_crawler_spark.operators.multimodal import aspect_bucket
    from dblp_crawler_spark.operators.textstats import stopword_ratio, token_count

    rows = [
        # (id, w, h, caption): survivors and planted drops
        (1, 1024, 1024, "the cat is sitting on the mat in the sun"),
        (2, 900, 4000, "the dog is running through the park"),        # h > 4w: drop
        (3, 1024, 1000, "x1 y2 z3 q4 r5 s6"),                         # no stopwords: drop
        (4, 800, 600, "a bird and a tree with the sky behind it"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, w int, h int, text string")
    pairs = df.select(
        "doc_id", "w", "h",
        token_count("text").alias("n_cap"),
        stopword_ratio("text").alias("swr"),
    )
    from pyspark.sql import functions as F

    gated = pairs.filter(
        (F.col("n_cap") >= 5) & (F.col("n_cap") <= 4096)
        & (F.col("swr") >= 0.01)
        & (F.col("w") <= 4 * F.col("h")) & (F.col("h") <= 4 * F.col("w"))
    )
    out = (
        aspect_bucket(gated)
        .groupBy("bucket_id", "target_w", "target_h")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("n_cap").alias("total_caption_tokens"))
        .collect()
    )
    kept = {r.bucket_id: (r.n_pairs, r.total_caption_tokens) for r in out}
    # ids 1 (square bucket 6) and 4 (bucket 7) survive; 2 and 3 dropped
    assert kept == {6: (1, 10), 7: (1, 10)}


def test_assemble_batches_contract(spark):
    """Every batch holds exactly batch_size images of ONE bucket,
    filled in id order; ragged bucket tails are dropped; and the
    distributed prefix-sum rank enumerates each bucket cleanly
    (0..n-1) — the regression for the range-exchange branch-
    consistency bug, where independently re-executed
    repartitionByRange copies drew different boundaries (sampler
    seed includes the RDD id) and produced negative batch ids."""
    import collections

    from dblp_crawler_spark.operators.multimodal import assemble_batches

    # enough rows to spread over several range partitions at
    # local[4]; geometry spread over several buckets
    rows = [(f"i{i:05d}", 256 + (i * 37) % 1024, 256 + (i * 53) % 1024)
            for i in range(5000)]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    out = assemble_batches(df, batch_size=8).collect()
    assert all(r.batch_id >= 0 and 0 <= r.slot < 8 for r in out)
    by_batch = collections.defaultdict(list)
    for r in out:
        by_batch[(r.bucket_id, r.batch_id)].append(r)
    for (bk, _), members in by_batch.items():
        assert len(members) == 8                      # full batches only
        assert {(m.target_w, m.target_h) for m in members} == \
               {(members[0].target_w, members[0].target_h)}  # one geometry
    # per-bucket (batch_id, slot) is a clean enumeration in id order
    by_bucket = collections.defaultdict(list)
    for r in out:
        by_bucket[r.bucket_id].append(r)
    for bk, lst in by_bucket.items():
        lst.sort(key=lambda r: r.image_id)
        assert [(r.batch_id, r.slot) for r in lst] == \
               [(i // 8, i % 8) for i in range(len(lst))]
    # drop_last=False keeps every row and tails stay partial
    n_all = assemble_batches(df, batch_size=8, drop_last=False).count()
    assert n_all == 5000


def test_scene_cuts_segmentation(spark):
    """Known frame sequence: two hard cuts -> three scenes; within-
    scene jitter below the threshold never splits; a single-frame
    video is one scene."""
    from dblp_crawler_spark.operators.multimodal import scene_cuts

    A, B, C = 0x0FF00FF00FF00FF0, 0x5A5A5A5A5A5A5A5A, 0x00000000FFFFFFFF
    rows = [("v1", i, p) for i, p in enumerate(
        [A, A ^ 1, A ^ 3,      # scene 1 (hamming 1,2)
         B, B ^ 2,             # scene 2 (cut: A^3 vs B is far)
         C, C ^ 1, C ^ 4]      # scene 3
    )] + [("v2", 0, A)]
    df = spark.createDataFrame(rows, "video_id string, frame_idx int, phash long")
    got = {r["video_id"]: (r["n_frames"], r["n_scenes"], r["longest_scene"])
           for r in scene_cuts(df, max_hamming=10).collect()}
    assert got["v1"] == (8, 3, 3)
    assert got["v2"] == (1, 1, 1)


def test_joint_near_dup_crossmodal_transitivity(spark):
    """A phash twin (fresh caption) and a caption copy (far phash)
    of one base image cluster together ONLY through the base — the
    union of both edge types must close transitively."""
    from dblp_crawler_spark.operators.multimodal import joint_near_dup_clusters

    rows = [
        # base A + phash twin (hamming 2, different caption)
        ("A", 0b1100, "caption one"),
        ("A_twin", 0b1111, "caption two"),
        # caption copy of A with a phash > 4 hamming from everything
        ("A_cap", 0b111110000, "caption one"),
        # unrelated image: > 4 hamming from all, unique caption
        ("Z", 0b101010101010101, "caption z"),
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    cc = joint_near_dup_clusters(df, max_hamming=4, prefix_bits=12)
    got = {r.id: r.component for r in cc.collect()}
    assert got == {"A": "A", "A_twin": "A", "A_cap": "A"}  # Z not in any cluster


def test_image_linear_gate_hand_scores(spark):
    """Hand-computed linear gate: score = bias + Σ bit_k·w_k +
    fmt_weight, accept iff > 0; unknown fmt takes weight 0; a zero
    bit-weight is elided from the expression but must not shift
    indexing of later bits."""
    from dblp_crawler_spark.operators.multimodal import image_linear_gate

    # weights over bits 0..3: [2, 0, -5, 3]  (bit 1 weight 0 → elided)
    rows = [
        ("a", 0b0001, "jpeg"),   # 2*1              + (-4) bias... see below
        ("b", 0b1101, "png"),    # 2 + (-5) + 3 = 0 plus fmt 5
        ("c", 0b0100, "tiff"),   # -5, unknown fmt → 0
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long, fmt string")
    out = image_linear_gate(df, [2, 0, -5, 3], {"jpeg": -1, "png": 5}, bias=1)
    got = {r.image_id: (r.score, r.accept) for r in out.collect()}
    assert got == {
        "a": (1 + 2 - 1, True),        # bias + bit0*2 + jpeg(-1) = 2
        "b": (1 + 2 - 5 + 3 + 5, True),  # = 6
        "c": (1 - 5 + 0, False),       # = -4
    }


def test_joint_near_dup_caption_star_edges_linear(spark):
    """A k-way caption collision contributes k-1 star edges, not
    k*(k-1)/2 pairwise edges (the shape that survives a million-way
    collision)."""
    from dblp_crawler_spark.operators.multimodal import joint_near_dup_clusters

    rows = [(f"img{i:02d}", (i + 1) << 30, "same caption") for i in range(6)]
    df = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    cc = joint_near_dup_clusters(df)
    got = {r.id: r.component for r in cc.collect()}
    assert len(got) == 6 and set(got.values()) == {"img00"}
