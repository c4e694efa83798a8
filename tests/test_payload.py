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
