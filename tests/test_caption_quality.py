"""Caption junk gate: one planted caption per flag class, a clean
caption that passes, and the DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.multimodal import (
    caption_quality,
    caption_quality_sql,
)

CASES = [
    # (caption, expect_flag, expect_ok)
    ("a brown dog chasing a red ball in the park", None, True),
    ("IMG_2041", "filename_like", False),
    ("dsc 1234", "filename_like", False),
    ("sunset_beach.jpeg", "filename_like", False),
    ("hi", "too_short", False),
    ("", "too_short", False),
    ("see https://example.com/full-gallery for more pictures", "has_url", False),
    ("beautiful landscape www.photosite.example gallery", "has_url", False),
    ("mountain lake Shutterstock royalty free stock photo", "stock_boilerplate", False),
    ("image of a photo", "generic_only", False),
    ("the picture", "generic_only", False),
    ("dog dog dog dog puppy dog", "low_diversity", False),
]


def _run(spark):
    rows = [(str(i), c) for i, (c, _, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    return {r.image_id: r for r in caption_quality(df).collect()}


def test_planted_flags(spark):
    got = _run(spark)
    for i, (cap, flag, ok) in enumerate(CASES):
        r = got[str(i)]
        assert r.ok == ok, cap
        if flag is not None:
            assert getattr(r, flag), (cap, flag)


def test_clean_caption_fires_nothing(spark):
    r = _run(spark)["0"]
    assert not any([r.too_short, r.filename_like, r.has_url,
                    r.stock_boilerplate, r.generic_only, r.low_diversity])
    assert r.n_tokens == 10


def test_generic_only_needs_full_cover(spark):
    # one non-filler token rescues it from generic_only
    df = spark.createDataFrame(
        [("x", "image of a dalmatian")], "image_id string, caption string"
    )
    r = caption_quality(df).collect()[0]
    assert not r.generic_only and r.ok


def test_duckdb_replay_identical(spark):
    rows = [(str(i), c) for i, (c, _, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    got = caption_quality(df).toPandas().sort_values("image_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("pairs", pd.DataFrame(rows, columns=["image_id", "caption"]))
    want = (
        con.sql(caption_quality_sql("pairs")).df()
        .sort_values("image_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
