"""Batch pins: EXIF Software tag (generator regex shared with the
PNG tEXt gate), image-sitemap extension parsing, per-page outlink
spray profiles, and meta-refresh redirects — each with its DuckDB
replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sniff import (
    exif_software,
    exif_software_sql,
    sniff_case_sql,
)
from dblp_crawler_spark.sources.webparse import (
    meta_refresh,
    meta_refresh_sql,
    outlink_profile,
    outlink_profile_sql,
    sitemap_images,
    sitemap_images_sql,
)

APP0 = "FFE00010" + "4A46494600" + "00" * 9


def _sw_app1(value: str, le=True) -> str:
    val = value.encode() + b"\x00"
    cnt = len(val)
    if le:
        ent = "3101" + "0200" + "".join(
            f"{(cnt >> (8 * i)) & 255:02X}" for i in range(4))
        off = 8 + 2 + 12 + 4
        v = "".join(f"{(off >> (8 * i)) & 255:02X}" for i in range(4))
        hdr = "49492A00" + "08000000" + "0100"
    else:
        ent = "0131" + "0002" + f"{cnt:08X}"
        off = 8 + 2 + 12 + 4
        v = f"{off:08X}"
        hdr = "4D4D002A" + "00000008" + "0001"
    payload = ("457869660000" + hdr + ent + v + "00000000"
               + val.hex().upper())
    return "FFD8" + APP0 + "FFE1" + f"{len(payload) // 2 + 2:04X}" + payload


def test_exif_software(spark):
    cases = {
        "photoshop": _sw_app1("Adobe Photoshop 25.0"),
        "sd": _sw_app1("Stable Diffusion XL", le=False),
        "plain": "FFD8" + APP0,
        "png": "89504E470D0A1A0A" + "00" * 8,
    }
    df = spark.createDataFrame(list(cases.items()), "name string, hx string")
    out = exif_software(df.select("name", F.unhex("hx").alias("bytes")))
    got = {r.name: r for r in out.collect()}
    assert (got["photoshop"].software, got["photoshop"].gen_hint) == (
        "Adobe Photoshop 25.0", False)
    assert (got["sd"].software, got["sd"].gen_hint) == (
        "Stable Diffusion XL", True)
    for n in ("plain", "png"):
        assert (got[n].software, got[n].gen_hint) == (None, None)
    spark_pdf = (
        out.select("name", "fmt", "software", "gen_hint")
        .toPandas().sort_values("name").reset_index(drop=True))
    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases.items(), columns=["name", "h"]))
    staged = f"(SELECT name, h, {sniff_case_sql('h')} AS fmt FROM cases)"
    duck_pdf = (
        con.sql(exif_software_sql(staged, keep="name")).df()
        .sort_values("name").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


SM_XML = (
    "<urlset><url><loc>https://a.org/gallery</loc>"
    "<image:image><image:loc>https://a.org/img/1.jpg</image:loc>"
    "<image:caption>A sunset</image:caption>"
    "<image:title>Sunset</image:title></image:image>"
    "<image:image><image:loc>https://cdn.b.net/2.png</image:loc>"
    "</image:image></url>"
    "<url><loc>https://a.org/plain</loc></url></urlset>"
)


def test_sitemap_images(spark):
    df = spark.createDataFrame([("a.org", SM_XML)],
                               "host string, sitemap_xml string")
    out = sitemap_images(df)
    got = {r.image_url: r for r in out.collect()}
    r = got["https://a.org/img/1.jpg"]
    assert (r.page_url, r.caption, r.title, r.same_host) == (
        "https://a.org/gallery", "A sunset", "Sunset", True)
    r = got["https://cdn.b.net/2.png"]
    assert (r.caption, r.title, r.same_host) == (None, None, False)
    assert len(got) == 2            # the image-less page yields nothing
    spark_pdf = out.toPandas().sort_values("image_url").reset_index(drop=True)
    con = duckdb.connect()
    con.register("sm", pd.DataFrame([("a.org", SM_XML)],
                                    columns=["host", "sitemap_xml"]))
    duck_pdf = (
        con.sql(sitemap_images_sql("sm")).df()
        .sort_values("image_url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


def _edges():
    rows = []
    # spray page: 24 links to 24 distinct external domains
    for i in range(24):
        rows.append(("https://farm.org/p", f"https://spam{i}.net/x"))
    # organic page: 10 internal + 2 external
    for i in range(10):
        rows.append(("https://good.org/p", f"https://good.org/a{i}"))
    rows += [("https://good.org/p", "https://ref.org/cite"),
             ("https://good.org/p", "https://other.org/see")]
    return rows


def test_outlink_profile(spark):
    df = spark.createDataFrame(_edges(), "url string, out_url string")
    got = {r.url: r for r in outlink_profile(df).collect()}
    farm = got["https://farm.org/p"]
    assert (farm.n_links, farm.n_domains, farm.spray_flag) == (24, 24, True)
    good = got["https://good.org/p"]
    assert (good.n_links, good.n_external, good.spray_flag) == (12, 2, False)
    assert good.external_milli == 166
    spark_pdf = (
        outlink_profile(df).toPandas().sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("edges", pd.DataFrame(_edges(), columns=["url", "out_url"]))
    duck_pdf = (
        con.sql(outlink_profile_sql("edges")).df()
        .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


PAGES = [
    ("https://p.org/a", "<html><meta http-equiv='refresh' "
     "content='0; url=/next'></html>"),
    ("https://p.org/b", '<meta content="3;url=https://q.org/t" '
     'http-equiv="refresh">'),
    ("https://p.org/c", "<meta http-equiv='refresh' content='300'>"),
    ("https://p.org/d", "<meta http-equiv='refresh' content='30; "
     "url=slow.html'>"),
    ("https://p.org/e", "<html>no refresh here</html>"),
]


def test_meta_refresh(spark):
    df = spark.createDataFrame(PAGES, "url string, html string")
    got = {r.url: r for r in meta_refresh(df).collect()}
    r = got["https://p.org/a"]
    assert (r.delay_s, r.target_url, r.treat_as_redirect) == (
        0, "https://p.org/next", True)
    r = got["https://p.org/b"]   # reversed attribute order
    assert (r.delay_s, r.target_url, r.treat_as_redirect) == (
        3, "https://q.org/t", True)
    r = got["https://p.org/c"]   # self-reload, no target
    assert (r.delay_s, r.target_url, r.treat_as_redirect) == (300, None, False)
    r = got["https://p.org/d"]   # slow refresh: content, not redirect
    assert (r.delay_s, r.treat_as_redirect) == (30, False)
    assert r.target_url == "https://p.org/slow.html"
    r = got["https://p.org/e"]
    assert (r.delay_s, r.target_url, r.treat_as_redirect) == (None, None, None)
    spark_pdf = (
        meta_refresh(df).toPandas().sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", pd.DataFrame(PAGES, columns=["url", "html"]))
    duck_pdf = (
        con.sql(meta_refresh_sql("pages")).df()
        .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


SMV_XML = (
    "<urlset><url><loc>https://a.org/watch/1</loc>"
    "<video:video>"
    "<video:content_loc>https://cdn.b.net/v/1.mp4</video:content_loc>"
    "<video:thumbnail_loc>https://cdn.b.net/t/1.jpg</video:thumbnail_loc>"
    "<video:title>Clip one</video:title>"
    "<video:description>About one</video:description>"
    "<video:duration>600</video:duration>"
    "</video:video></url>"
    "<url><loc>https://a.org/watch/2</loc>"
    "<video:video>"
    '<video:player_loc allow_embed="yes">https://a.org/embed/2</video:player_loc>'
    "<video:duration>99999</video:duration>"
    "</video:video></url>"
    "<url><loc>https://a.org/watch/3</loc>"
    "<video:video><video:title>no url</video:title></video:video></url>"
    "<url><loc>https://a.org/plain</loc></url></urlset>"
)


def test_sitemap_videos(spark):
    from dblp_crawler_spark.sources.webparse import (
        sitemap_videos,
        sitemap_videos_sql,
    )
    df = spark.createDataFrame([("a.org", SMV_XML)],
                               "host string, sitemap_xml string")
    out = sitemap_videos(df)
    got = {r.video_url: r for r in out.collect()}
    r = got["https://cdn.b.net/v/1.mp4"]
    assert (r.page_url, r.thumbnail_url, r.title, r.description,
            r.duration_s, r.valid_duration, r.same_host) == (
        "https://a.org/watch/1", "https://cdn.b.net/t/1.jpg", "Clip one",
        "About one", 600, True, False)
    r = got["https://a.org/embed/2"]          # player_loc fallback
    assert (r.duration_s, r.valid_duration, r.same_host) == (
        99999, False, True)
    assert r.thumbnail_url is None and r.title is None
    assert len(got) == 2                      # URL-less video drops
    spark_pdf = out.toPandas().sort_values("video_url").reset_index(drop=True)
    con = duckdb.connect()
    con.register("smv", pd.DataFrame([("a.org", SMV_XML)],
                                     columns=["host", "sitemap_xml"]))
    duck_pdf = (
        con.sql(sitemap_videos_sql("smv")).df()
        .sort_values("video_url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)
