"""HLS (.m3u8) playlist parsing — how video actually ships on the
web.

A crawler that discovers a <video> element or a sitemap_videos
player_loc almost never lands on an .mp4: it lands on an HLS
playlist. The MASTER playlist enumerates variant streams (the
bitrate ladder — bandwidth + resolution per rendition), and each
MEDIA playlist enumerates the actual segments with per-segment
EXTINF durations; summing them yields the exact content duration
without fetching one byte of video, and EXT-X-ENDLIST separates VOD
(harvestable) from live streams (not). For a video-text pipeline
this is the costing + routing tier: pick the rendition worth
fetching, know the duration to budget transcription, skip live.

RFC 8216 grammar subset, all pure regexp work (RE2-safe, shared
verbatim with the DuckDB replays); durations are parsed to EXACT
integer milliseconds (decimal seconds with up to 3 fractional
digits — the common writer precision; deeper fractions truncate).

Reference scope note: the reference crawls dblp XML pages only
(/root/reference/dblp_crawler/downloader.py:52-84); this source
exists for the video axis of the graft.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: an EXTINF tag + its segment URI line. Whole seconds are REQUIRED
#: (#EXTINF:.5 never matches, so an unparsable duration can't
#: NULL-absorb the playlist sum on one engine and not the other),
#: and per-segment tags (EXT-X-BYTERANGE, EXT-X-PROGRAM-DATE-TIME,
#: EXT-X-KEY, ...) may interpose between EXTINF and the URI — the
#: #EXT-X- prefix keeps the group from swallowing a following
#: #EXTINF, so back-to-back segments never merge. Plain comment
#: lines between EXTINF and URI remain out of grammar (documented).
HLS_SEG_RE = r"#EXTINF:\d+[^\n]*\n(?:#EXT-X-[^\n]*\n)*[^#\n][^\n]*"
#: an EXT-X-STREAM-INF tag + its following variant URI line
#: (RFC 8216 §4.3.4.2: the URI line is the next line — kept strict)
HLS_VAR_RE = r"#EXT-X-STREAM-INF:[^\n]*\n[^#\n][^\n]*"
_DUR_INT_RE = r"#EXTINF:(\d+)"
_DUR_FRAC_RE = r"#EXTINF:\d+\.(\d{1,3})"
#: the URI is the LAST line of a block (intervening tags start '#')
_URI_RE = r"\n([^#\n][^\n]*)$"
_BW_RE = r"BANDWIDTH=(\d+)"
_RES_RE = r"RESOLUTION=(\d+)x(\d+)"


def _extinf_ms(blk: Column) -> Column:
    """Exact integer ms from an EXTINF block's decimal seconds."""
    whole = F.regexp_extract(blk, _DUR_INT_RE, 1).cast("long")
    frac = F.rpad(
        F.coalesce(
            F.nullif(F.regexp_extract(blk, _DUR_FRAC_RE, 1), F.lit("")),
            F.lit("0"),
        ),
        3, "0",
    ).cast("long")
    return whole * F.lit(1000) + frac


def hls_segments(files: DataFrame, url_col: str = "url",
                 m3u8_col: str = "m3u8") -> DataFrame:
    """One row per media segment: (url, seg_idx, seg_url,
    duration_ms) — URIs resolved against the playlist URL, durations
    exact integer milliseconds."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    blocks = files.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(m3u8_col), F.lit(HLS_SEG_RE), F.lit(0))
        ).alias("seg_idx", "__blk"),
    )
    from dblp_crawler_spark.functions.urlnorm import resolvable_href

    b = F.col("__blk")
    uri = F.trim(F.regexp_extract(b, _URI_RE, 1))
    return blocks.where(resolvable_href(uri)).select(
        "url",
        F.col("seg_idx").cast("int").alias("seg_idx"),
        resolve_url("url", uri).alias("seg_url"),
        _extinf_ms(b).alias("duration_ms"),
    )


def hls_variants(files: DataFrame, url_col: str = "url",
                 m3u8_col: str = "m3u8") -> DataFrame:
    """One row per master-playlist variant: (url, variant_idx,
    variant_url, bandwidth, width, height)."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    blocks = files.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(m3u8_col), F.lit(HLS_VAR_RE), F.lit(0))
        ).alias("variant_idx", "__blk"),
    )
    from dblp_crawler_spark.functions.urlnorm import resolvable_href

    b = F.col("__blk")
    uri = F.trim(F.regexp_extract(b, _URI_RE, 1))
    return blocks.where(resolvable_href(uri)).select(
        "url",
        F.col("variant_idx").cast("int").alias("variant_idx"),
        resolve_url("url", uri).alias("variant_url"),
        F.nullif(F.regexp_extract(b, _BW_RE, 1), F.lit("")).cast("long")
        .alias("bandwidth"),
        F.nullif(F.regexp_extract(b, _RES_RE, 1), F.lit("")).cast("int")
        .alias("width"),
        F.nullif(F.regexp_extract(b, _RES_RE, 2), F.lit("")).cast("int")
        .alias("height"),
    )


def hls_playlist(files: DataFrame, url_col: str = "url",
                 m3u8_col: str = "m3u8") -> DataFrame:
    """Per-playlist routing summary: (url, kind, n_variants,
    max_bandwidth, n_segments, total_duration_ms, live).

    kind is 'master' when variant tags are present, 'media' when
    segment tags are, 'empty' otherwise (a master playlist never
    carries EXTINF lines per RFC 8216 §4.3.4.2, so the two are
    mutually exclusive in valid playlists; if both appear, variant
    tags win the routing — documented). live = media playlist
    WITHOUT EXT-X-ENDLIST: a VOD harvest must skip it. Aggregation
    is one projection over the playlist text — counts via the size
    of the same regexp_extract_all arrays the exploding extractors
    use, the duration sum an aggregate fold over the EXTINF
    fragments, no join back."""
    m = F.col(m3u8_col)
    segs = F.regexp_extract_all(m, F.lit(HLS_SEG_RE), F.lit(0))
    variants = F.regexp_extract_all(m, F.lit(HLS_VAR_RE), F.lit(0))
    bws = F.transform(
        F.regexp_extract_all(m, F.lit(HLS_VAR_RE), F.lit(0)),
        lambda b: F.nullif(F.regexp_extract(b, _BW_RE, 1), F.lit(""))
        .cast("long"),
    )
    total = F.aggregate(
        segs, F.lit(0).cast("long"), lambda acc, b: acc + _extinf_ms(b)
    )
    n_var = F.size(variants)
    n_seg = F.size(segs)
    kind = (
        F.when(n_var > 0, "master")
        .when(n_seg > 0, "media")
        .otherwise("empty")
    )
    is_media = (n_var == 0) & (n_seg > 0)
    return files.select(
        F.col(url_col).alias("url"),
        kind.alias("kind"),
        n_var.cast("int").alias("n_variants"),
        F.array_max(bws).alias("max_bandwidth"),
        n_seg.cast("int").alias("n_segments"),
        F.when(is_media, total).alias("total_duration_ms"),
        F.when(is_media, ~m.contains("#EXT-X-ENDLIST")).alias("live"),
    )


def _extinf_ms_sql(blk: str) -> str:
    return (
        f"TRY_CAST(regexp_extract({blk}, '{_DUR_INT_RE}', 1) AS BIGINT) * 1000"
        f" + TRY_CAST(rpad(COALESCE(NULLIF(regexp_extract({blk},"
        f" '{_DUR_FRAC_RE}', 1), ''), '0'), 3, '0') AS BIGINT)"
    )


def hls_segments_sql(src: str, url_col: str = "url",
                     m3u8_col: str = "m3u8") -> str:
    """DuckDB replay of :func:`hls_segments`."""
    from dblp_crawler_spark.functions.urlnorm import (
        resolvable_href_sql,
        resolve_url_sql,
    )

    return f"""
        WITH hs_b AS (
          SELECT {url_col} AS url, t.i - 1 AS seg_idx, t.blk
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({m3u8_col},
                          '{HLS_SEG_RE}', 0)) AS blk,
                        generate_subscripts(regexp_extract_all({m3u8_col},
                          '{HLS_SEG_RE}', 0), 1) AS i) t
        ), hs_u AS (
          SELECT url, seg_idx, blk,
                 trim(regexp_extract(blk, '{_URI_RE}', 1)) AS uri
          FROM hs_b
        )
        SELECT url, CAST(seg_idx AS INT) AS seg_idx,
               {resolve_url_sql('url', 'uri')} AS seg_url,
               {_extinf_ms_sql('blk')} AS duration_ms
        FROM hs_u WHERE {resolvable_href_sql('uri')}
    """


def hls_variants_sql(src: str, url_col: str = "url",
                     m3u8_col: str = "m3u8") -> str:
    """DuckDB replay of :func:`hls_variants`."""
    from dblp_crawler_spark.functions.urlnorm import (
        resolvable_href_sql,
        resolve_url_sql,
    )

    return f"""
        WITH hv_b AS (
          SELECT {url_col} AS url, t.i - 1 AS variant_idx, t.blk
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({m3u8_col},
                          '{HLS_VAR_RE}', 0)) AS blk,
                        generate_subscripts(regexp_extract_all({m3u8_col},
                          '{HLS_VAR_RE}', 0), 1) AS i) t
        ), hv_u AS (
          SELECT url, variant_idx, blk,
                 trim(regexp_extract(blk, '{_URI_RE}', 1)) AS uri
          FROM hv_b
        )
        SELECT url, CAST(variant_idx AS INT) AS variant_idx,
               {resolve_url_sql('url', 'uri')} AS variant_url,
               TRY_CAST(NULLIF(regexp_extract(blk, '{_BW_RE}', 1), '')
                        AS BIGINT) AS bandwidth,
               TRY_CAST(NULLIF(regexp_extract(blk, '{_RES_RE}', 1), '')
                        AS INT) AS width,
               TRY_CAST(NULLIF(regexp_extract(blk, '{_RES_RE}', 2), '')
                        AS INT) AS height
        FROM hv_u WHERE {resolvable_href_sql('uri')}
    """


def hls_playlist_sql(src: str, url_col: str = "url",
                     m3u8_col: str = "m3u8") -> str:
    """DuckDB replay of :func:`hls_playlist` — same counts from the
    same extract_all arrays, duration summed over the unnested
    EXTINF blocks via a correlated aggregate."""
    return f"""
        WITH hp_a AS (
          SELECT {url_col} AS url, {m3u8_col} AS m,
                 len(regexp_extract_all({m3u8_col}, '{HLS_VAR_RE}', 0))
                   AS n_var,
                 len(regexp_extract_all({m3u8_col}, '{HLS_SEG_RE}', 0))
                   AS n_seg,
                 (SELECT MAX(TRY_CAST(NULLIF(regexp_extract(b.blk,
                     '{_BW_RE}', 1), '') AS BIGINT))
                  FROM unnest(regexp_extract_all({m3u8_col},
                     '{HLS_VAR_RE}', 0)) b(blk)) AS max_bw,
                 COALESCE((SELECT SUM({_extinf_ms_sql('b.blk')})
                  FROM unnest(regexp_extract_all({m3u8_col},
                     '{HLS_SEG_RE}', 0)) b(blk)), 0) AS total_ms
          FROM {src}
        )
        SELECT url,
               CASE WHEN n_var > 0 THEN 'master'
                    WHEN n_seg > 0 THEN 'media' ELSE 'empty' END AS kind,
               CAST(n_var AS INT) AS n_variants,
               max_bw AS max_bandwidth,
               CAST(n_seg AS INT) AS n_segments,
               CASE WHEN n_var = 0 AND n_seg > 0
                    THEN CAST(total_ms AS BIGINT) END AS total_duration_ms,
               CASE WHEN n_var = 0 AND n_seg > 0
                    THEN NOT contains(m, '#EXT-X-ENDLIST') END AS live
        FROM hp_a
    """


# ---- alternate renditions (EXT-X-MEDIA) -------------------------------------------
#
# Master playlists declare alternate renditions — audio tracks and
# SUBTITLE tracks — as EXT-X-MEDIA lines with a LANGUAGE attribute
# and a URI pointing at the rendition's own media playlist. For a
# multilingual video-text corpus this is the discovery channel for
# caption tracks: the declaration tells you which languages exist
# BEFORE fetching anything, and the URI chain (master → subtitle
# media playlist → .vtt segments) is how the text is actually
# reached.

HLS_MEDIA_RE = r"#EXT-X-MEDIA:[^\n]*"
_ATTR_Q = '="([^"]*)"'
_MEDIA_TYPE_RE = r"TYPE=([A-Z-]+)"
_MEDIA_LANG_RE = r"LANGUAGE" + _ATTR_Q
_MEDIA_NAME_RE = r"NAME" + _ATTR_Q
_MEDIA_GROUP_RE = r"GROUP-ID" + _ATTR_Q
_MEDIA_URI_RE = r"URI" + _ATTR_Q
_MEDIA_DEFAULT_RE = r"DEFAULT=(YES|NO)"


def hls_media_renditions(files: DataFrame, url_col: str = "url",
                         m3u8_col: str = "m3u8") -> DataFrame:
    """One row per EXT-X-MEDIA rendition: (url, media_idx, type,
    group_id, name, language, is_default, rendition_url) —
    rendition_url resolved against the master playlist (NULL for
    URI-less entries: muxed audio declares no separate playlist)."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    blocks = files.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(m3u8_col), F.lit(HLS_MEDIA_RE), F.lit(0))
        ).alias("media_idx", "__blk"),
    )
    b = F.col("__blk")

    def attr(pat):
        return F.nullif(F.regexp_extract(b, pat, 1), F.lit(""))

    return blocks.select(
        "url",
        F.col("media_idx").cast("int").alias("media_idx"),
        attr(_MEDIA_TYPE_RE).alias("type"),
        attr(_MEDIA_GROUP_RE).alias("group_id"),
        attr(_MEDIA_NAME_RE).alias("name"),
        attr(_MEDIA_LANG_RE).alias("language"),
        (F.regexp_extract(b, _MEDIA_DEFAULT_RE, 1) == "YES")
        .alias("is_default"),
        resolve_url("url", attr(_MEDIA_URI_RE)).alias("rendition_url"),
    )


def hls_media_renditions_sql(src: str, url_col: str = "url",
                             m3u8_col: str = "m3u8") -> str:
    """DuckDB replay of :func:`hls_media_renditions`."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url_sql

    def attr(pat):
        p = pat.replace("'", "''")
        return f"NULLIF(regexp_extract(blk, '{p}', 1), '')"

    return f"""
        WITH hm_b AS (
          SELECT {url_col} AS url, t.i - 1 AS media_idx, t.blk
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({m3u8_col},
                          '{HLS_MEDIA_RE}', 0)) AS blk,
                        generate_subscripts(regexp_extract_all({m3u8_col},
                          '{HLS_MEDIA_RE}', 0), 1) AS i) t
        )
        SELECT url, CAST(media_idx AS INT) AS media_idx,
               {attr(_MEDIA_TYPE_RE)} AS type,
               {attr(_MEDIA_GROUP_RE)} AS group_id,
               {attr(_MEDIA_NAME_RE)} AS name,
               {attr(_MEDIA_LANG_RE)} AS language,
               regexp_extract(blk, '{_MEDIA_DEFAULT_RE}', 1) = 'YES'
                 AS is_default,
               {resolve_url_sql('url', attr(_MEDIA_URI_RE))} AS rendition_url
        FROM hm_b
    """
