"""WebVTT subtitle parsing — the TEXT half of video training pairs.

A crawler that fetches video also fetches its caption tracks
(YouTube exposes WebVTT, HLS carries it as segments, HTML5 <track>
points at .vtt files), and the cue timeline is the only alignment
between spoken language and pixels a curation pipeline gets without
running ASR. This module parses cue blocks into (cue_idx, start_ms,
end_ms, text) rows with pure regexp work — map-side, no UDF, one
posexplode per file — so a 10^9-cue corpus is a projection, not a
parse job.

Reference scope note: the reference crawls dblp XML pages only
(/root/reference/dblp_crawler/downloader.py:52-84); this source
exists for the video/text axes of the graft. The DuckDB fragment
lives beside the Spark expression (house rule) so the two evolve
together; every regex is RE2-safe (no lookaround, no backrefs).

Format notes pinned here and in the tests:
- timestamps are ``[hh:]mm:ss.mmm`` — hours optional and unbounded;
  minutes/seconds always two digits; milliseconds always three;
- a cue is the timing line (which may carry settings after the end
  timestamp — ``align:start position:0%`` — ignored) followed by
  payload lines up to the first BLANK line, which the lookahead-free
  ``(?:[^\\n]+\\n?)+`` can never cross;
- payload styling/voice tags (``<v Speaker>``, ``<i>``, ``<00:01:02>``
  karaoke stamps) strip to plain text; multi-line payloads join with
  a single space;
- cue identifier lines (an optional line BEFORE the timing line) are
  simply never matched — the block regex anchors at the timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: one WebVTT timestamp — optional hours, exactly mm:ss.mmm after
VTT_TS_RE = r"(?:\d+:)?\d{2}:\d{2}\.\d{3}"
#: a full cue block: timing line + payload lines up to a blank line
VTT_CUE_RE = (VTT_TS_RE + r"[ \t]*-->[ \t]*" + VTT_TS_RE
              + r"[^\n]*\n(?:[^\n]+\n?)+")
_START_RE = r"^((?:\d+:)?\d{2}:\d{2}\.\d{3})"
_END_RE = r"-->[ \t]*((?:\d+:)?\d{2}:\d{2}\.\d{3})"
_HOURS_RE = r"^(\d+):\d{2}:\d{2}\."
_MIN_RE = r"(\d{2}):\d{2}\."
_SEC_RE = r":(\d{2})\."
_MS_RE = r"\.(\d{3})"
_TAG_RE = r"<[^>]*>"


def _ts_ms(ts: Column) -> Column:
    """Exact integer milliseconds from a WebVTT timestamp string."""
    h = F.coalesce(
        F.nullif(F.regexp_extract(ts, _HOURS_RE, 1), F.lit("")).cast("long"),
        F.lit(0).cast("long"),
    )
    mm = F.regexp_extract(ts, _MIN_RE, 1).cast("long")
    ss = F.regexp_extract(ts, _SEC_RE, 1).cast("long")
    ms = F.regexp_extract(ts, _MS_RE, 1).cast("long")
    return h * F.lit(3600000) + mm * F.lit(60000) + ss * F.lit(1000) + ms


def webvtt_cues(files: DataFrame, vtt_col: str = "vtt",
                keep: list[str] | None = None) -> DataFrame:
    """One row per cue: (keep..., cue_idx, start_ms, end_ms, text).

    cue_idx is the 0-based order of appearance in the file (the
    alignment key scene_transcripts sorts on); start_ms/end_ms are
    exact integer milliseconds; text is the payload with styling
    tags stripped and internal newlines collapsed to single spaces.
    Files with no parseable cue contribute no rows."""
    keep = list(keep or ["video_id"])
    blocks = files.select(
        *keep,
        F.posexplode(
            F.regexp_extract_all(F.col(vtt_col), F.lit(VTT_CUE_RE), F.lit(0))
        ).alias("cue_idx", "__blk"),
    )
    b = F.col("__blk")
    payload = F.regexp_replace(b, r"^[^\n]*\n", "")
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(payload, _TAG_RE, ""), r"\n+", " "
        )
    )
    return blocks.select(
        *keep,
        F.col("cue_idx").cast("int").alias("cue_idx"),
        _ts_ms(F.regexp_extract(b, _START_RE, 1)).alias("start_ms"),
        _ts_ms(F.regexp_extract(b, _END_RE, 1)).alias("end_ms"),
        text.alias("text"),
    )


def _ts_ms_sql(expr: str) -> str:
    return (
        f"COALESCE(TRY_CAST(NULLIF(regexp_extract({expr}, '{_HOURS_RE}', 1), '')"
        f" AS BIGINT), 0) * 3600000"
        f" + TRY_CAST(regexp_extract({expr}, '{_MIN_RE}', 1) AS BIGINT) * 60000"
        f" + TRY_CAST(regexp_extract({expr}, '{_SEC_RE}', 1) AS BIGINT) * 1000"
        f" + TRY_CAST(regexp_extract({expr}, '{_MS_RE}', 1) AS BIGINT)"
    )


def webvtt_cues_sql(src: str, vtt_col: str = "vtt",
                    keep: str = "video_id") -> str:
    """DuckDB replay of :func:`webvtt_cues` — same block regex, same
    field extractions, same tag strip."""
    cue = VTT_CUE_RE.replace("'", "''")
    return f"""
        WITH vt_b AS (
          SELECT {keep}, t.i - 1 AS cue_idx, t.blk
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({vtt_col},
                          '{cue}', 0)) AS blk,
                        generate_subscripts(regexp_extract_all({vtt_col},
                          '{cue}', 0), 1) AS i) t
        )
        SELECT {keep}, CAST(cue_idx AS INT) AS cue_idx,
               {_ts_ms_sql(f"regexp_extract(blk, '{_START_RE}', 1)")} AS start_ms,
               {_ts_ms_sql(f"regexp_extract(blk, '{_END_RE}', 1)")} AS end_ms,
               trim(regexp_replace(regexp_replace(
                 regexp_replace(blk, '^[^\\n]*\\n', ''),
                 '{_TAG_RE}', '', 'g'), '\\n+', ' ', 'g')) AS text
        FROM vt_b
    """


# ---- SubRip (.srt) ----------------------------------------------------------------
#
# The other dominant subtitle format: numbered cues, COMMA decimal
# separator, hours mandatory, no header. Same output contract as
# webvtt_cues so scene_transcripts consumes either; declared cue
# numbers are ignored and cues renumbered by order of appearance
# (files in the wild skip and repeat numbers — position is the only
# trustworthy index).

SRT_CUE_RE = (r"\d{2}:\d{2}:\d{2},\d{3}[ \t]*-->[ \t]*"
              r"\d{2}:\d{2}:\d{2},\d{3}[^\n]*\n(?:[^\n]+\n?)+")
_SRT_START_RE = r"^(\d{2}):(\d{2}):(\d{2}),(\d{3})"
_SRT_END_RE = r"-->[ \t]*(\d{2}):(\d{2}):(\d{2}),(\d{3})"


def _srt_ms(blk: Column, pat: str) -> Column:
    h = F.regexp_extract(blk, pat, 1).cast("long")
    mm = F.regexp_extract(blk, pat, 2).cast("long")
    ss = F.regexp_extract(blk, pat, 3).cast("long")
    ms = F.regexp_extract(blk, pat, 4).cast("long")
    return h * F.lit(3600000) + mm * F.lit(60000) + ss * F.lit(1000) + ms


def srt_cues(files: DataFrame, srt_col: str = "srt",
             keep: list[str] | None = None) -> DataFrame:
    """One row per cue: (keep..., cue_idx, start_ms, end_ms, text) —
    the SRT twin of :func:`webvtt_cues`, byte-identical output
    contract."""
    keep = list(keep or ["video_id"])
    blocks = files.select(
        *keep,
        F.posexplode(
            F.regexp_extract_all(F.col(srt_col), F.lit(SRT_CUE_RE), F.lit(0))
        ).alias("cue_idx", "__blk"),
    )
    b = F.col("__blk")
    payload = F.regexp_replace(b, r"^[^\n]*\n", "")
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(payload, _TAG_RE, ""), r"\n+", " "
        )
    )
    return blocks.select(
        *keep,
        F.col("cue_idx").cast("int").alias("cue_idx"),
        _srt_ms(b, _SRT_START_RE).alias("start_ms"),
        _srt_ms(b, _SRT_END_RE).alias("end_ms"),
        text.alias("text"),
    )


def srt_cues_sql(src: str, srt_col: str = "srt",
                 keep: str = "video_id") -> str:
    """DuckDB replay of :func:`srt_cues`."""
    def ms(pat: str) -> str:
        return (
            f"TRY_CAST(regexp_extract(blk, '{pat}', 1) AS BIGINT) * 3600000"
            f" + TRY_CAST(regexp_extract(blk, '{pat}', 2) AS BIGINT) * 60000"
            f" + TRY_CAST(regexp_extract(blk, '{pat}', 3) AS BIGINT) * 1000"
            f" + TRY_CAST(regexp_extract(blk, '{pat}', 4) AS BIGINT)"
        )

    return f"""
        WITH sr_b AS (
          SELECT {keep}, t.i - 1 AS cue_idx, t.blk
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({srt_col},
                          '{SRT_CUE_RE}', 0)) AS blk,
                        generate_subscripts(regexp_extract_all({srt_col},
                          '{SRT_CUE_RE}', 0), 1) AS i) t
        )
        SELECT {keep}, CAST(cue_idx AS INT) AS cue_idx,
               {ms(_SRT_START_RE)} AS start_ms,
               {ms(_SRT_END_RE)} AS end_ms,
               trim(regexp_replace(regexp_replace(
                 regexp_replace(blk, '^[^\\n]*\\n', ''),
                 '{_TAG_RE}', '', 'g'), '\\n+', ' ', 'g')) AS text
        FROM sr_b
    """
