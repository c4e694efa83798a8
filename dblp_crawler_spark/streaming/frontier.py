"""Streaming frontier admission: the batch admission chain
(canonicalize → trap-drop → seen-dedup) applied to an unbounded
candidate-URL stream.

A crawl DISCOVERS urls as a stream — parse workers emit hrefs
continuously — so admission runs incrementally rather than per-wave
batch re-scan. Canonicalization and trap triage are stateless
per-row expressions (functions/urlnorm), streaming-safe verbatim;
the only stateful step is first-spelling-wins dedup on the seen key,
which becomes Structured Streaming keyed state (`dropDuplicates`),
exactly the posture of streaming/documents.curate: one state row per
distinct resource (the streaming twin of the frontier's seen table),
or horizon-bounded state via `within_watermark` when re-discovery
beyond the window is acceptable to re-admit (the downstream exact
anti-join against the persistent seen table still guarantees no
double fetch — same EXACTNESS-NEVER-LOST layering as the bloom
bank).

`admit_stream` is one definition for both engines: on a batch
DataFrame it equals operators/frontier.admit_candidates up to the
dedup tiebreak (first arrival vs min-url — both deterministic given
an arrival order); on a readStream it runs under any trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def admit_stream(
    candidates: DataFrame,
    url_col: str = "url",
    max_depth: int = 8,
    hash_fn=None,
    within_watermark: str | None = None,
) -> DataFrame:
    """Raw candidate hrefs (streaming or batch) → admitted
    (url, host, seen_key) rows, first spelling wins per resource."""
    from ..functions.hashing import xx64
    from ..functions.urlnorm import canonical_url, url_host, url_trap_flags

    h = hash_fn or xx64
    canon = candidates.withColumn("__curl", canonical_url(F.col(url_col)))
    clean = canon.filter(~url_trap_flags("__curl", max_depth=max_depth)["is_trap"])
    keyed = clean.withColumn("seen_key", h(F.col("__curl")))
    if within_watermark is not None:
        deduped = keyed.dropDuplicatesWithinWatermark(["seen_key"])
    else:
        deduped = keyed.dropDuplicates(["seen_key"])
    return deduped.select(
        F.col("__curl").alias("url"),
        url_host("__curl").alias("host"),
        "seen_key",
    )


def discover_feeds(pages, within_watermark: str | None = None,
                   xml_col: str = "feed_xml"):
    """Streaming feed discovery: RSS/Atom pages arrive continuously
    (feeds are THE push channel — a news host's new URLs appear in
    its feed minutes after publish) and each page's entries must join
    the frontier exactly once. `feed_entries` is a stateless
    projection (regexps + one explode), so it is streaming-safe
    verbatim; the only stateful step is the per-URL seen set, which
    is Structured Streaming keyed state (`dropDuplicates` on url —
    first arrival wins; pass ``within_watermark`` to bound state when
    re-announcements only repeat within a horizon, the same trade as
    the curation dedup).

    One definition for both engines: on a batch DataFrame it equals
    batch feed_entries + dedup; on a readStream it runs incrementally
    under any trigger and the seen state persists across restarts via
    the checkpoint."""
    from ..sources.webparse import feed_entries

    ent = feed_entries(pages, xml_col=xml_col)
    if within_watermark is not None:
        return ent.dropDuplicatesWithinWatermark(["url"])
    return ent.dropDuplicates(["url"])


def monitor_live_segments(playlists, within_watermark: str | None = None,
                          url_col: str = "url", m3u8_col: str = "m3u8"):
    """Streaming live-HLS monitor: a live media playlist is re-fetched
    on a cadence and each fetch repeats most of its segment list with
    a few NEW segments appended at the tail (the sliding window RFC
    8216 prescribes for live). The harvest must emit each segment
    exactly once across those re-fetches — segment extraction
    (hls_segments) is a stateless projection, streaming-safe
    verbatim, and the once-only guarantee is keyed state on
    (playlist, segment URL), the same layering as admit_stream /
    discover_feeds. ``within_watermark`` bounds state when a live
    window can only repeat a segment within a horizon (true for
    real live streams, where the window slides forward
    monotonically).

    One definition for both engines: on a batch DataFrame it equals
    hls_segments + dedup; on a readStream it runs under any trigger
    with the seen state in the checkpoint."""
    from ..sources.hls import hls_segments

    segs = hls_segments(playlists, url_col=url_col, m3u8_col=m3u8_col)
    if within_watermark is not None:
        return segs.dropDuplicatesWithinWatermark(["url", "seg_url"])
    return segs.dropDuplicates(["url", "seg_url"])
