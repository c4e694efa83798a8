"""Page-store freshness / TTL (SURVEY.md S5/S6).

The reference's HTTP cache is a filesystem of XML files with
mtime-based TTLs per URL class (/root/reference/dblp_crawler/
downloader.py:34-49,53-66): person pages 30 days, venue indexes 30
days, volume pages forever (-1). A stale entry is re-downloaded and
overwritten (downloader.py:78-80).

Here the page store is the lakehouse `pages` table with a
`fetched_at` column; TTL becomes a metadata-cheap filter and the
re-fetch set an anti-join — both partition-prunable on `kind` at
scale. The refresh write is `MERGE INTO pages` keyed on url
(Lakehouse.merge_upsert), the same write-through contract as the
reference's cache file replace.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference defaults (downloader.py:34-49; README.md:66-75)
DEFAULT_TTL_DAYS = {"person": 30, "journal_list": 30, "journal": -1}


def fresh_pages(pages: DataFrame, now: datetime, ttl_days: dict[str, int] | None = None) -> DataFrame:
    """Rows still inside their TTL (ttl -1 = forever). This is the
    cache-hit set: the fetch join reads only these."""
    ttl = {**DEFAULT_TTL_DAYS, **(ttl_days or {})}
    cond = F.lit(False)
    for kind, days in ttl.items():
        k = F.col("kind") == kind
        if days < 0:
            cond = cond | k
        else:
            cond = cond | (k & (F.col("fetched_at") >= F.lit(now) - F.expr(f"INTERVAL {days} DAYS")))
    return pages.filter(cond)


def stale_urls(pages: DataFrame, now: datetime, ttl_days: dict[str, int] | None = None) -> DataFrame:
    """(url, kind) rows whose cache entry expired — the re-fetch
    queue (reference: cache miss path, downloader.py:62-66)."""
    fresh = fresh_pages(pages, now, ttl_days).select("url")
    return pages.select("url", "kind").join(fresh, "url", "left_anti")


def refresh_pages(lake, new_rows: DataFrame) -> int:
    """Write-through refresh: MERGE the re-fetched rows over the
    stale ones, keyed on url (downloader.py:78-80 analog)."""
    from .. import schemas

    return lake.merge_upsert("pages", new_rows, ["url"], schemas.PAGES)
