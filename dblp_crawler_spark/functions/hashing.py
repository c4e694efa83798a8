"""URL hashing + salted repartitioning (O6, SURVEY.md §2.7).

The reference's only host is dblp.org, so its global asyncio
semaphore IS its skew handler (downloader.py:25-27,68-69). At
10^10-URL scale a host-keyed partitioning would put nearly all fetch
work in one partition; the engine therefore:

  * keys BUDGET ACCOUNTING by host (scheduler window), but
  * keys FETCH/PARSE WORK by a salted 64-bit url hash, spreading the
    hot host over all executors ("hot hosts rebalanced explicitly",
    BASELINE.json north_rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_hash(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(u)


def salt_col(url: Column | str, buckets: int) -> Column:
    return F.pmod(url_hash(url), F.lit(buckets)).cast("int")


def salted_repartition(df: DataFrame, url_col: str = "url", buckets: int | None = None) -> DataFrame:
    """Spread rows uniformly by url hash regardless of host skew.

    Used before the fetch/parse (pandas-UDF) stage, which is
    host-agnostic CPU work; politeness was already enforced upstream
    on the host-keyed window, so rebalancing here cannot violate it.
    """
    n = buckets or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return df.repartition(int(n), salt_col(url_col, int(n)))
