"""CCF catalog ingest — the data half of the S12 dimension.

The reference ships ranked venue lists extracted from the CCF
recommendation PDF plus the url→journal-key rule that turns a catalog
line into a dblp key (/root/reference/dblp_crawler/data/ccf/key.py:10-28,
parse.py): a catalog line ends in a dblp URL (often with spaces
injected by PDF text extraction), and the key is the first three path
segments under the dblp host, e.g. ``db/journals/tocs``.

This module reimplements that extraction as Spark expressions over a
user-supplied catalog file (one line per venue, the reference's line
format) — no data files are copied; users feed their own catalog.
The result lands in the ``ccf_rank`` lakehouse dimension that
`operators.frontier.with_ccf` broadcast-joins (P7) and the T3
priority consumes (top 16 bits of the pop priority).

Scale posture: the catalog is a few thousand lines — a single-task
read and a broadcast-size dimension. The only care is idempotence:
ingest MERGEs on journal_key (keyed table, last-writer-wins), so
re-running with a corrected catalog updates ranks in place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..lakehouse import Lakehouse

# rank precedence for conflict resolution WITHIN one ingest: a venue
# listed under two ranks keeps the best (the reference's lists are
# disjoint; user-merged catalogs may not be)
_RANK_ORDER = {"A": 0, "B": 1, "C": 2}


def parse_catalog_lines(lines: DataFrame, rank: str) -> DataFrame:
    """(journal_key, rank) from a DataFrame of raw catalog lines
    (column ``value`` — what ``spark.read.text`` yields).

    Mirrors the reference rule exactly (key.py:10-18): exactly one
    ``https?://...`` tail, spaces stripped (PDF artifacts), host must
    be dblp, key = first three path segments. Non-matching lines are
    dropped, as in the reference's ``filter(None, ...)``.
    """
    url = F.regexp_extract(F.col("value"), r"(https?://\S.*)$", 1)
    url = F.replace(url, F.lit(" "), F.lit(""))
    path = F.regexp_extract(url, r"https?://dblp\.uni-trier\.de/(.+)$", 1)
    key = F.substring_index(path, "/", 3)
    return (
        lines.select(key.alias("journal_key"))
        .filter(F.col("journal_key") != "")
        .distinct()
        .withColumn("rank", F.lit(rank))
    )


def build_ccf_dim(
    spark: SparkSession,
    lake: Lakehouse,
    catalog_paths: dict[str, str],
    extra_keys: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Ingest rank→catalog-file mappings (plus optional manual
    (rank, journal_key) additions — the reference hand-patches four
    CCF-B keys the same way, key.py:23-28) into the ``ccf_rank``
    table. Returns the resolved dimension."""
    parts = []
    for rank, path in catalog_paths.items():
        if rank not in _RANK_ORDER:
            raise ValueError(f"unknown CCF rank {rank!r} (expected one of {sorted(_RANK_ORDER)})")
        parts.append(parse_catalog_lines(spark.read.text(path), rank))
    for rank, key in extra_keys or []:
        if rank not in _RANK_ORDER:
            raise ValueError(f"unknown CCF rank {rank!r}")
        parts.append(
            spark.createDataFrame([(key, rank)], "journal_key string, rank string")
        )
    if not parts:
        raise ValueError("no catalog inputs")
    allranks = parts[0]
    for p in parts[1:]:
        allranks = allranks.unionByName(p)
    # best rank wins per key (min_by over the precedence order)
    order = F.when(F.col("rank") == "A", 0).when(F.col("rank") == "B", 1).otherwise(2)
    dim = (
        allranks.withColumn("__o", order)
        .groupBy("journal_key")
        .agg(F.min_by("rank", F.col("__o")).alias("rank"))
    )
    lake.merge_upsert("ccf_rank", dim, ["journal_key"], schemas.CCF_RANK)
    return lake.read("ccf_rank")
