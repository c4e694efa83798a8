"""Anchor-text aggregation over the crawl's link graph.

When a crawler stores outlinks, the anchor text of a link describes
the TARGET page better than the target's own content (the classic
web-indexing signal: Brin & Page 1998 §2.2 treat anchor text as part
of the linked page's index entry). The reference crawls a single
site and keeps no outlink text; a web-scale frontier that already
materializes (src, dst, anchor) rows gets target descriptions and a
ranking feature almost for free with this operator.

Scale shape: one explode (anchor → terms, map-side), then a
(dst, term) hash aggregation carrying both the raw link count and
the count of DISTINCT linking pages (one spammy page repeating a
link 10^6 times still counts once in n_srcs), then a dst-keyed
window group limit for the per-target top-k — Spark plans rank<=k as
WindowGroupLimit (per-partition top-k heaps, no full per-dst sort).
All shuffles are keyed equi-exchanges; nothing all-pairs. Counts are
exact integers, tie-break lexicographic — engine-portable verdicts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_all


def anchor_terms(links: DataFrame, anchor_col: str = "anchor",
                 max_terms: int = 8) -> DataFrame:
    """Explode each link's anchor string into its first `max_terms`
    tokens (anchors are short; the cap bounds adversarial keyword-
    stuffed anchors). One map-side projection, no shuffle."""
    toks = F.slice(tokens_all(F.col(anchor_col)), 1, int(max_terms))
    return links.withColumn("term", F.explode(toks)).drop(anchor_col)


def anchor_text_topk(links: DataFrame, k: int = 3, dst_col: str = "dst",
                     src_col: str = "src", term_col: str = "term") -> DataFrame:
    """Per-target top-k anchor terms from (src, dst, term) rows.

    Rank by (n_srcs DESC, n_links DESC, term ASC): distinct linking
    pages first (link-spam resistant), raw link count second,
    lexicographic tie-break for determinism.

    Returns (dst, term, n_links, n_srcs, rk) with rk <= k.
    """
    per = links.groupBy(dst_col, term_col).agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct(src_col).alias("n_srcs"),
    )
    w = Window.partitionBy(dst_col).orderBy(
        F.desc("n_srcs"), F.desc("n_links"), F.asc(term_col)
    )
    return per.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= int(k))
