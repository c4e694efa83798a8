"""Offline summary-filter package (SURVEY.md F5) — re-exports the
DataFrame filter combinators so `from dblp_crawler_spark.filter
import *` mirrors the reference's `from dblp_crawler.filter import *`
(/root/reference/dblp_crawler/filter/__init__.py:1)."""

from ..operators.summarize import (  # noqa: F401
    drop_edges_by_all_publications,
    drop_nodes_by_all_publications,
    drop_old_cooperation,
    drop_old_person_publications,
)

__all__ = [
    "drop_edges_by_all_publications",
    "drop_nodes_by_all_publications",
    "drop_old_cooperation",
    "drop_old_person_publications",
]
