"""Offline summary-filter package (SURVEY.md F5) — re-exports the
DataFrame filter combinators so `from dblp_crawler_spark.filter
import *` mirrors the reference's `from dblp_crawler.filter import *`
(/root/reference/dblp_crawler/filter/__init__.py:1), and adds the
GENERIC extension point the reference exposes through
`map_node/map_edge/map_person_publications/map_cooperation`
(filter/utils.py:13-77):

  * Spark combinators with the same semantics, taking a Column
    predicate over the joined publication (or node/edge) columns
    instead of a per-row Python callback — the whole transform stays
    a DataFrame plan (explode → semi/inner join → regroup), no
    Python in the row loop;
  * a name → transform REGISTRY (`register_filter`) the filter CLI
    resolves `-f name=value` specs against. Users ship transforms as
    an importable module (CLI `--filter-module`), registered by
    name — the reference's `-f "importlib...."` workflow without
    eval'ing argument strings as code.

A registered transform is `(sn, se, sp, raw_arg) -> (sn, se, sp)`
where raw_arg is the text after '=' in the spec ('' when absent).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    "map_node",
    "map_edge",
    "map_person_publications",
    "map_cooperation",
    "register_filter",
    "resolve_filter",
    "FILTER_REGISTRY",
]

FilterFn = Callable[[DataFrame, DataFrame, DataFrame, str], tuple]

FILTER_REGISTRY: dict[str, FilterFn] = {}


def register_filter(name: str) -> Callable[[FilterFn], FilterFn]:
    """Register a named summary transform for the filter CLI.

    >>> @register_filter("my_recent_only")
    ... def my_recent_only(sn, se, sp, arg):
    ...     sn = map_person_publications(sn, sp, F.col("year") >= int(arg))
    ...     return sn, se, sp
    """

    def deco(fn: FilterFn) -> FilterFn:
        FILTER_REGISTRY[name] = fn
        return fn

    return deco


def resolve_filter(name: str) -> FilterFn:
    try:
        return FILTER_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown filter {name!r}; known: {sorted(FILTER_REGISTRY)}"
        ) from None


# ---- generic combinators (reference filter/utils.py:13-77) ---------------
def map_person_publications(sn: DataFrame, publications: DataFrame, keep: Column) -> DataFrame:
    """map_person_publications (utils.py:40-54): prune each node's
    selected-pub list to publications satisfying `keep` (a Column
    over the publication's columns). Keys absent from the summary's
    publication table drop, as in the reference. One explode + one
    semi-join + one regroup — list order is canonical (sorted), the
    summary contract."""
    keys = publications.filter(keep).select("key")
    expl = sn.select("pid", F.explode("selected_pubs").alias("key")).join(keys, "key", "left_semi")
    regrouped = expl.groupBy("pid").agg(F.array_sort(F.collect_set("key")).alias("selected_pubs"))
    return (
        sn.drop("selected_pubs")
        .join(regrouped, "pid", "left")
        .withColumn("selected_pubs", F.coalesce("selected_pubs", F.array()))
    )


def map_cooperation(se: DataFrame, publications: DataFrame, keep: Column) -> DataFrame:
    """map_cooperation (utils.py:62-77): prune each edge's
    cooperation list to publications satisfying `keep`."""
    keys = publications.filter(keep).select("key")
    expl = se.select("src", "dst", F.explode("cooperation").alias("key")).join(keys, "key", "left_semi")
    regrouped = expl.groupBy("src", "dst").agg(F.array_sort(F.collect_set("key")).alias("cooperation"))
    return (
        se.drop("cooperation")
        .join(regrouped, ["src", "dst"], "left")
        .withColumn("cooperation", F.coalesce("cooperation", F.array()))
    )


def map_node(sn: DataFrame, se: DataFrame, keep: Column) -> tuple[DataFrame, DataFrame]:
    """map_node (utils.py:22-29): keep nodes satisfying `keep`; edges
    survive only if BOTH endpoints survive (the dangling-edge
    invariant, J9)."""
    kept = sn.filter(keep)
    kept_ids = kept.select("pid")
    se2 = (
        se.join(kept_ids.withColumnRenamed("pid", "src"), "src", "left_semi")
        .join(kept_ids.withColumnRenamed("pid", "dst"), "dst", "left_semi")
    )
    return kept, se2


def map_edge(se: DataFrame, keep: Column) -> DataFrame:
    """map_edge (utils.py:57-59): keep edges satisfying `keep`."""
    return se.filter(keep)


# ---- built-ins, registered through the same hook -------------------------
def _int_arg(name: str, raw: str) -> int:
    try:
        return int(raw)
    except ValueError:
        raise ValueError(f"filter {name!r} needs an integer argument, got {raw!r}") from None


@register_filter("drop_old_person_publications")
def _f_old_person_pubs(sn, se, sp, raw):
    return drop_old_person_publications(sn, sp, _int_arg("drop_old_person_publications", raw)), se, sp


@register_filter("drop_old_cooperation")
def _f_old_coop(sn, se, sp, raw):
    return sn, drop_old_cooperation(se, sp, _int_arg("drop_old_cooperation", raw)), sp


@register_filter("drop_nodes_by_all_publications")
def _f_drop_nodes(sn, se, sp, raw):
    sn2, se2 = drop_nodes_by_all_publications(sn, se, _int_arg("drop_nodes_by_all_publications", raw))
    return sn2, se2, sp


@register_filter("drop_edges_by_all_publications")
def _f_drop_edges(sn, se, sp, raw):
    return sn, drop_edges_by_all_publications(se, _int_arg("drop_edges_by_all_publications", raw)), sp
