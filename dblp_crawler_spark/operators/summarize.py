"""Summary queries — the reference's networkx collapse + JSON sink
(summarizer/networkx.py:39-96) as DataFrame aggregations, plus the
offline filter API (filter/__init__.py, filter/utils.py).

Reference semantics reproduced exactly:
  * only persons incident to ≥1 co-authorship edge appear as summary
    nodes (graph_summary builds its node set from edge endpoints,
    networkx.py:44-59);
  * a node's `publications` = pubs on its INCIDENT EDGES (A3,
    networkx.py:50-57);
  * parallel edges collapse to one (src,dst) with the pub-key set
    (A4, networkx.py:39-57);
  * edge `cooperation` = intersection of the two persons' FULL
    page pub-key lists (J6, networkx.py:19-22);
  * `publications` map = edge pubs (selected=True) ∪ every pub of
    every summary node's person (selected=False when not an edge
    pub) (A5, networkx.py:70-96).

All aggregations are partial+final hash aggs (collect_set) keyed by
pid or (src,dst) — shuffle once per agg; the pair space is sparse, so
no skew handling is needed beyond AQE.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame) -> DataFrame:
    """Edges are stored canonically (src<dst); expose both incidences."""
    return edges.select("src", "dst", "pub_key").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "pub_key")
    )


def summary_nodes(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A3: per edge-incident person, the sorted set of edge pubs."""
    incident = _undirected(edges).groupBy(F.col("src").alias("pid")).agg(
        F.array_sort(F.collect_set("pub_key")).alias("selected_pubs")
    )
    return incident.join(nodes, "pid", "inner").select(
        "pid",
        F.col("name").alias("label"),
        "affiliations",
        F.col("pub_keys").alias("all_pubs"),
        "selected_pubs",
    )


def summary_edges(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A4 collapse + J6 cooperation."""
    collapsed = edges.groupBy("src", "dst").agg(F.array_sort(F.collect_set("pub_key")).alias("publications"))
    nk = nodes.select("pid", "pub_keys")
    return (
        collapsed.join(nk.withColumnsRenamed({"pid": "src", "pub_keys": "src_pubs"}), "src")
        .join(nk.withColumnsRenamed({"pid": "dst", "pub_keys": "dst_pubs"}), "dst")
        .select(
            "src",
            "dst",
            "publications",
            F.array_sort(F.array_intersect("src_pubs", "dst_pubs")).alias("cooperation"),
        )
    )


def summary_publications(nodes: DataFrame, edges: DataFrame, publications: DataFrame) -> DataFrame:
    """A5: edge pubs selected=True ∪ summary-node page pubs."""
    edge_keys = edges.select(F.col("pub_key").alias("key")).distinct()
    node_pub_keys = (
        summary_nodes(nodes, edges)
        .select(F.explode("all_pubs").alias("key"))
        .distinct()
    )
    wanted = edge_keys.withColumn("selected", F.lit(True)).unionByName(
        node_pub_keys.join(edge_keys, "key", "left_anti").withColumn("selected", F.lit(False))
    )
    return publications.drop("selected").join(wanted, "key", "inner")


def dict_summary(nodes: DataFrame, edges: DataFrame, publications: DataFrame) -> dict:
    """Legacy-JSON assembly (README.md:94-167 format; edge keys are
    json.dumps({'from':u,'to':v}) per networkx.py:89). Driver-side by
    design: the summary is the human-facing artifact, orders of
    magnitude smaller than the crawl tables; the heavy work happened
    in the aggregations above."""
    sn = summary_nodes(nodes, edges).collect()
    se = summary_edges(nodes, edges).collect()
    sp = summary_publications(nodes, edges, publications).collect()
    out_nodes = {
        r.pid: {
            "id": r.pid,
            "label": r.label,
            "person": {
                "dblp_pid": r.pid,
                "name": r.label,
                "affiliations": list(r.affiliations or []),
                "publications": list(r.all_pubs or []),
            },
            "publications": list(r.selected_pubs or []),
        }
        for r in sn
    }
    out_edges = {
        json.dumps({"from": r.src, "to": r.dst}): {
            "from": r.src,
            "to": r.dst,
            "publications": list(r.publications or []),
            "cooperation": list(r.cooperation or []),
        }
        for r in se
    }
    out_pubs = {}
    for r in sp:
        out_pubs[r.key] = {
            "dblp_key": r.key,
            "title": r.title,
            "title_hash": r.title_hash,
            "journal": r.journal,
            "journal_key": r.journal_key,
            "year": r.year,
            "mdate": r.mdate,
            "doi": r.doi,
            "ccf": r.ccf,
            "authors": {
                a.pid: {"dblp_pid": a.pid, "name": a.name, "orcid": a.orcid} for a in (r.authors or [])
            },
        }
        if r.selected:
            out_pubs[r.key]["selected"] = True
    return {"nodes": out_nodes, "edges": out_edges, "publications": out_pubs}


# ---- offline filter API (F5: filter/__init__.py, filter/utils.py) --------
def drop_old_person_publications(sn: DataFrame, publications: DataFrame, year: int) -> DataFrame:
    """drop_old_person_publications (filter/__init__.py:4-9): prune a
    node's selected pubs to those with year >= Y."""
    keep = publications.filter(F.col("year") >= year).select("key")
    expl = sn.select("pid", F.explode("selected_pubs").alias("key")).join(keep, "key", "left_semi")
    regrouped = expl.groupBy("pid").agg(F.array_sort(F.collect_set("key")).alias("selected_pubs"))
    return (
        sn.drop("selected_pubs")
        .join(regrouped, "pid", "left")
        .withColumn("selected_pubs", F.coalesce("selected_pubs", F.array()))
    )


def drop_old_cooperation(se: DataFrame, publications: DataFrame, year: int) -> DataFrame:
    """drop_old_cooperation (filter/__init__.py:12-17)."""
    keep = publications.filter(F.col("year") >= year).select("key")
    expl = se.select("src", "dst", F.explode("cooperation").alias("key")).join(keep, "key", "left_semi")
    regrouped = expl.groupBy("src", "dst").agg(F.array_sort(F.collect_set("key")).alias("cooperation"))
    return (
        se.drop("cooperation")
        .join(regrouped, ["src", "dst"], "left")
        .withColumn("cooperation", F.coalesce("cooperation", F.array()))
    )


def drop_nodes_by_all_publications(sn: DataFrame, se: DataFrame, n: int) -> tuple[DataFrame, DataFrame]:
    """drop_nodes_by_all_publications (filter/__init__.py:20-25) +
    the dangling-edge invariant (filter/utils.py:25-28, J9): edges
    survive only if BOTH endpoints survive."""
    kept = sn.filter(F.size("all_pubs") >= n)
    kept_ids = kept.select("pid")
    se2 = (
        se.join(kept_ids.withColumnRenamed("pid", "src"), "src", "left_semi")
        .join(kept_ids.withColumnRenamed("pid", "dst"), "dst", "left_semi")
    )
    return kept, se2


def drop_edges_by_all_publications(se: DataFrame, n: int) -> DataFrame:
    """drop_edges_by_all_publications (filter/__init__.py:28-33)."""
    return se.filter(F.size("cooperation") >= n)
