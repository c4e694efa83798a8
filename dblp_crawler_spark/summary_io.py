"""Legacy-JSON summary sink + source (SURVEY.md S7/S9).

The reference writes one nested JSON document (json.dump,
/root/reference/dblp_crawler/__main__.py:88-91; format documented in
its README.md:94-167) and the offline filter tool reads it back with
json.load (/root/reference/dblp_crawler/filter/__main__.py:16-17).

The summary is the human-facing artifact — orders of magnitude
smaller than the crawl tables (it only covers edge-incident persons)
— so serialization is driver-side by design; the distributed work
happened in operators/summarize.py. Reading back materializes the
three DataFrames under the engine's explicit schemas so the offline
filter API (summarize.py F5 filters) composes with files produced by
either this engine or the reference.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .operators.summarize import dict_summary

SUMMARY_NODES = StructType(
    [
        StructField("pid", StringType(), False),
        StructField("label", StringType(), True),
        StructField("affiliations", ArrayType(StringType()), True),
        StructField("all_pubs", ArrayType(StringType()), True),
        StructField("selected_pubs", ArrayType(StringType()), True),
    ]
)

SUMMARY_EDGES = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("publications", ArrayType(StringType()), True),
        StructField("cooperation", ArrayType(StringType()), True),
    ]
)

SUMMARY_AUTHOR = StructType(
    [
        StructField("pid", StringType(), True),
        StructField("name", StringType(), True),
        StructField("orcid", StringType(), True),
    ]
)

SUMMARY_PUBLICATIONS = StructType(
    [
        StructField("key", StringType(), False),
        StructField("title", StringType(), True),
        StructField("title_hash", StringType(), True),
        StructField("journal", StringType(), True),
        StructField("journal_key", StringType(), True),
        StructField("year", IntegerType(), True),
        StructField("mdate", StringType(), True),
        StructField("doi", StringType(), True),
        StructField("ccf", StringType(), True),
        StructField("authors", ArrayType(SUMMARY_AUTHOR), True),
        StructField("selected", BooleanType(), False),
    ]
)


def write_summary_json(
    path: str, nodes: DataFrame, edges: DataFrame, publications: DataFrame
) -> dict:
    """S7: assemble the legacy document and json.dump it (indent=2,
    exactly like __main__.py:88-91). Returns the dict for callers
    that want both."""
    doc = dict_summary(nodes, edges, publications)
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    return doc


def summary_doc_from_frames(
    nodes: DataFrame, edges: DataFrame, publications: DataFrame
) -> dict:
    """Assemble the legacy document from already-summarized frames
    (the SUMMARY_* schemas of read_summary_json) — the write side of
    the offline filter pipeline (filter/__main__.py:18-22): load →
    filter DataFrames → dump. Driver-side like the reference's
    json.dump; the summary is small by construction."""
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
        for r in nodes.collect()
    }
    out_edges = {
        json.dumps({"from": r.src, "to": r.dst}): {
            "from": r.src,
            "to": r.dst,
            "publications": list(r.publications or []),
            "cooperation": list(r.cooperation or []),
        }
        for r in edges.collect()
    }
    out_pubs = {}
    for r in publications.collect():
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
                a.pid: {"dblp_pid": a.pid, "name": a.name, "orcid": a.orcid}
                for a in (r.authors or [])
            },
        }
        if r.selected:
            out_pubs[r.key]["selected"] = True
    return {"nodes": out_nodes, "edges": out_edges, "publications": out_pubs}


def read_summary_json(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """S9: load a legacy summary document into the three result
    DataFrames under explicit schemas (filter/__main__.py:16-17
    equivalent; works on files from this engine or the reference)."""
    with open(path) as f:
        doc = json.load(f)
    node_rows = [
        (
            n["id"],
            n.get("label"),
            list(n.get("person", {}).get("affiliations", [])),
            list(n.get("person", {}).get("publications", [])),
            list(n.get("publications", [])),
        )
        for n in doc.get("nodes", {}).values()
    ]
    edge_rows = [
        (
            e["from"],
            e["to"],
            list(e.get("publications", [])),
            list(e.get("cooperation", [])),
        )
        for e in doc.get("edges", {}).values()
    ]
    pub_rows = [
        (
            p["dblp_key"],
            p.get("title"),
            p.get("title_hash"),
            p.get("journal"),
            p.get("journal_key"),
            p.get("year"),
            p.get("mdate"),
            p.get("doi"),
            p.get("ccf"),
            [
                (a.get("dblp_pid"), a.get("name"), a.get("orcid"))
                for a in p.get("authors", {}).values()
            ],
            bool(p.get("selected", False)),
        )
        for p in doc.get("publications", {}).values()
    ]
    return (
        spark.createDataFrame(node_rows, SUMMARY_NODES),
        spark.createDataFrame(edge_rows, SUMMARY_EDGES),
        spark.createDataFrame(pub_rows, SUMMARY_PUBLICATIONS),
    )
