"""XML page parsing (SURVEY.md P8/P10/P14, S2-S4 payload shape).

The reference consumes dblp.org XML via ElementTree accessors
(/root/reference/dblp_crawler/parser.py, journal.py); this module
parses the same documents into the engine's typed page structs
(schemas.PERSON_PAYLOAD / JOURNAL_LIST_PAYLOAD / JOURNAL_PAYLOAD).

Execution model: Arrow-batched `mapInPandas` with stdlib ElementTree
inside each batch — the same vectorized-payload template as the image
decode stage (operators/multimodal.py). XML with mixed-content titles
(`<title>Video <i>super</i> resolution</title>`, parser.py:75-78
joins itertext with spaces) cannot be expressed faithfully with
`F.from_xml`'s field model, so the parse is payload work, not
expression work; everything downstream of the parse is native
DataFrame expressions.

Semantics reproduced exactly (citations into /root/reference):
  * person pid/name from attributes with Unknown_%s/Unname_%s
    fallback (parser.py:162-166) — made DETERMINISTIC by deriving the
    suffix from crc32(url) instead of a class counter (the reference
    counter is instance-order-dependent, i.e. nondeterministic under
    its own asyncio scheduling; crawl-order reproducibility requires
    a stable id — SURVEY.md P14);
  * affiliations from person/note[@type='affiliation'] text
    (parser.py:27-31);
  * publications from <r> first children: key/mdate attrs, title =
    " ".join(itertext) (P8, parser.py:75-78), year int
    (parser.py:102-105), url text, ee texts (parser.py:110-115),
    journal name via the per-type tag table (P9, parser.py:83-94),
    authors (pid attr, text name or '', orcid attr, parser.py:34-46);
  * journal volume pages: ./dblpcites/r publication list
    (journal.py:12-18);
  * venue index pages: title attr, ./h1 text, ./ul/li/ref hrefs, and
    ./dblpcites/r/proceedings (booktitle, url) rows — the
    workshop-skip/`.html`-strip filters (P11/P12) stay in the engine
    (plans/crawl.py), not the parser, mirroring journal.py:29-38.
"""

from __future__ import annotations

import zlib
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from .. import schemas

_JOURNAL_TAG = {  # parser.py:84-90
    "inproceedings": "booktitle",
    "proceedings": "booktitle",
    "article": "journal",
    "incollection": "booktitle",
    "book": "series",
}


def _pub_dict(r: ET.Element) -> dict | None:
    """<r> wrapper → PUB-struct dict (parser.py:62-115)."""
    if len(r) == 0:
        return None
    el = r[0]
    title = None
    year = None
    url = None
    journal = None
    ee: list[str] = []
    authors: list[dict] = []
    for child in el:
        tag = child.tag
        if tag == "title":
            title = " ".join(t for t in child.itertext())  # P8
        elif tag == "year":
            year = int(child.text) if child.text is not None else None
        elif tag == "url":
            url = child.text
        elif tag == "ee":
            if child.text is not None:
                ee.append(child.text)
        elif tag == "author":
            authors.append(
                {
                    "pid": child.attrib["pid"],
                    "name": child.text if child.text is not None else "",
                    "orcid": child.attrib.get("orcid"),
                }
            )
        elif tag == _JOURNAL_TAG.get(el.tag):
            journal = child.text
    return {
        "key": el.attrib["key"],
        "type": el.tag,
        "title": title,
        "year": year,
        "mdate": el.attrib.get("mdate"),
        "url": url,
        "ee": ee,
        "journal": journal,
        "authors": authors,
        "image_id": None,  # not part of dblp XML; linked later from the images table
    }


def _person_dict(body: str, url: str) -> dict:
    root = ET.fromstring(body)
    assert root.tag == "dblpperson", "Should be xml of a dblpperson!"
    # P14: deterministic fallback ids (reference: class counter,
    # parser.py:153,159-166)
    fallback = zlib.crc32(url.encode()) & 0xFFFFFFFF
    pid = root.attrib.get("pid", f"Unknown_{fallback}")
    name = root.attrib.get("name", f"Unname_{fallback}")
    affiliations: list[str] = []
    for person in root.iter("person"):
        for note in person:
            if (
                note.tag == "note"
                and note.attrib.get("type") == "affiliation"
                and note.text is not None
            ):
                affiliations.append(note.text)
        break
    pubs = [d for d in (_pub_dict(r) for r in root if r.tag == "r") if d is not None]
    return {"pid": pid, "name": name, "affiliations": affiliations, "pubs": pubs}


def _journal_dict(body: str) -> dict:
    root = ET.fromstring(body)
    assert root.tag == "bht", "Should be xml of a bht!"
    pubs = [d for d in (_pub_dict(r) for r in root.findall("./dblpcites/r")) if d is not None]
    return {"pubs": pubs}


def _journal_list_dict(body: str) -> dict:
    root = ET.fromstring(body)
    assert root.tag == "bht", "Should be xml of a bht!"
    h1 = root.find("./h1")
    procs = [
        {
            "booktitle": (p.find("./booktitle").text if p.find("./booktitle") is not None else None),
            "url": (p.find("./url").text if p.find("./url") is not None else None),
        }
        for p in root.findall("./dblpcites/r/proceedings")
    ]
    return {
        "title": root.attrib.get("title"),
        "h1": h1.text if h1 is not None else None,
        "refs": [li.attrib["href"] for li in root.findall("./ul/li/ref")],
        "proceedings": procs,
    }


def _parser(kind: str, payload_schema) -> tuple:
    fn = {"person": _person_dict, "journal": _journal_dict, "journal_list": _journal_list_dict}[kind]
    out_schema = StructType(
        [StructField("url", StringType(), False), StructField("payload", payload_schema, True)]
    )
    return fn, out_schema


def parse_pages_xml(raw: DataFrame, kind: str) -> DataFrame:
    """(url, body) → (url, payload struct) for the given page kind.
    Malformed documents yield payload NULL (the reference lets the
    fetch fail and retries, downloader.py:75-76 / graph.py:89-99)."""
    fn, out_schema = _parser(
        kind,
        {
            "person": schemas.PERSON_PAYLOAD,
            "journal": schemas.JOURNAL_PAYLOAD,
            "journal_list": schemas.JOURNAL_LIST_PAYLOAD,
        }[kind],
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, payloads = [], []
            for url, body in zip(pdf["url"], pdf["body"]):
                urls.append(url)
                try:
                    payloads.append(fn(body, url) if kind == "person" else fn(body))
                except Exception:
                    payloads.append(None)
            yield pd.DataFrame({"url": urls, "payload": payloads})

    return raw.select("url", "body").mapInPandas(run, out_schema)


def pages_table_from_xml(raw: DataFrame) -> DataFrame:
    """Assemble the engine's `pages` table (schemas.PAGES) from raw
    fetched documents (url, host, kind, fetched_at, body).

    This is the deploy-shape ingestion path: fetch stage lands raw
    bytes, this parse stage types them; the crawl engine is agnostic
    to which path populated the table (tested end-to-end against the
    oracle). Parse failures keep the row with a NULL payload — the
    engine treats it as a fetch failure and retries (O3)."""
    from pyspark.sql import functions as F

    meta_cols = ["url", "host", "kind", "fetched_at"]
    parts = []
    for kind, col in (("person", "person"), ("journal_list", "journal_list"), ("journal", "journal")):
        sub = raw.filter(F.col("kind") == kind)
        parsed = parse_pages_xml(sub, kind).withColumnRenamed("payload", col)
        row = sub.select(*meta_cols).join(parsed, "url", "left")
        for other in ("person", "journal_list", "journal"):
            if other != col:
                row = row.withColumn(
                    other,
                    F.lit(None).cast(
                        {
                            "person": schemas.PERSON_PAYLOAD,
                            "journal_list": schemas.JOURNAL_LIST_PAYLOAD,
                            "journal": schemas.JOURNAL_PAYLOAD,
                        }[other]
                    ),
                )
        parts.append(row.select(*[f.name for f in schemas.PAGES]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
