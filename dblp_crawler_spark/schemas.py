"""Explicit StructType schemas for every engine table.

The reference has no declared schemas (shape enforced by `assert
data.tag == ...`, /root/reference/dblp_crawler/parser.py:18,36,64,156);
here every table is fixed and versioned. The `images` table is the
EXACT `BASELINE.json` input_hint shape — do not alter.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- payload table: EXACT input_hint shape -------------------------------
IMAGES = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
    ]
)

# --- parsed page payloads (cf. parser.py:34-52, 62-149, 152-186) ---------
AUTHOR = StructType(
    [
        StructField("pid", StringType(), True),
        StructField("name", StringType(), True),
        StructField("orcid", StringType(), True),
    ]
)

PUB = StructType(
    [
        StructField("key", StringType(), False),
        StructField("type", StringType(), True),
        StructField("title", StringType(), True),
        StructField("year", IntegerType(), True),
        StructField("mdate", StringType(), True),
        StructField("url", StringType(), True),
        StructField("ee", ArrayType(StringType()), True),
        StructField("journal", StringType(), True),
        StructField("authors", ArrayType(AUTHOR), True),
        StructField("image_id", StringType(), True),
    ]
)

PERSON_PAYLOAD = StructType(
    [
        StructField("pid", StringType(), True),
        StructField("name", StringType(), True),
        StructField("affiliations", ArrayType(StringType()), True),
        StructField("pubs", ArrayType(PUB), True),
    ]
)

PROCEEDING = StructType(
    [
        StructField("booktitle", StringType(), True),
        StructField("url", StringType(), True),
    ]
)

JOURNAL_LIST_PAYLOAD = StructType(
    [
        StructField("title", StringType(), True),
        StructField("h1", StringType(), True),
        StructField("refs", ArrayType(StringType()), True),
        StructField("proceedings", ArrayType(PROCEEDING), True),
    ]
)

JOURNAL_PAYLOAD = StructType([StructField("pubs", ArrayType(PUB), True)])

# --- page store (simulated dblp.org; replaces HTTP + file cache,
#     cf. downloader.py:34-49,52-84) --------------------------------------
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("kind", StringType(), False),  # person | journal_list | journal
        StructField("fetched_at", TimestampType(), True),
        StructField("person", PERSON_PAYLOAD, True),
        StructField("journal_list", JOURNAL_LIST_PAYLOAD, True),
        StructField("journal", JOURNAL_PAYLOAD, True),
    ]
)

# --- crawl state tables ---------------------------------------------------
# frontier status lifecycle mirrors Graph.persons (graph.py:14,25,78,109):
#   pending  ~ persons[pid] is None  (queued, not fetched)
#   fetched  ~ persons[pid] is DBLPPerson (fetched, not expanded)
#   expanded ~ persons[pid] is True
#   failed   ~ persons[pid] stays None after a failed wave (retried)
FRONTIER = StructType(
    [
        StructField("pid", StringType(), False),
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("status", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("priority", LongType(), False),
        StructField("attempts", IntegerType(), False),
        StructField("wave_added", IntegerType(), False),
    ]
)

SEEN_PUBS = StructType(  # Graph.publications (graph.py:16)
    [
        StructField("key", StringType(), False),
        StructField("wave", IntegerType(), False),
    ]
)

EMITTED_PERSONS = StructType(  # Graph.summarized_person (graph.py:15)
    [StructField("pid", StringType(), False), StructField("wave", IntegerType(), False)]
)

# node/edge/publication result tables (summarizer/networkx.py:28-37)
NODES = StructType(
    [
        StructField("pid", StringType(), False),
        StructField("name", StringType(), True),
        StructField("affiliations", ArrayType(StringType()), True),
        StructField("pub_keys", ArrayType(StringType()), True),
    ]
)

EDGES = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("pub_key", StringType(), False),
    ]
)

PUBLICATIONS_OUT = StructType(
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
        StructField("authors", ArrayType(AUTHOR), True),
        StructField("selected", BooleanType(), True),
        StructField("image_id", StringType(), True),
    ]
)

# per-wave metrics (graph.py:19,82,153-158 counters)
METRICS = StructType(
    [
        StructField("wave", IntegerType(), False),
        StructField("scheduled", LongType(), False),
        StructField("fetch_succ", LongType(), False),
        StructField("fetch_fail", LongType(), False),
        StructField("pubs_new", LongType(), False),
        StructField("authors_new", LongType(), False),
        StructField("remain_pending", LongType(), False),
        StructField("emitted", LongType(), False),
    ]
)

# A7: per-seed-journal batch counts at journal init (reference
# graph.py:46-58 — "%d publications in %s", log-only there; a
# committed table here)
JOURNAL_INIT_COUNTS = StructType(
    [
        StructField("journal_key", StringType(), False),
        StructField("n_pubs", LongType(), False),
    ]
)

# --- dimensions -----------------------------------------------------------
SEEDS = StructType(
    [StructField("seed_type", StringType(), False), StructField("value", StringType(), False)]
)

CCF_RANK = StructType(
    [StructField("journal_key", StringType(), False), StructField("rank", StringType(), False)]
)

ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("disallow_prefixes", ArrayType(StringType()), True),
        StructField("crawl_delay_ms", IntegerType(), True),
    ]
)

KEYWORD_RULES = StructType(
    [StructField("rule_id", IntegerType(), False), StructField("words", ArrayType(StringType()), False)]
)

CRAWL_ORDER = StructType(
    [
        StructField("wave", IntegerType(), False),
        StructField("seq", IntegerType(), False),
        StructField("url", StringType(), False),
    ]
)
