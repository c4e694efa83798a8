"""Scalar text/URL functions — ALL native Spark expressions.

Nothing here is a Python UDF: every function stays inside
whole-stage codegen so the BFS filter path never leaves the JVM
(SURVEY.md §4). Reference semantics cited per function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# -- P4: title_hash canonicalization (parser.py:12-13) ---------------------
# re.sub(r"[^0-9a-z一-鿿ﬀ-﻿]", "", title.lower())
#   or re.sub(r" ", "", title.lower())
_TITLE_HASH_KEEP = r"[^0-9a-z一-鿿ﬀ-﻿]"


def title_hash(title: Column | str) -> Column:
    """Canonical record hash of a title; the engine's URL/record
    canonicalization primitive (reference parser.py:12-13)."""
    t = F.lower(F.col(title) if isinstance(title, str) else title)
    primary = F.regexp_replace(t, _TITLE_HASH_KEEP, "")
    fallback = F.regexp_replace(t, " ", "")
    return F.when(primary == "", fallback).otherwise(primary)


# -- P2/P3: keyword CNF matching (keyword/__init__.py:24-39) ---------------
def tokenize(sentence: Column | str) -> Column:
    """`set(re.findall(r"\\w+", sentence.lower()))` as an array column."""
    s = F.lower(F.col(sentence) if isinstance(sentence, str) else sentence)
    toks = F.split(s, r"[^0-9a-z_À-￿]+")
    return F.array_distinct(F.filter(toks, lambda w: w != ""))


def keyword_cnf_match(title: Column | str, rules: list[list[str]]) -> Column:
    """OR-of-ANDs keyword match (keyword/__init__.py:24-32).

    A title matches iff ∃ rule: every word of the rule ⊆ title tokens.
    Empty rule set ⇒ match-all (keyword/__init__.py:25-26).
    """
    if not rules:
        return F.lit(True)
    toks = tokenize(title)
    rules_lit = F.array(*[F.array(*[F.lit(w.lower()) for w in rule]) for rule in rules])
    return F.exists(rules_lit, lambda rule: F.forall(rule, lambda w: F.array_contains(toks, w)))


def keyword_weak_match(title: Column | str, rules: list[list[str]]) -> Column:
    """Any single rule word present (keyword/__init__.py:34-39)."""
    if not rules:
        return F.lit(True)
    words = sorted({w.lower() for rule in rules for w in rule})
    return F.arrays_overlap(tokenize(title), F.array(*[F.lit(w) for w in words]))


# -- P5: url2doi (parser.py:55-59) -----------------------------------------
def url2doi(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    host = F.parse_url(u, F.lit("HOST"))
    path = F.parse_url(u, F.lit("PATH"))
    return F.when(host == "doi.org", F.regexp_replace(path, r"^/+", "")).otherwise(F.lit(None))


def first_doi(ee: Column | str) -> Column:
    """First non-null doi over the ee URL array (parser.py:117-122)."""
    arr = F.col(ee) if isinstance(ee, str) else ee
    dois = F.filter(
        F.transform(arr, lambda e: url2doi(e)),
        lambda d: d.isNotNull(),
    )
    return F.try_element_at(dois, F.lit(1))


# -- P6: journal_key = first 3 '/'-segments of pub url (parser.py:96-100) --
def journal_key(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.when(u.isNotNull(), F.substring_index(u, "/", 3))


# -- P7: CCF rank lookup (parser.py:124-129) -------------------------------
def ccf_rank_col(df_rank_joined_col: Column) -> Column:
    """`coalesce(rank, 'N')` after the broadcast dim join."""
    return F.coalesce(df_rank_joined_col, F.lit("N"))


# -- P9: journal-name projection per pub type (parser.py:83-94) ------------
_JOURNAL_TAG = {
    "inproceedings": "booktitle",
    "proceedings": "booktitle",
    "article": "journal",
    "incollection": "booktitle",
    "book": "series",
}


def journal_name(pub_type: Column | str, journal_field: Column | str) -> Column:
    """The fixture parser stores the type-appropriate field in one
    `journal` column; types outside the tag table project NULL."""
    t = F.col(pub_type) if isinstance(pub_type, str) else pub_type
    j = F.col(journal_field) if isinstance(journal_field, str) else journal_field
    return F.when(t.isin(*_JOURNAL_TAG.keys()), j).otherwise(F.lit(None))


# -- P12: '.html' suffix strip (journal.py:30,37) --------------------------
def strip_html_suffix(href: Column | str) -> Column:
    h = F.col(href) if isinstance(href, str) else href
    return F.regexp_replace(h, r"\.html$", "")


# -- P13: corr exclusion (summarizer/neo4j.py:26) --------------------------
def not_corr(jkey: Column | str) -> Column:
    k = F.col(jkey) if isinstance(jkey, str) else jkey
    return k != "db/journals/corr"
