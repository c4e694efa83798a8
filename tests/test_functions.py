"""Unit tests for the native-expression scalar functions (P1-P14),
pinned against the reference's own Python semantics (oracle.py
implements the reference regexes verbatim)."""

from pyspark.sql import functions as F

from dblp_crawler_spark import oracle
from dblp_crawler_spark.functions.priority import priority_col
from dblp_crawler_spark.functions.text import (
    first_doi,
    journal_key,
    keyword_cnf_match,
    keyword_weak_match,
    strip_html_suffix,
    title_hash,
    url2doi,
)

# the reference's own spot-check titles (keyword/__init__.py:42-53)
REF_TITLES = [
    ("An adaptive clustering-based evolutionary algorithm for many-objective optimization problems", False),
    ("Multi-resolution representation with recurrent neural networks application for streaming time series in IoT", False),
    ("High-Definition Video Compression System Based on Perception Guidance of Salient Information of a Convolutional Neural Network and HEVC Compression Domain", True),
    ("Resource Provision and Allocation Based on Microeconomic Theory in Mobile Edge Computing", True),
]
REF_RULES = [["super", "resolution"], ["content", "aware"], ["video"], ["edge", "computing"]]


def test_keyword_cnf_reference_spot_checks(spark):
    df = spark.createDataFrame([(t,) for t, _ in REF_TITLES], "title string")
    got = [r.m for r in df.select(keyword_cnf_match("title", REF_RULES).alias("m")).collect()]
    assert got == [want for _, want in REF_TITLES]
    # and the oracle's python implementation agrees
    assert [oracle.keyword_match(t, REF_RULES) for t, _ in REF_TITLES] == got


def test_keyword_empty_rules_match_all(spark):
    df = spark.createDataFrame([("anything",)], "title string")
    assert df.select(keyword_cnf_match("title", []).alias("m")).collect()[0].m is True
    assert df.select(keyword_weak_match("title", []).alias("m")).collect()[0].m is True


def test_keyword_weak_match(spark):
    df = spark.createDataFrame([("a video about cats",), ("a paper about dogs",)], "title string")
    got = [r.m for r in df.select(keyword_weak_match("title", REF_RULES).alias("m")).collect()]
    assert got == [True, False]


def test_title_hash_matches_reference(spark):
    titles = [
        "Hello, World! 2024",
        "  spaces  only  ",
        "中文标题：测试",
        "ﬁ ligature",
        "!!!???",  # no kept chars → fallback strips spaces only
    ]
    df = spark.createDataFrame([(t,) for t in titles], "title string")
    got = [r.h for r in df.select(title_hash("title").alias("h")).collect()]
    assert got == [oracle.title_hash(t) for t in titles]


def test_url2doi_and_first_doi(spark):
    rows = [
        ("https://doi.org/10.1145/3292500",),
        ("https://doi.org//10.99/x",),
        ("https://example.org/10.1145/y",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [r.d for r in df.select(url2doi("url").alias("d")).collect()]
    assert got == ["10.1145/3292500", "10.99/x", None, None]

    arr = spark.createDataFrame(
        [(["https://a.org/x", "https://doi.org/10.1/z", "https://doi.org/10.2/w"],), ([],), (None,)],
        "ee array<string>",
    )
    got = [r.d for r in arr.select(first_doi("ee").alias("d")).collect()]
    assert got == ["10.1/z", None, None]


def test_journal_key_first_three_segments(spark):
    df = spark.createDataFrame([("db/conf/icml/icml2024.html#p1",), ("db/journals/x",), (None,)], "url string")
    got = [r.k for r in df.select(journal_key("url").alias("k")).collect()]
    assert got == ["db/conf/icml", "db/journals/x", None]


def test_strip_html_suffix(spark):
    df = spark.createDataFrame([("a/b.html",), ("a/b.html.html",), ("a/bhtml",)], "href string")
    got = [r.h for r in df.select(strip_html_suffix("href").alias("h")).collect()]
    assert got == ["a/b", "a/b.html", "a/bhtml"]


def test_priority_total_order_matches_oracle(spark):
    cases = [("A", 2024, 0), ("A", 2024, 3), ("B", 2030, 0), ("N", None, 2), ("C", 1999, 1)]
    df = spark.createDataFrame(cases, "ccf string, year int, depth int")
    got = [r.p for r in df.select(priority_col("ccf", "year", "depth").alias("p")).collect()]
    assert got == [oracle.priority_of(c, y, d) for c, y, d in cases]
    # ccf dominates year dominates depth
    assert got[0] > got[2] > got[4] > got[3]
    assert got[0] > got[1]
