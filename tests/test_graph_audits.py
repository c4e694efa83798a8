"""Link reciprocity, sitemap coverage, and the Zipf slope: hand
pins + DuckDB replay equality."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.hits import (
    link_reciprocity,
    link_reciprocity_sql,
)
from dblp_crawler_spark.operators.textstats import zipf_slope, zipf_slope_sql
from dblp_crawler_spark.sources.webparse import (
    sitemap_coverage,
    sitemap_coverage_sql,
)


# ---- link reciprocity -------------------------------------------------------

EDGES = [
    ("a", "b"), ("b", "a"),          # reciprocal pair
    ("a", "c"), ("a", "d"),          # one-way
    ("c", "c"),                      # self-loop: dropped
    ("a", "b"),                      # duplicate: deduped
    ("d", "a"),                      # makes a<->d reciprocal too
]


def test_reciprocity_hand_counts(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.src: r for r in link_reciprocity(df).collect()}
    # a: out = {b, c, d}; reciprocal: b (b->a) and d (d->a)
    assert got["a"].n_out == 3 and got["a"].n_recip == 2
    assert got["a"].recip_pct == round(2 * 100.0 / 3, 2)
    assert got["b"].n_out == 1 and got["b"].n_recip == 1
    assert got["d"].n_out == 1 and got["d"].n_recip == 1
    assert "c" not in got  # only edge was the self-loop


def test_reciprocity_duckdb_replay(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = link_reciprocity(df).toPandas().sort_values("src").reset_index(drop=True)
    con = duckdb.connect()
    con.register("edges", pd.DataFrame(EDGES, columns=["src", "dst"]))
    want = (
        con.sql(link_reciprocity_sql("edges")).df()
        .sort_values("src").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


# ---- sitemap coverage -------------------------------------------------------

DECLARED = [("h1", "u1"), ("h1", "u2"), ("h1", "u3"), ("h2", "u4")]
FETCHED = [("h1", "u1"), ("h1", "u2"), ("h1", "junk"), ("h3", "u9")]


def test_coverage_hand_counts(spark):
    d = spark.createDataFrame(DECLARED, "host string, url string")
    f = spark.createDataFrame(FETCHED, "host string, url string")
    got = {r.host: r for r in sitemap_coverage(d, f).collect()}
    assert got["h1"].n_declared == 3 and got["h1"].n_fetched_declared == 2
    assert got["h1"].n_undeclared == 1 and got["h1"].coverage_pct == 66.67
    # declared but never fetched
    assert got["h2"].n_declared == 1 and got["h2"].coverage_pct == 0.0
    # fetched-only host: no declared set -> coverage NULL, 1 undeclared
    assert got["h3"].n_declared == 0 and got["h3"].n_undeclared == 1
    assert got["h3"].coverage_pct is None


def test_coverage_duckdb_replay(spark):
    d = spark.createDataFrame(DECLARED, "host string, url string")
    f = spark.createDataFrame(FETCHED, "host string, url string")
    got = sitemap_coverage(d, f).toPandas().sort_values("host").reset_index(drop=True)
    con = duckdb.connect()
    con.register("d", pd.DataFrame(DECLARED, columns=["host", "url"]))
    con.register("f", pd.DataFrame(FETCHED, columns=["host", "url"]))
    want = (
        con.sql(sitemap_coverage_sql("d", "f")).df()
        .sort_values("host").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


# ---- zipf slope -------------------------------------------------------------

def _zipf_corpus(spark):
    # a synthetic corpus with exact-Zipf frequencies: word w_r appears
    # floor(120/r) times -> ln(freq) ~ ln(120) - ln(rank), slope ~ -1
    words = []
    for r in range(1, 31):
        words += [f"w{r:02d}"] * (120 // r)
    text = " ".join(words)
    return spark.createDataFrame([(0, text, "zipfy")],
                                 "doc_id long, text string, source string")


def test_zipf_slope_near_minus_one(spark):
    r = zipf_slope(_zipf_corpus(spark), k=30).collect()[0]
    assert r.n_terms == 30
    assert -1.1 < r.zipf_slope < -0.9


def test_zipf_flat_corpus_near_zero(spark):
    # uniform frequencies -> slope ~ 0 (template spam signature)
    text = " ".join(f"t{r}" for r in range(40)) * 5
    df = spark.createDataFrame([(0, text, "flat")],
                               "doc_id long, text string, source string")
    r = zipf_slope(df, k=30).collect()[0]
    assert abs(r.zipf_slope) < 0.05


def test_zipf_duckdb_replay(spark):
    df = _zipf_corpus(spark)
    got = zipf_slope(df, k=30).toPandas().reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    want = con.sql(zipf_slope_sql("docs", k=30)).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
