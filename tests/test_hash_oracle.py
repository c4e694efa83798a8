"""Exact-value oracles for the xxhash64-based operators.

DuckDB cannot reproduce Spark's xxhash64, so the driver gate checks
these ops rows-only; here an INDEPENDENT from-spec Python XXH64
(tests/xxh64_ref.py) pins their VALUES — fingerprint64, simhash64,
and minhash signatures must equal the reference implementation bit
for bit, not just produce the right row counts."""

from pyspark.sql import functions as F

from dblp_crawler_spark.operators.dedup import minhash_signature, simhash64
from dblp_crawler_spark.operators.textstats import fingerprint64

from xxh64_ref import (
    fingerprint64_ref,
    minhash_signature_ref,
    simhash64_ref,
    spark_xxhash64_str,
    spark_xxhash64_str_int,
)

DOCS = [
    "",
    "one",
    "The quick brown fox jumps over the lazy dog",
    "the the the repeated repeated tokens tokens here",
    "Spark join window agg shuffle partition skew salt " * 4,
    "punctuation, splits! tokens?  and_underscores stay_together 123 mixed42",
    "short doc",
    "exactly three tokens",
]


def test_python_xxh64_matches_spark(spark):
    """Anchor: the from-spec Python XXH64 equals Spark's xxhash64 on
    strings and seed-chained (string, int) columns."""
    rows = [(d, i) for i, d in enumerate(DOCS)]
    df = spark.createDataFrame(rows, "s string, i int")
    got = df.select("s", "i", F.xxhash64("s").alias("h1"), F.xxhash64("s", "i").alias("h2")).collect()
    for r in got:
        assert r.h1 == spark_xxhash64_str(r.s)
        assert r.h2 == spark_xxhash64_str_int(r.s, r.i)


def test_fingerprint64_exact_values(spark):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(DOCS)], "doc_id int, text string")
    got = {r.doc_id: r.fp for r in df.select("doc_id", fingerprint64("text").alias("fp")).collect()}
    for i, d in enumerate(DOCS):
        assert got[i] == fingerprint64_ref(d), f"doc {i}: {d!r}"


def test_simhash64_exact_values(spark):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(DOCS) if d], "doc_id int, text string")
    got = {r.doc_id: r.sh for r in df.select("doc_id", simhash64("text").alias("sh")).collect()}
    for i, d in enumerate(DOCS):
        if d:
            assert got[i] == simhash64_ref(d), f"doc {i}: {d!r}"


def test_minhash_signature_exact_values(spark):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS) if d], "doc_id int, text string"
    )
    sig = minhash_signature(df, num_hashes=8, shingle_n=3)
    got = {r.doc_id: list(r.sig) for r in sig.collect()}
    for i, d in enumerate(DOCS):
        if d:
            assert got[i] == minhash_signature_ref(d, num_hashes=8), f"doc {i}: {d!r}"
