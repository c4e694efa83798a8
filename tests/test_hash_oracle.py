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


# ---- portable hash family (md5-derived hash60) ------------------------------
def test_hash60_matches_duckdb_and_python(spark):
    """hash60 is the cross-engine lane: Spark, DuckDB, and a direct
    Python hashlib computation must agree bit-for-bit, seeded and
    unseeded — this is what makes the minhash/simhash/fingerprint/
    sketch driver entries fully DuckDB-oracled."""
    import hashlib

    import duckdb

    from dblp_crawler_spark.functions.hashing import HASH60_SEP, hash60, hash60_sql

    def py_h60(s: str, seed=None) -> int:
        if seed is not None:
            s = s + HASH60_SEP + str(seed)
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    df = spark.createDataFrame([(d,) for d in DOCS], "s string")
    got = {r["s"]: (r["h"], r["hs"]) for r in
           df.select("s", hash60("s").alias("h"), hash60("s", 7).alias("hs")).collect()}
    con = duckdb.connect()
    for d in DOCS:
        exp = (py_h60(d), py_h60(d, 7))
        assert got[d] == exp
        lit = "'" + d.replace("'", "''") + "'"
        duck = con.sql(f"SELECT {hash60_sql(lit)}, {hash60_sql(lit, 7)}").fetchone()
        assert tuple(duck) == exp


def test_portable_family_ops_match_xxhash_semantics(spark):
    """The hash_fn parameterization changes ONLY the hash lane, not
    the operator semantics: on a corpus with planted exact-style
    near-dups, minhash (portable) finds the same high-Jaccard pairs
    as minhash (xxhash64), and fingerprints are equal iff token
    sequences are equal under both families."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.dedup import minhash_near_dups

    base = "spark shuffles partitions joins windows aggregates " * 6
    rows = [
        (0, base),
        (1, base + "tail token"),          # near-dup of 0
        (2, "completely different text about crawling dblp pages"),
        (3, base),                          # exact dup of 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs_xx = {(r.a, r.b) for r in minhash_near_dups(docs, threshold=0.5).collect()}
    pairs_md = {(r.a, r.b) for r in
                minhash_near_dups(docs, threshold=0.5, hash_fn=hash60).collect()}
    assert (0, 3) in pairs_xx and (0, 3) in pairs_md
    assert (0, 1) in pairs_md and (0, 1) in pairs_xx
    assert not any(2 in p for p in pairs_md | pairs_xx)

    fps = {r.doc_id: r.fp for r in docs.select(
        "doc_id", fingerprint64("text", hash_fn=hash60).alias("fp")).collect()}
    assert fps[0] == fps[3] and fps[0] != fps[1] and fps[0] != fps[2]
