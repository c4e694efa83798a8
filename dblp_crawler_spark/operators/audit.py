"""Order-invariant dataset fingerprints — replica equality audits.

The reference never copies its data (one process, one in-memory
graph); a 100 TB lakehouse does constantly — compaction rewrites,
engine migrations, cross-region replicas, the MoR resolve path — and
every copy needs the cheap question answered: *is the content of
these two tables identical as a multiset?*  Row-order comparison is
meaningless after a shuffle and full sort-merge diffs cost a 100 TB
shuffle; the standard tool is a MERGEABLE multiset hash
(AdHash-style additive hashing, public literature): hash each row to
an integer, combine with commutative reductions, compare O(1)
summaries.

:func:`table_fingerprint` emits, per group (or for the whole table):

* ``n_rows`` — multiset cardinality,
* ``xor60`` — bit-XOR of the 60-bit row hashes (cheap, but blind to
  even multiplicities: a row duplicated twice cancels out),
* ``sum_lo`` / ``sum_mid`` / ``sum_hi`` — sums of three disjoint
  20-bit nibbles of the row hash, which ARE multiplicity-sensitive
  (the additive multiset hash).  Nibble sums instead of a full
  ``sum(h)`` because 60-bit values overflow int64 at ~8 rows under
  ANSI mode; a 20-bit nibble sum stays exact to ~8.8·10^12 rows
  (documented bound, far past the 10^10-URL frontier).

Every reduction is commutative and associative → the aggregate is
map-side partial, shuffle-free beyond one exchange on the group key,
and fingerprints of SHARDS merge by (+, +, ^): fingerprint each
partition of a replica as it lands, fold the manifest, compare one
row.  Two tables are multiset-equal iff all five fields match (up to
hash collisions — with 60-bit hashes and three independent nibble
sums, engineering-certainty at any real scale).

The row hash is :func:`~dblp_crawler_spark.functions.hashing.hash60`
over a canonical rendering — columns in sorted-name order, values
cast to string, NULL encoded as a reserved sentinel distinct from
the string 'NULL' — so any engine derives the identical fingerprint
(:func:`table_fingerprint_sql` is the DuckDB replay, used both by
the correctness oracle and as the real cross-engine audit path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import HASH60_SEP, hash60, hash60_sql

#: NULL sentinel: control-char framing (US+RS) that no cast value
#: string plausibly contains, distinct from the string 'NULL' and
#: from the empty string.  (Theoretical framing ambiguity with
#: values that themselves embed \x1f is documented, not defended —
#: this is an audit hash over cast scalars, not a serialization.)
_NULL = "\x1f\x1e"

#: nibble width for the additive sums (3 × 20 bits covers the 60-bit
#: hash exactly); 2^20 per row → int64-exact to ~8.8e12 rows.
_NIB = 20


def _row_canon(columns: list[str]) -> F.Column:
    """Canonical row rendering: sorted-name column order, string
    casts, NULLs → sentinel, unit-separator joined."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
        for c in sorted(columns)
    ]
    return F.concat_ws(HASH60_SEP, *parts)


def table_fingerprint(df: DataFrame, group_cols: list[str] | None = None,
                      columns: list[str] | None = None) -> DataFrame:
    """Multiset content fingerprint of ``df`` (see module docstring).

    ``group_cols`` fingerprints each group separately — the
    drill-down shape: fingerprint per source/day/shard, so when two
    replicas disagree the mismatching slice is already localized
    instead of re-scanning 100 TB.  Group fingerprints fold into the
    table fingerprint by (+, +, ^, +) — tested."""
    value_cols = columns or [
        c for c in df.columns if c not in (group_cols or [])
    ]
    h = hash60(_row_canon(value_cols))
    d = df.select(
        *(group_cols or []),
        h.alias("__h"),
        (h % F.lit(1 << _NIB)).alias("__lo"),
        # shiftright, never float division: doubles lose 60-bit ints
        (F.shiftright(h, _NIB) % F.lit(1 << _NIB)).alias("__mid"),
        (F.shiftright(h, 2 * _NIB) % F.lit(1 << _NIB)).alias("__hi"),
    )
    agg = [
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(__h)").alias("xor60"),
        F.sum("__lo").alias("sum_lo"),
        F.sum("__mid").alias("sum_mid"),
        F.sum("__hi").alias("sum_hi"),
    ]
    if group_cols:
        return d.groupBy(*group_cols).agg(*agg)
    return d.agg(*agg)


def table_fingerprint_sql(src: str, columns: list[str],
                          group_cols: list[str] | None = None) -> str:
    """DuckDB replay of :func:`table_fingerprint` — the cross-engine
    audit path itself: same canonical rendering (sorted columns,
    sentinel NULLs, same separator), same hash, same reductions.
    ``columns`` must list the VALUE columns (DuckDB can't introspect
    here)."""
    null_sql = "chr(31) || chr(30)"
    cols = sorted(columns)
    parts = " || chr(31) || ".join(
        f"coalesce(CAST({c} AS VARCHAR), {null_sql})" for c in cols
    )
    h = hash60_sql(f"({parts})")
    gsel = (", ".join(group_cols) + ", ") if group_cols else ""
    gby = ("GROUP BY " + ", ".join(group_cols)) if group_cols else ""
    return f"""
        SELECT {gsel}
               COUNT(*) AS n_rows,
               bit_xor(h) AS xor60,
               CAST(SUM(h % {1 << _NIB}) AS BIGINT) AS sum_lo,
               CAST(SUM(CAST(h // {1 << _NIB} AS BIGINT) % {1 << _NIB}) AS BIGINT) AS sum_mid,
               CAST(SUM(CAST(h // {1 << (2 * _NIB)} AS BIGINT) % {1 << _NIB}) AS BIGINT) AS sum_hi
        FROM (SELECT {gsel} {h} AS h FROM {src})
        {gby}
    """


# ---- crawl-order replay divergence --------------------------------------------
#
# The determinism contract (T2: resume/replay reproduces the exact
# crawl order) needs a DIAGNOSTIC, not just a pass/fail assert: when
# two runs disagree, the first diverging sequence number localizes
# the bug (everything before it is proven equal; the rows AT it say
# which side scheduled what). One full-outer equi-join on seq + one
# aggregate; the divergence rows ride a second tiny join against the
# 1-row summary — nothing is collected, nothing sorted globally.

def order_divergence(a: DataFrame, b: DataFrame, seq_col: str = "seq",
                     key_col: str = "url") -> DataFrame:
    """Compare two ordered runs: ONE summary row (n_a, n_b,
    n_mismatch, first_divergence_seq, a_url, b_url) — NULLs when the
    runs are identical. Mismatch = key differs at a seq or the seq
    exists on one side only (null-safe compare)."""
    aa = a.select(F.col(seq_col).alias("seq"), F.col(key_col).alias("a_key"))
    bb = b.select(F.col(seq_col).alias("seq"), F.col(key_col).alias("b_key"))
    j = aa.join(bb, "seq", "full_outer")
    mism = ~F.col("a_key").eqNullSafe(F.col("b_key"))
    summary = j.agg(
        F.count(F.col("a_key")).alias("n_a"),
        F.count(F.col("b_key")).alias("n_b"),
        F.count(F.when(mism, 1)).alias("n_mismatch"),
        F.min(F.when(mism, F.col("seq"))).alias("first_divergence_seq"),
    )
    at = j.select(F.col("seq").alias("__s"), "a_key", "b_key")
    return (
        summary.join(
            at, summary["first_divergence_seq"].eqNullSafe(at["__s"]), "left")
        .select("n_a", "n_b", "n_mismatch", "first_divergence_seq",
                F.col("a_key").alias("a_url"), F.col("b_key").alias("b_url"))
    )


def order_divergence_sql(a: str, b: str, seq_col: str = "seq",
                         key_col: str = "url") -> str:
    """DuckDB replay of :func:`order_divergence`."""
    return f"""
        WITH od_j AS (
          SELECT COALESCE(x.{seq_col}, y.{seq_col}) AS seq,
                 x.{key_col} AS a_key, y.{key_col} AS b_key
          FROM {a} x FULL OUTER JOIN {b} y ON x.{seq_col} = y.{seq_col}
        ), od_s AS (
          SELECT CAST(COUNT(a_key) AS BIGINT) AS n_a,
                 CAST(COUNT(b_key) AS BIGINT) AS n_b,
                 CAST(COUNT(CASE WHEN a_key IS DISTINCT FROM b_key
                            THEN 1 END) AS BIGINT) AS n_mismatch,
                 MIN(CASE WHEN a_key IS DISTINCT FROM b_key
                     THEN seq END) AS first_divergence_seq
          FROM od_j
        )
        SELECT s.n_a, s.n_b, s.n_mismatch, s.first_divergence_seq,
               j.a_key AS a_url, j.b_key AS b_url
        FROM od_s s LEFT JOIN od_j j
          ON j.seq IS NOT DISTINCT FROM s.first_divergence_seq
    """
