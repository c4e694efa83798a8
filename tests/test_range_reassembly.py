"""Content-Range reassembly audit
(operators/freshness.content_range_parts / range_reassembly)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.freshness import (
    content_range_parts,
    range_reassembly,
    range_reassembly_sql,
)


def _hdr(s, e, t):
    return f"HTTP/1.1 206 Partial Content\r\nContent-Range: bytes {s}-{e}/{t}"


def _log():
    rows = []
    # complete 4-part file
    for s, e in [(0, 249), (250, 499), (500, 749), (750, 999)]:
        rows.append(("ok", _hdr(s, e, 1000)))
    # missing middle chunk
    for s, e in [(0, 249), (250, 499), (750, 999)]:
        rows.append(("gap", _hdr(s, e, 1000)))
    # overlapping parts still complete, never double-counted
    for s, e in [(0, 399), (200, 599), (400, 799), (600, 999)]:
        rows.append(("overlap", _hdr(s, e, 1000)))
    # a part over-declaring past total: clamped, still complete
    for s, e in [(0, 499), (500, 1099)]:
        rows.append(("clamp", _hdr(s, e, 1000)))
    # first part starts beyond byte 0
    rows.append(("late", _hdr(100, 999, 1000)))
    # a part ENTIRELY past EOF carries no byte evidence: no coverage,
    # no gap flag (the hypothesis-found (40,40)/40 case, pinned)
    rows.append(("pasteof", _hdr(1000, 1000, 1000)))
    # ...and mixed with real parts it neither gaps nor double-counts
    for s, e in [(0, 999), (1005, 1200)]:
        rows.append(("mixed_eof", _hdr(s, e, 1000)))
    # malformed / unsatisfied-range rows carry no evidence
    rows.append(("junk", "Content-Range: bytes */1000"))
    rows.append(("junk", "Content-Type: image/png"))
    return rows


def test_range_reassembly_pins(spark):
    df = spark.createDataFrame(_log(), "url string, headers string")
    parts = content_range_parts(df)
    got = {r.url: (r.n_parts, r.covered_bytes, r.has_gap, r.complete)
           for r in range_reassembly(parts).collect()}
    assert got["ok"] == (4, 1000, False, True)
    assert got["gap"] == (3, 750, True, False)
    assert got["overlap"] == (4, 1000, False, True)
    assert got["clamp"] == (2, 1000, False, True)
    assert got["late"] == (1, 900, True, False)
    assert got["pasteof"] == (1, 0, False, False)
    assert got["mixed_eof"] == (2, 1000, False, True)
    assert "junk" not in got   # no parsed parts -> no row


def test_range_reassembly_duckdb_replay(spark):
    df = spark.createDataFrame(_log(), "url string, headers string")
    spark_pdf = (range_reassembly(content_range_parts(df)).toPandas()
                 .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("responses", pd.DataFrame(
        _log(), columns=["url", "headers"]))
    duck_pdf = (con.sql(range_reassembly_sql("responses")).df()
                .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False)


# ---- property: window union == brute-force interval union ---------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(
    parts=st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 80)).map(
            lambda t: (min(t[0], 59), max(t[0], t[1]))),
        min_size=1, max_size=12,
    ),
    total=st.integers(min_value=40, max_value=60),
)
def test_range_union_matches_bruteforce(spark, parts, total):
    """The windowed increment sum equals a from-scratch byte-set
    union on random (possibly overlapping, over-declaring, late)
    part lists — and completeness/gap agree with the byte set."""
    rows = [("u", s, e, total) for s, e in parts]
    df = spark.createDataFrame(
        rows, "url string, part_start long, part_end long, total_bytes long")
    r = range_reassembly(df).collect()[0]

    covered = set()
    for s, e in parts:
        covered.update(range(s, min(e, total - 1) + 1))
    assert r.covered_bytes == len(covered)
    assert r.complete == (len(covered) == total)
    # has_gap: some byte below the max covered byte (or byte 0) missing
    expect_gap = bool(covered) and (
        min(covered) > 0 or len(covered) != max(covered) + 1)
    assert r.has_gap == expect_gap
