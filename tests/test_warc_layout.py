"""Web-archive writer layout: SURT pins, placement vs a from-spec
Python reference, byte-exact render roundtrip, shard size bounds,
the DuckDB replay, and plan shape (broadcast offset join)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.archive import (
    surt_key,
    surt_key_sql,
    warc_layout,
    warc_layout_sql,
    warc_shard_render,
)

TARGET = 4096  # small target → many shards on tiny fixtures


def _records(spark, n=120):
    """Deterministic multi-host records with skewed payload sizes."""
    rows = []
    for i in range(n):
        host = f"h{i % 7}.example.org"
        port = ":8080" if i % 13 == 0 else ""
        q = "?b=2&z=1" if i % 5 == 0 else ""
        url = f"https://www.{host}{port}/p/{i}{q}"
        payload = ("word%d " % i) * (20 + (i * 37) % 300)
        rows.append((url, 1_700_000_000 + i * 11, "text/html", i * 7919, payload))
    return rows, spark.createDataFrame(
        rows, "url string, ts long, mime string, digest long, payload string"
    )


def _py_surt(url: str) -> str:
    rest = url.split("://", 1)[1]
    cut = len(rest)
    for ch in "/?":
        p = rest.find(ch)
        if p != -1:
            cut = min(cut, p)
    hostport, pathq = rest[:cut], rest[cut:] or "/"
    host, _, port = hostport.partition(":")
    if host.startswith("www."):
        host = host[4:]
    rev = ",".join(reversed(host.split(".")))
    return rev + ((":" + port) if port else "") + ")" + pathq


def _py_layout(rows, target):
    """From-spec reference: render, sort by (surt, ts, url), exclusive
    byte prefix, shard = prefix DIV target, offset from shard start."""
    recs = []
    for url, ts, mime, digest, payload in rows:
        body = payload.encode()
        header = (
            b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
            + url.encode()
            + b"\r\nWARC-Date: " + str(ts).encode()
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n"
        )
        rec = header + body + b"\r\n\r\n"
        recs.append((_py_surt(url), ts, url, mime, digest, rec))
    recs.sort(key=lambda r: (r[0], r[1], r[2]))
    out, prefix, shard_start = [], 0, {}
    for surt, ts, url, mime, digest, rec in recs:
        shard = prefix // target
        shard_start.setdefault(shard, prefix)
        out.append(
            (surt, url, ts, mime, digest, shard,
             prefix - shard_start[shard], len(rec))
        )
        prefix += len(rec)
    return out


def test_surt_key_pins(spark):
    cases = {
        "https://www.sub.example.org:8443/a/b?q=1": "org,example,sub:8443)/a/b?q=1",
        "http://example.com/": "com,example)/",
        "https://example.com": "com,example)/",  # authority-only → '/'
        "https://wwwx.example.com/p": "com,example,wwwx)/p",  # only 'www.' strips
        "https://www.example.com/p?a=1": "com,example)/p?a=1",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r.url: r.surt for r in df.select("url", surt_key("url").alias("surt")).collect()}
    assert got == cases
    con = duckdb.connect()
    for u, want in cases.items():
        frag = surt_key_sql("'" + u + "'")
        assert con.sql(f"SELECT {frag}").fetchone()[0] == want


def test_layout_matches_python_reference(spark):
    rows, df = _records(spark)
    got = sorted(
        (tuple(r) for r in warc_layout(df, target_bytes=TARGET)
         .select("surt", "url", "ts", "mime", "digest", "shard", "rec_offset", "rec_len")
         .collect())
    )
    want = sorted(_py_layout(rows, TARGET))
    assert got == want


def test_render_roundtrip_byte_exact(spark):
    rows, df = _records(spark)
    layout = warc_layout(df, target_bytes=TARGET, keep_record=True)
    cdx = layout.select("shard", "rec_offset", "rec_len", "rec").collect()
    shards = {
        r.shard: (r.shard_bytes, r.shard_text)
        for r in warc_shard_render(layout).collect()
    }
    by_shard = {}
    for r in cdx:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, recs in by_shard.items():
        recs.sort(key=lambda r: r.rec_offset)
        nbytes, text = shards[shard]
        blob = text.encode()
        assert nbytes == len(blob) == sum(r.rec_len for r in recs)
        # offsets are contiguous AND are the true byte positions
        pos = 0
        for r in recs:
            assert r.rec_offset == pos
            assert blob[pos:pos + r.rec_len] == r.rec.encode()
            pos += r.rec_len


def test_shard_size_bounds(spark):
    rows, df = _records(spark)
    pdf = (
        warc_layout(df, target_bytes=TARGET)
        .groupBy("shard").agg(F.sum("rec_len").alias("b"), F.max("rec_len").alias("m"))
        .toPandas().sort_values("shard")
    )
    max_len = int(pdf["m"].max())
    # DIV placement: every non-final shard holds target ± one record
    for _, r in pdf.iloc[:-1].iterrows():
        assert TARGET - max_len < r["b"] < TARGET + max_len
    # shards are dense 0..K
    assert list(pdf["shard"]) == list(range(len(pdf)))


def test_duckdb_replay_identical(spark):
    rows, df = _records(spark)
    spark_pdf = (
        warc_layout(df, target_bytes=TARGET).toPandas()
        .sort_values(["surt", "ts", "url"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("recs", pd.DataFrame(
        rows, columns=["url", "ts", "mime", "digest", "payload"]
    ))
    duck_pdf = (
        con.sql(warc_layout_sql("recs", target_bytes=TARGET)).df()
        .sort_values(["surt", "ts", "url"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_plan_broadcasts_shard_starts(spark):
    _, df = _records(spark)
    plan = warc_layout(df, target_bytes=TARGET)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


# ---- revisit dedup -----------------------------------------------------------

def _dup_records(spark):
    """Three digests; digest B's LATER capture has the smaller url
    (election must be by (ts, url), never url alone)."""
    rows = [
        ("https://a.org/1", 100, "text/html", 11, "payload-A"),
        ("https://a.org/2", 200, "text/html", 11, "payload-A"),   # revisit of /1
        ("https://z.org/9", 150, "text/html", 22, "payload-B"),
        ("https://b.org/0", 300, "text/html", 22, "payload-B"),   # later ts, smaller url
        ("https://c.org/u", 400, "text/html", 33, "payload-C"),   # unique
        ("https://a.org/3", 100, "text/html", 11, "payload-A"),   # ts tie → url breaks
    ]
    return rows, spark.createDataFrame(
        rows, "url string, ts long, mime string, digest long, payload string"
    )


def test_revisit_election_and_refers(spark):
    from dblp_crawler_spark.operators.archive import warc_revisit_layout

    _, df = _dup_records(spark)
    out = {r.url: r for r in warc_revisit_layout(df, target_bytes=TARGET).collect()}
    assert out["https://a.org/1"].rec_type == "response"   # ts tie, smaller url
    assert out["https://a.org/3"].rec_type == "revisit"
    assert out["https://a.org/2"].rec_type == "revisit"
    assert out["https://a.org/2"].refers_to_url == "https://a.org/1"
    assert out["https://a.org/2"].refers_to_ts == 100
    assert out["https://z.org/9"].rec_type == "response"   # earliest ts wins
    assert out["https://b.org/0"].rec_type == "revisit"
    assert out["https://b.org/0"].refers_to_url == "https://z.org/9"
    assert out["https://c.org/u"].rec_type == "response"
    assert out["https://c.org/u"].refers_to_url is None
    # exactly one response per digest
    assert sum(1 for r in out.values() if r.rec_type == "response") == 3


def test_revisit_render_and_savings(spark):
    from dblp_crawler_spark.operators.archive import (
        warc_layout,
        warc_revisit_layout,
        warc_shard_render,
    )

    rows, df = _records(spark)
    # plant duplicates: every 3rd record reuses record i-(i%3)'s payload
    dup = spark.createDataFrame(
        [(u, t, m, hash(rows[i - i % 3][4]) % (1 << 40), rows[i - i % 3][4])
         for i, (u, t, m, d, p) in enumerate(rows)],
        "url string, ts long, mime string, digest long, payload string",
    )
    plain = warc_layout(dup, target_bytes=TARGET)
    dedup = warc_revisit_layout(dup, target_bytes=TARGET, keep_record=True)
    n_plain = plain.agg(F.sum("rec_len")).first()[0]
    n_dedup = dedup.agg(F.sum("rec_len")).first()[0]
    assert dedup.count() == plain.count()          # one CDX row per capture
    assert n_dedup < n_plain * 0.6                 # stubs collapse 2/3 of payloads
    # mixed-record shards still render byte-exactly at the CDX offsets
    cdx = dedup.select("shard", "rec_offset", "rec_len", "rec", "rec_type").collect()
    shards = {r.shard: r.shard_text.encode()
              for r in warc_shard_render(dedup).collect()}
    for r in cdx:
        blob = shards[r.shard][r.rec_offset:r.rec_offset + r.rec_len]
        assert blob == r.rec.encode()
        if r.rec_type == "revisit":
            assert b"WARC-Type: revisit" in blob and b"Content-Length: 0" in blob
        else:
            assert b"WARC-Type: response" in blob


def test_revisit_duckdb_replay_identical(spark):
    from dblp_crawler_spark.operators.archive import (
        warc_revisit_layout,
        warc_revisit_layout_sql,
    )

    rows, df = _dup_records(spark)
    spark_pdf = (
        warc_revisit_layout(df, target_bytes=TARGET).toPandas()
        .sort_values(["surt", "ts", "url"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("recs", pd.DataFrame(
        rows, columns=["url", "ts", "mime", "digest", "payload"]
    ))
    duck_pdf = (
        con.sql(warc_revisit_layout_sql("recs", target_bytes=TARGET)).df()
        .sort_values(["surt", "ts", "url"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
