"""Structured Streaming execution (SURVEY.md §2.7 additions): the
same operator definitions running under readStream — event-time
window + watermark aggregation, and the XML parse stage as a
streaming ingestion (micro-batch) pipeline."""

import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark import fixtures
from dblp_crawler_spark.streaming.events import windowed_counts_streaming


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_src"))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("overwrite").parquet(d)
    return d


def test_streaming_windowed_counts_matches_batch(spark, events_dir, tmp_path):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_counts_streaming(
        stream.withColumn("ts", F.col("ts").cast("timestamp")), window="1 hour", watermark="2 hours"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = windowed_counts_streaming(
        spark.read.parquet(events_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    want = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()}
    assert got == want and len(got) > 0


def _session_events(spark):
    """Deterministic two-phase event set. Phase 2 starts where phase
    1 ends: user 1's open session CONTINUES across the batch boundary
    (gap < 30 min), user 2's open session CLOSES (gap > 30 min)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    p1, p2, eid = [], [], 0
    for u in (1, 2):
        t = base
        for _ in range(2):  # two closed sessions in phase 1
            for _ in range(3):
                p1.append((eid, u, t, 1.5))
                eid += 1
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(hours=1)
        p1.append((eid, u, t, 2.0))  # opens the cross-phase session
        eid += 1
        gap = dt.timedelta(minutes=10) if u == 1 else dt.timedelta(hours=3)
        t += gap
        for _ in range(2):
            p2.append((eid, u, t, 0.5))
            eid += 1
            t += dt.timedelta(minutes=5)
    schema = "event_id long, user_id long, ts timestamp, value double"
    return spark.createDataFrame(p1, schema), spark.createDataFrame(p2, schema), schema


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-user
    gap sessions with O(1) state per group, across a STOPPED AND
    RESUMED stream (two availableNow runs over a growing directory,
    same checkpoint — state survives the restart). Emitted CLOSED
    sessions must equal the batch sessionizer on the full input minus
    each user's final (still-open) session."""
    from dblp_crawler_spark.streaming.events import sessionize, sessionize_stateful

    df1, df2, schema = _session_events(spark)
    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")
    out = str(tmp_path / "sess_out")
    df1.coalesce(1).write.mode("append").parquet(src)

    def run_phase():
        # file sink: the one sink kind that restarts from a checkpoint
        stream = spark.readStream.schema(df1.schema).parquet(src)
        q = (
            sessionize_stateful(stream, gap_minutes=30)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_phase()
    df2.coalesce(1).write.mode("append").parquet(src)
    run_phase()
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }

    full = df1.unionByName(df2)
    batch = sessionize(full, 30).collect()
    last = {}
    for r in batch:
        if r.user_id not in last or r.session_start > last[r.user_id].session_start:
            last[r.user_id] = r
    want = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in batch
        if last[r.user_id] is not r
    }
    # 2 closed/user from p1 + user 2's cross-phase close = 5; user 1's
    # cross-phase session merged into state and stayed open (got==want
    # proves the merge: it appears in neither side)
    assert len(got) == 5
    assert got == want


def test_stateful_sessionization_idle_timeout_flush(spark, tmp_path):
    """EventTimeTimeout idle flush: a user whose stream goes silent
    gets their open session emitted WITHOUT any follow-up event from
    them, once other users' events push the event-time watermark past
    last_ts + gap. Three files driven as three micro-batches in ONE
    availableNow run (maxFilesPerTrigger=1): file 1 opens user 1's
    session, files 2-3 carry only user 2 — whose timestamps advance
    the watermark and fire user 1's timeout in the final batch."""
    import datetime as dt

    from dblp_crawler_spark.streaming.events import sessionize_stateful

    base = dt.datetime(2024, 1, 1)
    schema = "event_id long, user_id long, ts timestamp, value double"
    f1 = [(i, 1, base + dt.timedelta(minutes=5 * i), 1.0) for i in range(3)]
    f2 = [(10, 2, base + dt.timedelta(hours=2), 2.0), (11, 2, base + dt.timedelta(hours=2, minutes=5), 2.0)]
    f3 = [(12, 2, base + dt.timedelta(hours=3), 3.0)]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    for rows in (f1, f2, f3):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        sessionize_stateful(stream, gap_minutes=30, idle_timeout=True)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "availableNow drain must terminate (no timeout busy-loop)"
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        # user 1's idle session: flushed by timeout, no follow-up event
        (1, base, base + dt.timedelta(minutes=10)): (3, 3.0),
        # user 2's first session: closed by their own later event (data path)
        (2, base + dt.timedelta(hours=2), base + dt.timedelta(hours=2, minutes=5)): (2, 4.0),
    }
    assert got == want  # user 2's final session is still open -> absent


def test_streaming_xml_ingestion(spark, universe, tmp_path):
    """The fetch→parse ingestion as a stream: raw XML documents land
    in a directory source; the Arrow-batched parser (mapInPandas)
    runs inside the streaming query; parsed person payloads arrive in
    the sink table with payload equality vs the struct truth."""
    from dblp_crawler_spark.sources.xml_pages import parse_pages_xml

    src = tmp_path / "raw_pages"
    rows = [
        (fixtures.person_url(pid), fixtures.render_person_xml(payload))
        for pid, payload in list(universe.persons.items())[:40]
        if pid not in universe.missing_pids
    ]
    spark.createDataFrame(rows, "url string, body string").write.parquet(str(src))

    stream = spark.readStream.schema("url string, body string").parquet(str(src))
    parsed = parse_pages_xml(stream, "person")
    q = (
        parsed.writeStream.format("memory")
        .queryName("parsed_pages")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.url: r.payload for r in spark.sql("SELECT * FROM parsed_pages").collect()}
    assert len(got) == len(rows)
    for pid, payload in list(universe.persons.items())[:40]:
        if pid in universe.missing_pids:
            continue
        p = got[fixtures.person_url(pid)]
        assert p["pid"] == payload["pid"]
        assert len(p["pubs"]) == len(payload["pubs"])


def test_streaming_curation_matches_batch(spark, tmp_path):
    """The curation chain (lang/quality/repetition gates + exact
    dedup) over a stream must keep exactly the batch pipeline's
    survivor set — including dedup ACROSS micro-batches via keyed
    state (two availableNow runs, same checkpoint: a duplicate
    arriving in run 2 of a text already kept in run 1 must NOT be
    re-emitted)."""
    from dblp_crawler_spark.streaming.documents import curate

    good = "the quick brown fox jumps over the lazy dog it is a fine day for all of us"
    rows1 = [
        (0, good),
        (1, good + " extra words here and there"),
        (2, "x y"),  # too short → gated
        (3, ("spam " * 40).strip()),  # repetitive → gated
    ]
    rows2 = [
        (4, good),  # exact dup of doc 0 across batches → deduped
        (5, good + " completely new tail for the second batch run"),
    ]
    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "docs_ckpt")
    df1 = spark.createDataFrame(rows1, "doc_id long, text string")
    df1.write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = (
            curate(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    spark.createDataFrame(rows2, "doc_id long, text string").write.mode("append").parquet(src)
    run_once()
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 5}  # 2,3 gated; 4 deduped across batches
    # batch mode, same definition: same survivor TEXTS (batch dedup
    # may keep either duplicate — compare on content)
    all_docs = spark.createDataFrame(rows1 + rows2, "doc_id long, text string")
    batch = curate(all_docs)
    texts = dict(rows1 + rows2)
    assert {texts[r.doc_id] for r in batch.collect()} == {texts[i] for i in got}


def test_asof_attribution_semantics(spark):
    """Hand-built stream: strictly-preceding semantics, per-user
    isolation, (ts, event_id) tiebreak, and null when no prior
    attr event exists."""
    from datetime import datetime

    from dblp_crawler_spark.streaming.events import asof_attribute

    T0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: view(1) @t0, click(2) @t0 (same ts, higher id → attributes to 1),
        # view(3) @t1, click(4) @t2 → attributes to 3
        (1, T0, 1, "view"), (2, T0, 1, "click"),
        (3, datetime(2026, 1, 1, 12, 1), 1, "view"),
        (4, datetime(2026, 1, 1, 12, 2), 1, "click"),
        # user 2: click(5) with NO prior view → null source
        (5, T0, 2, "click"),
        (6, datetime(2026, 1, 1, 12, 3), 2, "view"),
        # user 2: click(7) after view(6) → 6 (user-1 views invisible)
        (7, datetime(2026, 1, 1, 12, 4), 2, "click"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.event_id: r.src_event_id for r in asof_attribute(ev, "click", "view").collect()}
    assert got == {2: 1, 4: 3, 5: None, 7: 6}


def test_range_follow_join_semantics_and_plan(spark):
    """Boundary semantics ((a, a+Δ], bin-crossing pairs found) and
    plan shape (equi-join, no nested loop)."""
    from datetime import datetime, timedelta

    from dblp_crawler_spark.streaming.events import range_follow_join

    T0 = datetime(2026, 1, 1, 12, 0, 0)
    m = lambda k: T0 + timedelta(minutes=k)
    rows = [
        (1, m(0), 1, "click"),
        (2, m(29), 1, "purchase"),   # inside (bin-crossing for Δ=30 iff bins differ)
        (3, m(30), 1, "purchase"),   # exactly Δ → included (<=)
        (4, m(31), 1, "purchase"),   # outside
        (5, m(0), 1, "purchase"),    # same ts as anchor → excluded (strict >)
        (6, m(5), 2, "purchase"),    # other user → excluded
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {(r.anchor_id, r.follow_id, r.gap_ms) for r in range_follow_join(ev, "click", "purchase", 30).collect()}
    assert got == {(1, 2, 29 * 60000), (1, 3, 30 * 60000)}
    plan = range_follow_join(ev, "click", "purchase", 30)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_hypertable_rollup_partials_equal_direct(spark):
    """Day level composed from minute/hour partials must EXACTLY
    equal a direct day aggregation over raw rows (decimal sums are
    associative — this is what makes incremental refresh sound)."""
    from datetime import datetime, timedelta

    from dblp_crawler_spark.streaming.events import hypertable_rollup

    T0 = datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (i, T0 + timedelta(minutes=17 * i), i % 5, "click" if i % 2 else "view", 0.1 * i)
        for i in range(500)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string, value double")
    via_rollup = {(str(r.day), r.event_type): (r.n, r.sum_value) for r in hypertable_rollup(ev).collect()}
    direct = {
        (str(r.day), r.event_type): (r.n, r.sum_value)
        for r in ev.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("sum_value"),
        ).collect()
    }
    assert via_rollup == direct and len(direct) > 10


def test_streaming_hll_registers_equal_batch(spark, tmp_path):
    """HLL registers maintained as a streaming aggregation (two
    micro-batches via maxFilesPerTrigger=1) equal the one-shot batch
    build over the union — the CRDT-merge property under Structured
    Streaming, with state bounded by 2^p registers per group."""
    from dblp_crawler_spark.operators.sketch import hll_build
    from dblp_crawler_spark.streaming.sketches import hll_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id"
    )
    half = ev.filter(F.col("user_id") % 2 == 0)
    other = ev.subtract(half)
    src = str(tmp_path / "src")
    half.coalesce(1).write.mode("overwrite").parquet(src)
    other.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    regs = hll_stream(stream, "user_id", ["event_type"], p=12)
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r.event_type, r.register): r.rho
        for r in spark.sql("SELECT * FROM hll_regs").collect()
    }
    want = {
        (r.event_type, r.register): r.rho
        for r in hll_build(ev, "user_id", ["event_type"], p=12).collect()
    }
    assert got == want


def test_streaming_cms_counters_equal_batch(spark, tmp_path):
    """CMS counters maintained as a streaming aggregation equal the
    one-shot batch build — exact integer slot sums, so the equality
    is exact, not approximate."""
    from dblp_crawler_spark.operators.sketch import cms_build
    from dblp_crawler_spark.streaming.sketches import cms_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id"
    )
    # Split on event_id parity (a row partition, not a set op: subtract()
    # would collapse duplicate user_id rows and change the counters).
    half = ev.filter(F.col("event_id") % 2 == 0).select("user_id")
    other = ev.filter(F.col("event_id") % 2 != 0).select("user_id")
    ev = ev.select("user_id")
    src = str(tmp_path / "src")
    half.coalesce(1).write.mode("overwrite").parquet(src)
    other.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        cms_stream(stream, "user_id", d=4, w=256)
        .writeStream.format("memory")
        .queryName("cms_counters")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {(r.row, r.slot): r.cnt for r in spark.sql("SELECT * FROM cms_counters").collect()}
    want = {(r.row, r.slot): r.cnt for r in cms_build(ev, "user_id", d=4, w=256).collect()}
    assert got == want


def test_streaming_quota_cap(spark, tmp_path):
    """Per-source quota across micro-batches: the first n docs per
    source in (micro-batch order, id) are admitted with contiguous
    ranks; everything after the quota is dropped; a restart from the
    checkpoint does not re-admit."""
    from dblp_crawler_spark.streaming.documents import quota_cap_stream

    src = str(tmp_path / "src")
    # batch 0: s0 gets ids 0..3, s1 gets 100 | batch 1: s0 4..5, s1 101..104
    b0 = spark.createDataFrame(
        [(i, "s0") for i in range(4)] + [(100, "s1")], "doc_id long, source string"
    )
    b1 = spark.createDataFrame(
        [(4, "s0"), (5, "s0")] + [(101 + i, "s1") for i in range(4)],
        "doc_id long, source string",
    )
    b0.coalesce(1).write.mode("overwrite").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(b0.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        quota_cap_stream(stream, n=3)
        .writeStream.format("memory")
        .queryName("quota_cap")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_quota"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {(r.source, r.doc_id): r.rank
           for r in spark.sql("SELECT * FROM quota_cap").collect()}
    # file order is append order ONLY by luck of naming — derive the
    # actual per-batch arrival from which ids appear: s0 admits 3 of
    # its first-arriving batch's ids, s1 admits its first id plus 2
    # from the other batch
    s0 = {d: r for (s, d), r in got.items() if s == "s0"}
    s1 = {d: r for (s, d), r in got.items() if s == "s1"}
    assert sorted(s0.values()) == [0, 1, 2] and sorted(s1.values()) == [0, 1, 2]
    # directory file order is an implementation detail, so either
    # batch may arrive first — but each source's admitted (id, rank)
    # map must match one of the two arrival orders exactly
    assert s0 in ({0: 0, 1: 1, 2: 2},          # ids 0..3 arrived first
                  {4: 0, 5: 1, 0: 2})          # ids 4,5 arrived first
    assert s1 in ({100: 0, 101: 1, 102: 2},    # id 100 arrived first
                  {101: 0, 102: 1, 103: 2})    # ids 101..104 arrived first


def test_streaming_admission_matches_batch(spark, tmp_path):
    """admit_stream over two availableNow runs with one checkpoint:
    canonical aliases and traps are handled per-row, and a re-spelled
    re-discovery of a resource admitted in run 1 must NOT re-admit in
    run 2 (keyed state on the seen key survives the restart). The
    admitted RESOURCE set equals the batch admit_candidates set."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.frontier import admit_candidates
    from dblp_crawler_spark.streaming.frontier import admit_stream

    rows1 = [
        ("HTTP://A.org:80/x/?b=2&a=1",),   # resource X, spelling 1
        ("http://a.org/y#frag",),          # resource Y
        ("http://a.org/s?PHPSESSID=9",),   # trap → never admitted
    ]
    rows2 = [
        ("http://a.org/x?a=1&b=2",),       # resource X re-discovered → deduped
        ("https://b.org:443/z/",),         # resource Z
    ]
    src = str(tmp_path / "cand_src")
    out = str(tmp_path / "cand_out")
    ckpt = str(tmp_path / "cand_ckpt")
    spark.createDataFrame(rows1, "url string").write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("url string").parquet(src)
        q = (
            admit_stream(stream, hash_fn=hash60)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    spark.createDataFrame(rows2, "url string").write.mode("append").parquet(src)
    run_once()
    got = {(r.url, r.host) for r in spark.read.parquet(out).collect()}
    assert got == {
        ("http://a.org/x?a=1&b=2", "a.org"),
        ("http://a.org/y", "a.org"),
        ("https://b.org/z", "b.org"),
    }
    # batch admission over the full arrival set admits the same keys
    all_cands = spark.createDataFrame(rows1 + rows2, "url string")
    batch = admit_candidates(all_cands, hash_fn=hash60)
    assert {r.seen_key for r in batch.collect()} == {
        r.seen_key for r in spark.read.parquet(out).collect()
    }


def test_clip_gate_runs_under_streaming(spark, tmp_path):
    """The alignment gate is a stateless projection, so the SAME
    definition must run unchanged under Structured Streaming and
    agree with the batch result (the batch≡stream contract every
    stateless curation op in this repo keeps)."""
    from dblp_crawler_spark.operators.multimodal import clip_alignment_gate

    rows = [(i, [1 + (i % 3), 1, 0, 0], [1, 1 + (i % 5), 0, 0]) for i in range(40)]
    src = str(tmp_path / "pairs")
    df = spark.createDataFrame(rows, "id long, img_emb array<long>, cap_emb array<long>")
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        clip_alignment_gate(stream, tau_pct=80)
        .writeStream.format("memory").queryName("clip_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.id: (r.dot, r.align_keep) for r in spark.sql("SELECT * FROM clip_stream").collect()}
    want = {r.id: (r.dot, r.align_keep) for r in clip_alignment_gate(df, tau_pct=80).collect()}
    assert got == want and len(got) == 40
    assert {v[1] for v in got.values()} == {True, False}  # the gate discriminates


def test_fetch_plan_streaming_matches_batch(spark, tmp_path):
    """fetch_plan runs unchanged over a DISCOVERY STREAM (stream-
    static left join: the discovered sitemap entries stream in, the
    fetch state is a static table) and is batch-equivalent — the
    shape of continuous discovery feeding triage."""
    import datetime

    from dblp_crawler_spark.operators.recrawl import fetch_plan

    d = datetime.date
    disc_rows = [("u_new", d(2024, 7, 1)), ("u_changed", d(2024, 7, 1)),
                 ("u_fresh", d(2024, 5, 1)), ("u_nolastmod", None)]
    disc = spark.createDataFrame(disc_rows, "url string, lastmod date")
    state = spark.createDataFrame(
        [("u_changed", d(2024, 6, 15)), ("u_fresh", d(2024, 6, 15)),
         ("u_nolastmod", d(2024, 6, 15))],
        "url string, last_fetch date")
    src = str(tmp_path / "disc")
    disc.write.parquet(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(disc.schema).parquet(src)
    q = (
        fetch_plan(stream, state)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.url, r.action) for r in spark.read.parquet(out).collect()}
    want = {(r.url, r.action) for r in fetch_plan(disc, state).collect()}
    assert got == want == {
        ("u_new", "fetch"), ("u_changed", "fetch"),
        ("u_fresh", "skip"), ("u_nolastmod", "revalidate"),
    }


def test_streaming_fingerprint_matches_batch(spark, tmp_path_factory, tmp_path):
    """The replica-audit fingerprint maintained as a streaming
    aggregation equals the batch fingerprint over everything
    ingested — across TWO availableNow runs on a growing directory
    (the continuous-ingest shape)."""
    from dblp_crawler_spark.operators.audit import table_fingerprint
    from dblp_crawler_spark.streaming.sketches import fingerprint_stream

    src = str(tmp_path_factory.mktemp("fp_src"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)
    half1.write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = (
            fingerprint_stream(stream, group_cols=["source"])
            .writeStream.format("memory")
            .queryName("fp_state")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "fp_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        return {
            r.source: (r.n_rows, r.xor60, r.sum_lo, r.sum_mid, r.sum_hi)
            for r in spark.sql("SELECT * FROM fp_state").collect()
        }

    got1 = run()
    want1 = {
        r.source: (r.n_rows, r.xor60, r.sum_lo, r.sum_mid, r.sum_hi)
        for r in table_fingerprint(half1, group_cols=["source"]).collect()
    }
    assert got1 == want1
    # second batch of files lands; the resumed stream's state must
    # equal the batch fingerprint of the UNION
    half2.write.mode("append").parquet(src)
    got2 = run()
    want2 = {
        r.source: (r.n_rows, r.xor60, r.sum_lo, r.sum_mid, r.sum_hi)
        for r in table_fingerprint(docs, group_cols=["source"]).collect()
    }
    assert got2 == want2 and got2 != got1


def test_streaming_feed_discovery_matches_batch(spark, tmp_path):
    """Feed discovery over a stream keeps exactly the batch entry
    set, with the per-URL seen state surviving ACROSS micro-batches
    and restarts (two availableNow runs, one checkpoint: a URL
    re-announced in run 2 must NOT be re-emitted; a new URL must)."""
    from dblp_crawler_spark.streaming.frontier import discover_feeds

    def rss(*items):
        return ("<rss><channel>" + "".join(
            f"<item><link>{u}</link><pubDate>Tue, {d} Jun 2025 00:00:00 GMT"
            "</pubDate></item>" for u, d in items) + "</channel></rss>")

    rows1 = [("h1", rss(("https://h1.ex/a", 1), ("https://h1.ex/b", 2))),
             ("h2", rss(("https://h2.ex/x", 3)))]
    # run 2: /a re-announced (deduped), /c new
    rows2 = [("h1", rss(("https://h1.ex/a", 9), ("https://h1.ex/c", 4)))]
    src = str(tmp_path / "feed_src")
    out = str(tmp_path / "feed_out")
    ckpt = str(tmp_path / "feed_ckpt")
    spark.createDataFrame(rows1, "host string, feed_xml string") \
        .write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(
            "host string, feed_xml string").parquet(src)
        q = (discover_feeds(stream)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    spark.createDataFrame(rows2, "host string, feed_xml string") \
        .write.mode("append").parquet(src)
    run_once()
    got = {(r.url, str(r.published)) for r in spark.read.parquet(out).collect()}
    assert got == {("https://h1.ex/a", "2025-06-01"),
                   ("https://h1.ex/b", "2025-06-02"),
                   ("https://h2.ex/x", "2025-06-03"),
                   ("https://h1.ex/c", "2025-06-04")}
    # batch mode, same definition: same URL set (batch dedup may keep
    # either announcement of /a — compare on url)
    all_pages = spark.createDataFrame(
        rows1 + rows2, "host string, feed_xml string")
    assert {r.url for r in discover_feeds(all_pages).collect()} \
        == {u for u, _ in got}


def test_streaming_live_segment_monitor(spark, tmp_path):
    """Live-HLS monitoring: the sliding live window re-declares old
    segments on every re-fetch; across two availableNow runs with one
    checkpoint each (playlist, segment) emits exactly once, and new
    tail segments emit as they appear. Batch mode of the same
    definition yields the same segment set."""
    from dblp_crawler_spark.streaming.frontier import monitor_live_segments

    def live(*segs):
        return "#EXTM3U\n" + "".join(
            f"#EXTINF:6.0,\n{s}\n" for s in segs)

    url = "https://v.ex.org/live/chan1.m3u8"
    # fetch 1: segments 0-2; fetch 2 (same run): window slid to 1-3
    rows1 = [(url, live("s0.ts", "s1.ts", "s2.ts")),
             (url, live("s1.ts", "s2.ts", "s3.ts"))]
    # run 2: window slid to 3-5
    rows2 = [(url, live("s3.ts", "s4.ts", "s5.ts"))]
    src = str(tmp_path / "hls_src")
    out = str(tmp_path / "hls_out")
    ckpt = str(tmp_path / "hls_ckpt")
    spark.createDataFrame(rows1, "url string, m3u8 string") \
        .write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("url string, m3u8 string").parquet(src)
        q = (monitor_live_segments(stream)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    spark.createDataFrame(rows2, "url string, m3u8 string") \
        .write.mode("append").parquet(src)
    run_once()
    got = sorted(r.seg_url for r in spark.read.parquet(out).collect())
    assert got == [f"https://v.ex.org/live/s{i}.ts" for i in range(6)]

    all_fetches = spark.createDataFrame(rows1 + rows2, "url string, m3u8 string")
    batch = sorted(r.seg_url
                   for r in monitor_live_segments(all_fetches).collect())
    assert batch == got
