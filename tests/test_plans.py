"""Physical-plan shape assertions — the .explain audit, automated.

These lock in the scale-critical plan properties so a refactor cannot
silently regress them:
  * filters/column pruning reach the parquet scan (PushedFilters /
    ReadSchema);
  * dimension joins broadcast (no shuffle of the big side);
  * the BFS filter path stays inside WholeStageCodegen (no Python
    eval in the hot path);
  * seen-set guards plan as broadcast/shuffle hash anti-joins, and
    the fetch join against the payload table broadcasts the
    (budget-bounded) scheduled keys rather than shuffling blobs.
"""

import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.frontier import crawler_filter, with_ccf
from dblp_crawler_spark.operators.scheduler import global_sequence, politeness_pop


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def sfdir():
    return "/root/testdata/sf0.001"


def test_scan_pushdown_and_pruning(spark, sfdir):
    li = spark.read.parquet(f"{sfdir}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan
    # column pruning: the scan must read only the two needed columns
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in rs and "l_quantity" in rs and "l_comment" not in rs


def test_dim_join_broadcasts(spark, sfdir):
    cust = spark.read.parquet(f"{sfdir}/customer.parquet")
    nation = spark.read.parquet(f"{sfdir}/nation.parquet")
    q = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    plan = plan_of(q)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ccf_dim_join_broadcasts(spark, sfdir):
    pubs = spark.createDataFrame(
        [("k1", "db/conf/v00"), ("k2", "db/conf/v01")], "key string, jk string"
    )
    dim = spark.createDataFrame([("db/conf/v00", "A")], "journal_key string, rank string")
    q = with_ccf(pubs, dim, F.col("jk"))
    plan = plan_of(q)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_crawler_filter_is_codegen(spark):
    """P1/P2 (year + CNF keyword match) must be pure JVM expressions:
    whole-stage codegen, no Python eval operators."""
    pubs = spark.createDataFrame(
        [(("k1", "t", "video edge computing", 2020),)],
        "pub struct<key:string,type:string,title:string,year:int>",
    )
    q = crawler_filter(pubs, 2000, [["video"], ["edge", "computing"]])
    plan = plan_of(q)
    # pure JVM expression filter: the CNF match compiles to
    # exists/forall array expressions (codegen-fallback but JVM-side,
    # vectorizable input) — and NEVER a Python eval operator
    assert "exists(" in plan and "codegen id" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "FlatMapGroupsInPandas", "MapInPandas"):
        assert bad not in plan, bad


def test_seen_antijoin_is_hash_join(spark, sfdir):
    orders = spark.read.parquet(f"{sfdir}/orders.parquet")
    seen = orders.select("o_custkey").limit(100)
    q = orders.join(seen, "o_custkey", "left_anti")
    plan = plan_of(q)
    assert "LeftAnti" in plan
    assert "HashJoin" in plan  # broadcast or shuffled hash — never cartesian


def test_politeness_pop_two_level_salted(spark):
    df = spark.createDataFrame(
        [("u1", "h1", 5), ("u2", "h1", 3), ("u3", "h2", 9)],
        "url string, host string, priority long",
    )
    plan = plan_of(politeness_pop(df, 2))
    # level 1 is keyed by (host, salt): the hot host's full pending
    # set is never ranked in a single task — per-salt local sorts cut
    # at the budget, then the final window ranks only the ≤
    # n_salts×budget survivors
    assert "hashpartitioning(host#" in plan.replace(" ", "") or "hashpartitioning(host," in plan
    assert "__salt" in plan
    assert plan.count("Window") >= 2


def test_politeness_pop_matches_single_window(spark):
    """Salted two-level pop ≡ the naive single window, including
    budget-dim hosts, null-budget hosts, and ties broken by url."""
    from pyspark.sql import Window as W

    rows = [
        (f"u{i:03d}", f"h{i % 5}", (i * 7) % 11) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "url string, host string, priority long")
    budgets = spark.createDataFrame([("h0", 3), ("h1", 1)], "host string, budget long")
    got = politeness_pop(df, 4, budgets, n_salts=4)
    w = W.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    bdim = budgets.withColumnRenamed("budget", "__b")
    want = (
        df.join(bdim, "host", "left")
        .withColumn("__eff", F.least(F.coalesce(F.lit(4).cast("long"), F.col("__b")), F.coalesce(F.col("__b"), F.lit(4).cast("long"))))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__eff"))
        .select("url", "host", "priority")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # no-budget hosts pass through untouched
    got2 = politeness_pop(df, None, budgets, n_salts=4)
    w_b = {r.host: r.budget for r in budgets.collect()}
    expect_n = sum(
        min(w_b.get(h, 10**9), sum(1 for r in rows if r[1] == h))
        for h in {r[1] for r in rows}
    )
    assert got2.count() == expect_n


def test_global_sequence_no_python_no_global_window(spark):
    df = spark.createDataFrame(
        [(f"u{i}", i % 7) for i in range(50)], "url string, priority long"
    )
    q = global_sequence(df, 0, [F.desc("priority"), F.asc("url")])
    plan = plan_of(q)
    for bad in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert bad not in plan, bad
    # the big-side window is keyed by partition id; the only
    # unkeyed window runs on the #partitions-row offsets aggregate.
    # The range exchange itself is frozen behind the branch-
    # consistency localCheckpoint, so the consumer plan reads the
    # checkpointed RDD rather than re-planning the exchange —
    # exactly the property the checkpoint exists to enforce.
    assert "ExistingRDD" in plan or "LogicalRDD" in plan, plan
    assert "row_number" in plan
    # the exchange is real — it lives in the checkpointed prefix:
    # sequencing output must be the exact total-order enumeration
    rows = sorted(q.collect(), key=lambda r: (-r.priority, r.url))
    assert [r.seq for r in rows] == list(range(50))


def test_fetch_join_broadcasts_keys_not_blobs(spark, tmp_path):
    """The payload fetch must broadcast the scheduled KEYS; the blob
    side must stay on its scan partitioning (no exchange above the
    payload scan other than the broadcast)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    images = spark.createDataFrame(
        [(f"img_{i}", bytearray(b"x" * 10), 8, 8, "png", "c", 0) for i in range(100)],
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    p = str(tmp_path / "imgs")
    images.write.parquet(p)
    imgs = spark.read.parquet(p)
    keys = spark.createDataFrame([(f"img_{i}",) for i in range(5)], "image_id string")
    q = imgs.join(F.broadcast(keys), "image_id", "inner")
    plan = plan_of(q)
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # blobs never shuffle


def test_top_ngrams_is_local_topk(spark, sfdir):
    """Corpus top-k must plan as TakeOrderedAndProject (per-partition
    local top-k) — a global Sort before the limit would materialize
    the full gram distribution."""
    from dblp_crawler_spark.operators.textstats import top_ngrams

    docs = spark.read.parquet(f"{sfdir}/documents.parquet")
    plan = plan_of(top_ngrams(docs, n=3, k=20))
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan


def test_textstats_scan_prunes_columns(spark, sfdir):
    """Per-doc text metrics read ONLY (doc_id, text) from the scan —
    a full-row read for a 2-column projection is wrong at 100 TB."""
    from dblp_crawler_spark.operators.textstats import repetition_ratio

    docs = spark.read.parquet(f"{sfdir}/documents.parquet")
    plan = plan_of(docs.select("doc_id", F.round(repetition_ratio("text"), 4).alias("r")))
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {"doc_id", "text"}


def test_hamming_near_dups_is_equi_join(spark):
    """The phash/simhash near-dup kernel must plan as an equi-join on
    the prefix block — never a cartesian/broadcast-nested-loop."""
    from dblp_crawler_spark.operators.dedup import hamming_near_dups

    df = spark.range(100).select(
        F.concat(F.lit("im"), F.col("id")).alias("image_id"), F.xxhash64("id").alias("ph")
    )
    plan = plan_of(hamming_near_dups(df, "ph", "image_id", max_hamming=4, prefix_bits=8))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_clip_align_gate_is_map_only(spark):
    """The alignment gate must stay a pure projection: no Exchange,
    no Python eval — one codegen'd scan->project pipeline."""
    from dblp_crawler_spark.operators.multimodal import clip_alignment_gate

    df = spark.createDataFrame(
        [(1, [1, 2], [3, 4])], "id long, img_emb array<long>, cap_emb array<long>"
    )
    p = plan_of(clip_alignment_gate(df))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_drop_dups_keep_best_single_shuffle(spark):
    """Keep-best dedup is ONE hash-partitioned exchange on the group
    key (plus the window sort inside partitions) — no global sort,
    no second shuffle."""
    from dblp_crawler_spark.operators.dedup import drop_dups_keep_best

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20)], "doc_id long, caption string, area long"
    )
    import re

    p = plan_of(drop_dups_keep_best(df, "caption", "area"))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "hashpartitioning(caption" in p
    assert "rangepartitioning" not in p  # a global Sort would plan this
    # partial top-1 runs map-side BEFORE the exchange (WindowGroupLimit
    # both below and above it) — the 'map-side combine' of keep-best
    assert len(re.findall(r"\(\d+\) WindowGroupLimit", p)) == 2


def test_pigeonhole_hamming_is_equi_join(spark):
    """The guaranteed-recall multi-block kernel must also plan as an
    equi-join (on block index + value) — the (k+1)x fan-in must not
    degrade into a cartesian."""
    from dblp_crawler_spark.operators.dedup import hamming_near_dups_exact

    df = spark.range(100).select(
        F.concat(F.lit("im"), F.col("id")).alias("image_id"),
        F.pmod(F.xxhash64("id"), F.lit(1 << 60)).alias("ph"),
    )
    plan = plan_of(hamming_near_dups_exact(df, "ph", "image_id", max_hamming=3, width=60))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_robots_decide_is_host_equi_join(spark):
    """Rule evaluation joins urls to per-host rules on host — a
    bounded fan-out equi-join, never a cartesian over urls x rules."""
    from dblp_crawler_spark.operators.scheduler import robots_decide

    urls = spark.range(200).select(
        F.concat(F.lit("http://h"), F.col("id") % 10, F.lit(".org/p/"), F.col("id")).alias("url")
    )
    rules = spark.createDataFrame(
        [(f"h{i}.org", "disallow", "/private*") for i in range(10)],
        "host string, rule string, pattern string",
    )
    plan = plan_of(robots_decide(urls, rules))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_adaptive_delay_single_host_exchange(spark):
    """The rank window, the host-wide windows, and the collapse agg
    must share ONE host-keyed exchange (the quantiles/fetch_backoff
    discipline)."""
    import re

    from dblp_crawler_spark.operators.scheduler import adaptive_crawl_delay

    log = spark.range(300).select(
        F.concat(F.lit("h"), F.col("id") % 7).alias("host"),
        (F.col("id") % 50 * 10).alias("latency_ms"),
        (F.col("id") % 3 != 0).alias("ok"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )
    p = plan_of(adaptive_crawl_delay(log))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_pq_codebook_joins_broadcast(spark):
    """PQ assignment and the ADC distance table must broadcast the
    codebook (m x n_codes rows) — corpus subvectors never shuffle on
    the join key."""
    from dblp_crawler_spark.operators.similarity import pq_adc_topk, pq_encode, pq_train

    import numpy as np

    rng = np.random.default_rng(3)
    corpus = spark.createDataFrame(
        [(i, rng.normal(size=16).tolist()) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    cb = pq_train(corpus, dim=16, m=4, n_codes=4, iters=1, seed=2)
    codes = pq_encode(corpus, cb, dim=16, m=4, n_codes=4)
    queries = corpus.limit(2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    p_enc = plan_of(codes)
    p_adc = plan_of(pq_adc_topk(queries, codes, cb, dim=16, m=4, k=5))
    assert "BroadcastHashJoin" in p_enc
    assert "BroadcastHashJoin" in p_adc


def test_cloaking_detect_two_exchanges_no_join(spark):
    """cloaking_detect's UA pivot folds into the (host,url) agg —
    the plan is two keyed aggregations, no join of any kind."""
    from dblp_crawler_spark.operators.hostdup import cloaking_detect

    df = spark.createDataFrame(
        [("h", "/u", "crawler", "x")],
        "host string, url string, ua_class string, content_hash string")
    import re

    p = plan_of(cloaking_detect(df))
    assert "Join" not in p and "CartesianProduct" not in p
    # formatted explain names each node twice (tree + detail section)
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2


def test_strip_boilerplate_no_cartesian(spark):
    """The boilerplate verdict joins back on (host, line) — an equi
    hash join, never nested-loop."""
    from dblp_crawler_spark.sources.webparse import strip_boilerplate

    df = spark.createDataFrame(
        [("h", "/u", "a\nb")], "host string, url string, text string")
    p = plan_of(strip_boilerplate(df))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_payload_tiers_map_only(spark):
    """payload_complete / payload_admission / exif_strip must stay
    pure projections: no Exchange — blobs never shuffle."""
    from pyspark.sql import functions as F2
    from dblp_crawler_spark.operators.sniff import (
        exif_strip,
        payload_admission,
        payload_complete,
    )

    df = spark.createDataFrame([("a", "FFD8FF")], "id string, hx string") \
        .select("id", F2.unhex("hx").alias("bytes"))
    for op in (payload_complete, exif_strip):
        assert "Exchange" not in plan_of(op(df))
    assert "Exchange" not in plan_of(payload_admission(df))


def test_range_reassembly_single_exchange(spark):
    """The interval-union window and the rollup share one (url,total)
    partitioning — exactly one Exchange in the plan."""
    from dblp_crawler_spark.operators.freshness import range_reassembly

    df = spark.createDataFrame(
        [("u", 0, 9, 100)],
        "url string, part_start long, part_end long, total_bytes long")
    import re

    p = plan_of(range_reassembly(df))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_image_channels_are_map_only(spark):
    """figure_captions / data_uri_images / lazyload_images /
    jsonld_images are regexp projections: no Exchange anywhere —
    page HTML must never shuffle."""
    from dblp_crawler_spark.sources.webparse import (
        data_uri_images,
        figure_captions,
        jsonld_images,
        lazyload_images,
    )
    pages = spark.createDataFrame(
        [("https://a.org/p", "<img src='x.jpg'>")], "url string, html string")
    for fn in (figure_captions, data_uri_images, lazyload_images,
               jsonld_images):
        p = plan_of(fn(pages))
        assert "Exchange" not in p, (fn.__name__, p)


def test_caption_election_two_window_exchanges(spark):
    """The election costs exactly two Exchanges: extract_images'
    widest-candidate window (url, tag_idx) feeding the alt channel,
    plus the election window (url, img_url). Nothing else may
    shuffle — page HTML stays map-side throughout."""
    import re
    from dblp_crawler_spark.sources.webparse import caption_election

    pages = spark.createDataFrame(
        [("https://a.org/p", "<img src='x.jpg' alt='a'>")],
        "url string, html string")
    p = plan_of(caption_election(pages))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2, p
    assert "Join" not in p


def test_audio_structure_tiers_are_map_only(spark):
    """wav/mp3/zstd/parquet structure and audio_admission are pure
    header projections — no Exchange, no join."""
    from dblp_crawler_spark.operators.sniff import (
        audio_admission,
        mp3_structure,
        parquet_structure,
        wav_structure,
        zstd_structure,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a", "FFD8FF")], "doc_id string, hx string")
    blobs = df.select("doc_id", F.unhex("hx").alias("bytes"))
    for fn in (wav_structure, mp3_structure, zstd_structure,
               parquet_structure, audio_admission):
        p = plan_of(fn(blobs))
        assert "Exchange" not in p and "Join" not in p, (fn.__name__, p)


def test_scene_transcripts_single_join_no_cartesian(spark):
    """Alignment is ONE equi-join on video_id (never a nested-loop/
    cartesian) + the grouping agg."""
    from dblp_crawler_spark.operators.multimodal import (
        scene_segments,
        scene_transcripts,
    )
    from dblp_crawler_spark.sources.subtitles import webvtt_cues

    frames = spark.createDataFrame(
        [("v", 0, 1, 0)], "video_id string, frame_idx int, phash long, ts_ms long")
    files = spark.createDataFrame(
        [("v", "00:00.000 --> 00:01.000\nhi\n")], "video_id string, vtt string")
    p = plan_of(scene_transcripts(scene_segments(frames), webvtt_cues(files)))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p


def test_structured_extractors_are_map_only(spark):
    """html_tables / code_blocks / feed_enclosures / sitemap_videos /
    hls_media_renditions are nested-explode projections: no Exchange
    — page text never shuffles."""
    from dblp_crawler_spark.sources.hls import hls_media_renditions
    from dblp_crawler_spark.sources.webparse import (
        code_blocks,
        feed_enclosures,
        html_tables,
        sitemap_videos,
    )
    pages = spark.createDataFrame(
        [("https://a.org/p", "<table><tr><td>x</td></tr></table>")],
        "url string, html string")
    for fn in (html_tables, code_blocks):
        assert "Exchange" not in plan_of(fn(pages)), fn.__name__
    feeds = spark.createDataFrame([("h", "<rss/>")],
                                  "host string, feed_xml string")
    assert "Exchange" not in plan_of(feed_enclosures(feeds))
    sm = spark.createDataFrame([("h", "<urlset/>")],
                               "host string, sitemap_xml string")
    assert "Exchange" not in plan_of(sitemap_videos(sm))
    m3u = spark.createDataFrame([("u", "#EXTM3U\n")],
                                "url string, m3u8 string")
    assert "Exchange" not in plan_of(hls_media_renditions(m3u))


def test_bucketed_fetch_no_blob_exchange(spark, tmp_path):
    """The LARGE-wave fetch regime (throughput_job --fetch bucketed;
    r4): when a wave outgrows a driver-built broadcast, the images
    table is bucketed by image_id and the join must (a) read it
    `Bucketed: true` with NO Exchange above the blob scan — only the
    slim key side shuffles — and (b) never fall back to broadcast
    (that driver-side build is the level-independent constant that
    broke the 2M-row scaling pair)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from throughput_job import N_BUCKETS, _declare_bucketed

    images = spark.createDataFrame(
        [(f"img_{i:05d}", bytearray(b"x" * 10), 8, 8, "png", "c", 0)
         for i in range(1000)],
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    outdir = str(tmp_path / "bktfetch")
    (images.repartition(N_BUCKETS, "image_id").write.mode("overwrite")
     .bucketBy(N_BUCKETS, "image_id").sortBy("image_id")
     .option("path", outdir + "/images_bucketed").saveAsTable("images_b_test"))
    spark.sql("DROP TABLE IF EXISTS images_b_test")
    _declare_bucketed(spark, outdir)
    try:
        keys = spark.range(200).select(
            F.format_string("img_%05d", F.col("id")).alias("image_id"))
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # AQE wraps the plan in AdaptiveSparkPlan(isFinalPlan=false)
        # and hides the exchanges from the static explain; the
        # throughput job runs this join with AQE off anyway
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            q = spark.table("images_b").join(keys, "image_id", "inner")
            plan = plan_of(q)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        assert "Bucketed: true" in plan
        assert "BroadcastHashJoin" not in plan
        # exactly ONE exchange node: the slim key side into the
        # bucket layout; none above the images scan (formatted mode
        # renders each exchange once in the tree as "Exchange (n)")
        assert plan.count("Exchange (") == 1, plan
        assert q.count() == 200
    finally:
        spark.sql("DROP TABLE IF EXISTS images_b")
