"""Composed recrawl-wave planner (q_pipeline_recrawl_plan)."""

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from __spark_entry__ import q_pipeline_recrawl_plan

SF_DIR = "/root/testdata/sf0.001"


def test_recrawl_plan_structure(spark):
    out = q_pipeline_recrawl_plan(spark, SF_DIR).collect()
    assert out
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    for host, rows in by_host.items():
        # per-host admission cap
        assert len(rows) <= 5
        rows.sort(key=lambda r: r.k)
        # contiguous ranks; ready=0 wave => start is exactly k*delay
        assert [r.k for r in rows] == list(range(len(rows)))
        for r in rows:
            assert r.start_us == r.k * 500000
            assert r.finish_us == r.start_us + 500000
            assert r.priority is not None


def test_cap_admits_top_priorities(spark):
    """Hand fixture through the same stage chain: a host with 7
    candidate urls keeps exactly the 5 highest-priority ones."""
    from dblp_crawler_spark.operators import recrawl as RC
    from dblp_crawler_spark.operators.scheduler import politeness_timeline

    rows = []
    base = dt.datetime(2024, 1, 1)
    # url u{i} on host h0: i changes over i+1 refetches, then a
    # shared quiet tail so age/span differ per url
    for i in range(7):
        for j in range(i + 2):
            rows.append((f"https://h0.org/u{i}", base + dt.timedelta(hours=j),
                         f"v{j if j <= i else i}"))
        rows.append((f"https://h0.org/u{i}",
                     base + dt.timedelta(hours=100), f"v{i}"))
    log = spark.createDataFrame(rows, "url string, ts timestamp, fingerprint string")
    pr = RC.recrawl_priorities(log)
    cand = pr.filter(F.col("priority").isNotNull()).select(
        "url", F.regexp_extract("url", r"^https://([^/]+)/", 1).alias("host"),
        "priority")
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    adm = cand.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5)
    wave = adm.select("host", "url", "priority",
                      F.lit(0).cast("long").alias("ready_us"))
    got = politeness_timeline(wave, delay_us=500000).collect()
    assert len(got) == 5
    kept = {r.url for r in got}
    all_pr = {r.url: r.priority for r in cand.collect()}
    dropped = set(all_pr) - kept
    assert all(all_pr[d] <= min(all_pr[k] for k in kept) for d in dropped)
    # schedule is the exact sequential recurrence on a ready=0 queue
    for r in sorted(got, key=lambda r: r.k):
        assert r.start_us == r.k * 500000
