"""IP-level politeness collapse (virtual hosting): hosts sharing a
server IP share ONE budget; unresolved hosts degrade to per-host
keys. Pins the collapse semantics and the DuckDB replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.scheduler import (
    ip_politeness_pop,
    ip_politeness_sql,
)


def _fixture(spark):
    # three vhosts on ip1, one host on ip2, one unresolved host
    pending = spark.createDataFrame(
        [(f"http://h{h}/p{i}", f"h{h}", (h * 10 + i) % 7)
         for h in range(5) for i in range(4)],
        "url string, host string, priority long",
    )
    dns = spark.createDataFrame(
        [("h0", "ip1"), ("h1", "ip1"), ("h2", "ip1"), ("h3", "ip2")],
        "host string, ip string",
    )
    return pending, dns


def test_shared_ip_shares_one_budget(spark):
    pending, dns = _fixture(spark)
    out = ip_politeness_pop(pending, dns, budget=3).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.ip_key, []).append(r)
    # ip1 serves h0+h1+h2 (12 pending rows) but gets exactly 3 slots
    assert len(by_key["ip1"]) == 3
    assert len(by_key["ip2"]) == 3          # h3 alone: min(4, 3)
    # unresolved h4 falls back to its own key, still budgeted
    assert len(by_key["host:h4"]) == 3
    # the ip1 winners are the global top-3 by (priority desc, url)
    pool = sorted(
        [r for r in pending.collect() if r.host in ("h0", "h1", "h2")],
        key=lambda r: (-r.priority, r.url),
    )[:3]
    assert sorted(r.url for r in by_key["ip1"]) == sorted(r.url for r in pool)


def test_original_host_column_survives(spark):
    pending, dns = _fixture(spark)
    out = ip_politeness_pop(pending, dns, budget=2)
    assert out.columns == ["url", "host", "priority", "ip_key"]
    for r in out.collect():
        assert r.url.startswith(f"http://{r.host}/")


def test_duckdb_replay_identical(spark):
    pending, dns = _fixture(spark)
    got = (
        ip_politeness_pop(pending, dns, budget=3)
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pending", pending.toPandas())
    con.register("dns", dns.toPandas())
    want = (
        con.sql(ip_politeness_sql("pending", "dns", 3)).df()
        .sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_plan_broadcasts_dns(spark):
    pending, dns = _fixture(spark)
    plan = ip_politeness_pop(pending, dns, budget=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
