#!/usr/bin/env python
"""Headline benchmark (driver contract).

Runs every query in __spark_entry__.queries() against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus a small end-to-end crawl of the
synthetic fixture universe, and prints ONE JSON line:

  {"metric": ..., "value": <total seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...}

Extra keys: per-wave crawl throughput (urls/sec) and the cached
two-parallelism scaling evidence from .bench/scaling.json (produced
by tools/bench_scaling.py — see BENCH.md; re-run it after engine
changes, it is too heavy to run inline on every bench invocation).

Each query is forced with a noop-format write (full execution, no
driver-side collect cost).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def time_query(fn, spark, sf_dir: str) -> float:
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def crawl_e2e(spark) -> tuple[float, float]:
    """Fixture-universe crawl to completion; returns (sec, urls/sec)."""
    from dblp_crawler_spark import fixtures
    from dblp_crawler_spark.lakehouse import Lakehouse
    from dblp_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine

    u = fixtures.make_universe(n_authors=300, n_pubs=900, seed=11, with_images=False)
    with tempfile.TemporaryDirectory() as root:
        lake = Lakehouse(spark, root)
        fixtures.write_tables(spark, lake, u)
        eng = CrawlEngine(spark, lake, CrawlConfig(year=2000, rules=u.keyword_rules, host_budget=None))
        t0 = time.monotonic()
        eng.initialize()
        metrics = eng.run_to_end()
        secs = time.monotonic() - t0
        urls = sum(m["scheduled"] + m["fetch_succ"] for m in metrics) / 2
    return round(secs, 3), round(urls / secs, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        sf = None

    from dblp_crawler_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qtimes: dict[str, float] = {}
    for name, fn in entry.queries().items():
        try:
            qtimes[name] = time_query(fn, spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            qtimes[name] = -1.0
            print(f"# {name} FAILED: {exc}", file=sys.stderr)

    crawl_sec, crawl_ups = crawl_e2e(spark)
    qtimes["crawl_e2e"] = crawl_sec

    out = {
        "metric": "frontier-engine query suite + fixture crawl, total seconds",
        "value": round(sum(t for t in qtimes.values() if t > 0), 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        # tiny fixture → dominated by per-wave driver latency, NOT a
        # throughput figure; the scaling block below is the
        # throughput evidence (400k+-URL frontier).
        "crawl_e2e_urls_per_sec_tiny_fixture": crawl_ups,
    }
    scal_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench", "scaling.json")
    if os.path.exists(scal_path):
        with open(scal_path) as f:
            s = json.load(f)
        p = s.get("primary", s)  # two-pair format (round 2) or legacy
        out["scaling"] = {
            "n_urls": p["n_urls"],
            "urls_per_sec_low": p["low"]["urls_per_sec"],
            "urls_per_sec_high": p["high"]["urls_per_sec"],
            "masters": [p["low"]["master"], p["high"]["master"]],
            "scaling_efficiency": p["scaling_efficiency"],
            "scaling_efficiency_median": p.get("scaling_efficiency_median"),
        }
        if "secondary" in s:
            q = s["secondary"]
            out["scaling_8_32"] = {
                "urls_per_sec_low": q["low"]["urls_per_sec"],
                "urls_per_sec_high": q["high"]["urls_per_sec"],
                "scaling_efficiency": q["scaling_efficiency"],
                "scaling_efficiency_median": q.get("scaling_efficiency_median"),
            }
    # 10x-frontier pair (8M URLs, bucketed large-wave fetch — r4)
    big_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench", "scaling_8m.json")
    if os.path.exists(big_path):
        with open(big_path) as f:
            p = json.load(f)
        out["scaling_8m"] = {
            "n_urls": p["n_urls"],
            "img_px": p.get("img_px"),
            "fetch": p.get("fetch"),
            "urls_per_sec_low": p["low"]["urls_per_sec"],
            "urls_per_sec_high": p["high"]["urls_per_sec"],
            "masters": [p["low"]["master"], p["high"]["master"]],
            "scaling_efficiency": p["scaling_efficiency"],
            "scaling_efficiency_median": p.get("scaling_efficiency_median"),
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
