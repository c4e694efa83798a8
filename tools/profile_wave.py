"""Per-wave job-count + latency profile of the crawl engine.

r3 verdict item 3: crawl_e2e is driver-latency-bound (~5.6 s/wave on
a toy universe); the lever is Spark ACTIONS per wave. This runs a
fixture crawl with each wave wrapped in its own job group and reports
jobs/wave + seconds/wave, so a code A/B is a pair of these runs
alternated on an idle machine (ABAB).

Usage: python tools/profile_wave.py [--authors 300] [--pubs 900]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--authors", type=int, default=300)
    ap.add_argument("--pubs", type=int, default=900)
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--host-budget", type=int, default=0)
    args = ap.parse_args()

    from dblp_crawler_spark import fixtures
    from dblp_crawler_spark.lakehouse import Lakehouse
    from dblp_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from dblp_crawler_spark.session import get_spark

    spark = get_spark(
        "profile-wave", master=args.master, shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "true",
            **({"spark.sql.sources.parallelPartitionDiscovery.threshold":
                os.environ["PWAVE_LIST_THRESH"]}
               if os.environ.get("PWAVE_LIST_THRESH") else {}),
        },
    )
    sc = spark.sparkContext
    u = fixtures.make_universe(
        n_authors=args.authors, n_pubs=args.pubs, seed=11, with_images=False
    )
    with tempfile.TemporaryDirectory() as root:
        lake = Lakehouse(spark, root)
        fixtures.write_tables(spark, lake, u)
        budget = args.host_budget or None
        eng = CrawlEngine(
            spark, lake,
            CrawlConfig(year=2000, rules=u.keyword_rules, host_budget=budget),
        )
        t0 = time.monotonic()
        eng.initialize()
        init_s = round(time.monotonic() - t0, 3)
        waves = []
        t_all = time.monotonic()
        while not eng.done:
            g = f"wave{eng.wave}"
            sc.setJobGroup(g, g)
            tw = time.monotonic()
            m = eng.run_wave()
            waves.append({
                "wave": m["wave"],
                "seconds": round(time.monotonic() - tw, 3),
                "jobs": len(sc.statusTracker().getJobIdsForGroup(g)),
                "scheduled": m["scheduled"],
            })
        sc.setJobGroup("final", "final")
        eng.finalize()
        total = round(time.monotonic() - t_all, 3)
    # name every job of a representative steady-state wave via the
    # UI REST API (group ids arrive as job properties there)
    wave_jobs = []
    ui = sc.uiWebUrl
    if ui and len(waves) > 2:
        import urllib.request

        def get(path):
            with urllib.request.urlopen(f"{ui}/api/v1{path}", timeout=10) as r:
                return json.load(r)

        app = get("/applications")[0]["id"]
        mid = f"wave{waves[len(waves) // 2]['wave']}"

        def rest_ms(j):
            # REST stamps look like 2026-08-21T10:00:00.123GMT
            from datetime import datetime

            try:
                sub, comp = j["submissionTime"], j["completionTime"]
                fmt = "%Y-%m-%dT%H:%M:%S.%f"
                d = datetime.strptime(comp[:23], fmt) - datetime.strptime(sub[:23], fmt)
                return round(d.total_seconds() * 1000)
            except (KeyError, ValueError):
                return None

        for j in get(f"/applications/{app}/jobs"):
            if j.get("jobGroup") == mid:
                wave_jobs.append({
                    "job": j["jobId"],
                    "name": j["name"].split("\n")[0][:100],
                    "desc": (j.get("description") or "")[:100],
                    "duration_ms": rest_ms(j),
                    "n_tasks": j.get("numTasks"),
                })
    js = [w["jobs"] for w in waves]
    ss = [w["seconds"] for w in waves]
    print(json.dumps({
        "mid_wave_jobs": wave_jobs,
        "master": args.master,
        "n_waves": len(waves),
        "init_seconds": init_s,
        "total_seconds": total,
        "jobs_per_wave": js,
        "seconds_per_wave": ss,
        "jobs_per_wave_median": sorted(js)[len(js) // 2] if js else None,
        "seconds_per_wave_median": sorted(ss)[len(ss) // 2] if ss else None,
        "finalize_jobs": len(sc.statusTracker().getJobIdsForGroup("final")),
        "waves": waves,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
