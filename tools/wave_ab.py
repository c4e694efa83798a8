"""Same-session interleaved A/B: AQE on vs off for the crawl wave core.

The wave DAG is fixed-shape; AQE's per-stage materialization adds
driver latency without changing any plan choice the engine hasn't
already made (broadcast fetch join, budget-bounded batches). This
measures wall time AND Spark job count per full fixture crawl at both
settings, interleaved within one session (the only comparison this
host's timing variance allows — see BENCH.md).

Usage: python tools/wave_ab.py [n_pairs] [master]
Prints one JSON line per run plus a summary.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from dblp_crawler_spark import fixtures  # noqa: E402
from dblp_crawler_spark.lakehouse import Lakehouse  # noqa: E402
from dblp_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine  # noqa: E402
from dblp_crawler_spark.session import get_spark  # noqa: E402


def run_once(spark, u, adaptive: bool, tag: str) -> dict:
    sc = spark.sparkContext
    sc.setJobGroup(tag, f"wave-ab {tag}", interruptOnCancel=False)
    with tempfile.TemporaryDirectory() as root:
        lake = Lakehouse(spark, root)
        fixtures.write_tables(spark, lake, u)
        eng = CrawlEngine(
            spark,
            lake,
            CrawlConfig(year=2000, rules=u.keyword_rules, host_budget=None,
                        adaptive_waves=adaptive),
        )
        t0 = time.monotonic()
        eng.initialize()
        metrics = eng.run_to_end()
        secs = time.monotonic() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
    sc.setJobGroup("", "")
    return {
        "adaptive_waves": adaptive,
        "sec": round(secs, 1),
        "waves": len(metrics),
        "jobs": jobs,
        "jobs_per_wave": round(jobs / max(1, len(metrics)), 1),
    }


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    master = sys.argv[2] if len(sys.argv) > 2 else "local[8]"
    spark = get_spark("wave-ab", master=master, shuffle_partitions=8)
    u = fixtures.make_universe(n_authors=300, n_pubs=900, seed=11, with_images=False)
    # untimed warm-up (JIT, codegen caches, parquet footer caches)
    run_once(spark, u, adaptive=True, tag="warmup")
    runs = []
    for i in range(n_pairs):
        for adaptive in (False, True) if i % 2 == 0 else (True, False):
            r = run_once(spark, u, adaptive, tag=f"pair{i}-{'on' if adaptive else 'off'}")
            r["pair"] = i
            runs.append(r)
            print(json.dumps(r), flush=True)
    by = {
        k: sorted(r["sec"] for r in runs if r["adaptive_waves"] is k) for k in (False, True)
    }
    summary = {
        "off_best": by[False][0], "off_median": by[False][len(by[False]) // 2],
        "on_best": by[True][0], "on_median": by[True][len(by[True]) // 2],
        "off_jobs_per_wave": min(r["jobs_per_wave"] for r in runs if not r["adaptive_waves"]),
        "on_jobs_per_wave": min(r["jobs_per_wave"] for r in runs if r["adaptive_waves"]),
    }
    print(json.dumps({"summary": summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
