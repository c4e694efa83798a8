"""Hot-host skew stress for the scheduler (r3 verdict item 4).

BENCH.md's throughput job runs at 85% one host; this pushes the
pathological end — 99% of a 1M-URL pending set on ONE host — through
`politeness_pop`'s salted two-level top-k and the per-(host,lane)
parallel politeness timeline, and records REAL per-task durations
from the Spark UI REST API (taskSummary quantiles) for every stage
with enough tasks to matter. The claim under test: salting keeps the
hot host's work spread across tasks, so no single task runs longer
than ~2x the stage median — the signature of a one-task hot-host
sort is a max/median ratio in the tens.

A uniform-host control of the same size runs in the same session so
the verdict is a same-session interleaved comparison, not an
absolute-time claim.

Usage: python tools/skew_stress.py [--n 1000000] [--budget 20000]
Writes .bench/skew_stress.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def make_frontier(spark, n: int, hot_frac: float):
    """Deterministic pending set: hot_frac of URLs on dblp.org, the
    rest spread over 100 minor hosts."""
    h = F.pmod(F.xxhash64("id"), F.lit(1000))
    return spark.range(n).select(
        F.format_string("pid/%02d/%07d", F.pmod("id", F.lit(97)), F.col("id")).alias("url"),
        F.when(h < int(hot_frac * 1000), F.lit("dblp.org"))
        .otherwise(F.concat(F.lit("host"), F.pmod(h, F.lit(100)).cast("string"), F.lit(".example.org")))
        .alias("host"),
        F.lit("pending").alias("status"),
        F.lit(0).alias("depth"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1 << 40)).alias("priority"),
        F.lit(0).alias("attempts"),
        F.lit(0).alias("wave_added"),
    )


def task_histograms(spark, min_tasks: int = 8) -> list[dict]:
    """Per-stage task-duration quantiles from the UI REST API for
    completed stages with >= min_tasks tasks."""
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return []

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1{path}", timeout=10) as r:
            return json.load(r)

    app = get("/applications")[0]["id"]
    out = []
    for st in get(f"/applications/{app}/stages?status=complete"):
        if st["numCompleteTasks"] < min_tasks:
            continue
        q = get(
            f"/applications/{app}/stages/{st['stageId']}/{st['attemptId']}"
            f"/taskSummary?quantiles=0.5,0.95,1.0"
        )
        dur = q["duration"]
        med = max(dur[0], 1.0)
        out.append({
            "stage": st["stageId"],
            "name": st["name"].split("\n")[0][:80],
            "n_tasks": st["numCompleteTasks"],
            "duration_ms_median": dur[0],
            "duration_ms_p95": dur[1],
            "duration_ms_max": dur[2],
            "max_over_median": round(dur[2] / med, 2),
        })
    return out


def run_case(spark, n: int, hot_frac: float, budget: int, lanes: int) -> dict:
    from dblp_crawler_spark.operators.scheduler import (
        politeness_pop,
        politeness_timeline_parallel,
    )

    pending = make_frontier(spark, n, hot_frac)
    t0 = time.monotonic()
    popped = politeness_pop(pending, budget)
    sched = popped.select(
        "host", "url", F.lit(0).cast("long").alias("ready_us")
    )
    tl = politeness_timeline_parallel(sched, delay_us=50_000, nconn=lanes)
    agg = tl.groupBy("host").agg(
        F.count("*").alias("n"), F.max("finish_us").alias("drain_us")
    ).agg(F.sum("n"), F.max("drain_us")).collect()[0]
    secs = round(time.monotonic() - t0, 3)
    return {"hot_frac": hot_frac, "n_scheduled": int(agg[0]), "seconds": secs}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--budget", type=int, default=20_000)
    ap.add_argument("--lanes", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--allow-dirty", action="store_true")
    args = ap.parse_args()

    from benchguard import refuse_if_dirty

    git = refuse_if_dirty(allow=args.allow_dirty)

    from dblp_crawler_spark.session import get_spark

    spark = get_spark(
        "skew-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    # warm-up both shapes once (codegen + worker spin-up, untimed)
    run_case(spark, args.n // 10, 0.99, args.budget, args.lanes)
    run_case(spark, args.n // 10, 0.0, args.budget, args.lanes)
    skew_runs, uniform_runs = [], []
    for _ in range(args.rounds):  # interleaved same-session pairs
        skew_runs.append(run_case(spark, args.n, 0.99, args.budget, args.lanes))
        uniform_runs.append(run_case(spark, args.n, 0.0, args.budget, args.lanes))
    hist = task_histograms(spark)
    big = [h for h in hist if h["n_tasks"] >= 8]
    worst = max((h["max_over_median"] for h in big), default=None)
    res = {
        "n_urls": args.n,
        "budget": args.budget,
        "lanes": args.lanes,
        "skew_seconds": [r["seconds"] for r in skew_runs],
        "uniform_seconds": [r["seconds"] for r in uniform_runs],
        "skew_over_uniform_median": round(
            sorted(r["seconds"] for r in skew_runs)[len(skew_runs) // 2]
            / sorted(r["seconds"] for r in uniform_runs)[len(uniform_runs) // 2],
            3,
        ),
        "worst_task_max_over_median": worst,
        "stages": sorted(big, key=lambda h: -h["duration_ms_max"])[:12],
        **git,
    }
    os.makedirs(os.path.join(os.path.dirname(__file__), "..", ".bench"), exist_ok=True)
    with open(os.path.join(os.path.dirname(__file__), "..", ".bench", "skew_stress.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
