"""Frontier throughput job — the north-rule scaling evidence.

Runs the engine's per-wave scheduled+fetched core over a large
synthetic frontier of image+caption pages (BASELINE.json metric:
"frontier URLs scheduled+fetched/sec"):

  scan frontier → robots filter → per-host politeness window (O5) →
  priority pop → JVM-side crawl-order sequencing (T3) → salted
  rebalance of the hot host (O6) → fetch-join against the
  image+caption table (S1; exact input_hint shape) → Arrow-batched
  decode + PSNR/phash payload gate (F6) → counters.

Two phases so both parallelism levels read the *same* input:

  --prepare  generates frontier + images parquet once (deterministic,
             seeded by row id; 85% of URLs on the hot host dblp.org,
             mirroring fixtures.host_of_pid);
  --measure  times the wave core end-to-end and prints one JSON line
             {"n_scheduled":..,"n_fetched":..,"seconds":..,
              "urls_per_sec":..,"master":..}.

The sandbox has no multi-node cluster; per the driver instruction the
north_rule's N→4N-executor criterion is evidenced by running this
job via `spark-submit --py-files` at two parallelism levels (default
local[4] vs local[16] — both under the 32 physical cores, so the
4×-cores comparison is not confounded by all-core frequency droop) on
the same prepared input (tools/bench_scaling.py orchestrates and computes
the scaling efficiency).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Iterator

# when shipped via --py-files the package zip is on sys.path already;
# when run from the repo, add the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dblp_crawler_spark import codecs, schemas  # noqa: E402

from dblp_crawler_spark.operators.multimodal import decode_and_verify, payload_gate  # noqa: E402
from dblp_crawler_spark.operators.scheduler import (  # noqa: E402
    global_sequence,
    politeness_pop,
    robots_status,
)

IMG_W = IMG_H = 64


def _spark(master: str | None, shuffle: int | None, extra: dict | None = None) -> SparkSession:
    from dblp_crawler_spark.session import get_spark

    # smaller scan splits than the engine default: the images table is
    # a few GB but each byte carries real decode CPU — more splits keep
    # every core fed at both parallelism levels.
    return get_spark(
        app_name="frontier-throughput",
        master=master,
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            # blob rows are ~12 KB — at the default 10k rows/batch each
            # in-flight Arrow batch is ~120 MB *per task*, which at 32
            # tasks is GBs of transient heap and GC thrash. Size
            # batches by bytes, not the row-count default.
            "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
            # fixed stage plan, no runtime re-planning latency: the
            # wave core's shape is known (broadcast fetch join, scan-
            # partitioned decode), so AQE only adds per-stage pauses.
            "spark.sql.adaptive.enabled": "false",
            **(extra or {}),
        },
    )


# ---- prepare ---------------------------------------------------------------
def _gen_images(ids: DataFrame, img_px: int = IMG_W) -> DataFrame:
    """Arrow-batched synthesis of the input_hint images table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
            for iid, j in zip(pdf["image_id"], pdf["id"]):
                fmt = "png" if j % 2 == 0 else "jpeg"
                px = codecs.synth_pixels(iid, img_px, img_px)
                rows["image_id"].append(iid)
                rows["bytes"].append(codecs.encode_image(px, fmt))
                rows["w"].append(img_px)
                rows["h"].append(img_px)
                rows["fmt"].append(fmt)
                rows["caption"].append(f"synthetic figure {iid}")
                rows["phash"].append(codecs.phash64(px))
            yield pd.DataFrame(rows)

    return ids.mapInPandas(run, schemas.IMAGES)


#: bucket count for the large-wave fetch path: ≥ 4N cores at the high
#: parallelism level so the bucket-aligned join stage keeps every
#: core fed, and small enough that a bucket's blobs sort in memory.
N_BUCKETS = 128


def _declare_bucketed(spark: SparkSession, outdir: str) -> None:
    """(Re-)declare the bucketed images table in this session's
    in-memory catalog over the existing bucketed files — bucket
    specs live in the catalog, not the files, so every fresh
    spark-submit session re-creates the (external) definition."""
    spark.sql("DROP TABLE IF EXISTS images_b")
    spark.sql(f"""
        CREATE TABLE images_b (
          image_id string, bytes binary, w int, h int,
          fmt string, caption string, phash long)
        USING parquet
        CLUSTERED BY (image_id) SORTED BY (image_id) INTO {N_BUCKETS} BUCKETS
        LOCATION '{os.path.join(outdir, "images_bucketed")}'
    """)


def prepare_bucketed(spark: SparkSession, outdir: str, n: int, img_px: int) -> None:
    """Large-wave variant of :func:`prepare`: the images table is
    written BUCKETED by image_id (one file per bucket, sorted), so
    the fetch join needs NO driver-side broadcast build and NO blob
    shuffle at any wave size — the scheduled keys shuffle into the
    bucket layout (slim rows), the blobs are read join-aligned in
    place. This is the 10^10-scale fetch shape the engine documents
    (plans/crawl.py S1 note): broadcast-keys for budget-bounded
    waves, bucket-aligned join once a wave outgrows a broadcast."""
    base = spark.range(n).select(
        "id", F.format_string("img_%09d", F.col("id")).alias("image_id")
    )
    spark.sql("DROP TABLE IF EXISTS images_b")
    (
        _gen_images(base.repartition(N_BUCKETS, "image_id"), img_px)
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "image_id").sortBy("image_id")
        .option("path", os.path.join(outdir, "images_bucketed"))
        .saveAsTable("images_b")
    )
    _write_frontier(spark, base, outdir)


def prepare(spark: SparkSession, outdir: str, n: int, img_px: int = IMG_W) -> None:
    base = spark.range(n).select(
        "id", F.format_string("img_%09d", F.col("id")).alias("image_id")
    )
    # many small files + small row groups: parquet splitting is
    # row-group granular, so 128 MB row groups would collapse the
    # 32 MB scan splits into a handful of real work units and starve
    # the decode stage of parallelism (stragglers at high core counts).
    n_files = max(32, n // 2000)
    (
        _gen_images(base.repartition(n_files), img_px)
        .write.mode("overwrite")
        .option("parquet.block.size", str(8 * 1024 * 1024))
        .parquet(os.path.join(outdir, "images"))
    )
    _write_frontier(spark, base, outdir)


def _write_frontier(spark: SparkSession, base: DataFrame, outdir: str) -> None:
    # frontier: same 85/15 hot-host split as fixtures.host_of_pid; priority
    # from the url hash (stands in for the ccf/year-derived priority).
    h = F.pmod(F.xxhash64("image_id"), F.lit(100))
    frontier = base.select(
        F.concat(F.lit("img/"), "image_id").alias("url"),
        F.when(h < 85, F.lit("dblp.org"))
        .otherwise(F.concat(F.lit("host"), (F.pmod(F.xxhash64("image_id"), F.lit(3)) + 1).cast("string"), F.lit(".example.org")))
        .alias("host"),
        F.lit("pending").alias("status"),
        F.lit(0).alias("depth"),
        F.pmod(F.xxhash64("image_id", F.lit(7)), F.lit(1 << 40)).alias("priority"),
        F.lit(0).alias("attempts"),
        F.lit(0).alias("wave_added"),
    )
    frontier.write.mode("overwrite").parquet(os.path.join(outdir, "frontier"))


# ---- measure ---------------------------------------------------------------
def _scheduled(
    spark: SparkSession, indir: str, host_budget: int | None, sample: float | None = None
) -> DataFrame:
    frontier = spark.read.parquet(os.path.join(indir, "frontier"))
    if sample is not None:
        frontier = frontier.sample(sample, seed=7)
    robots = spark.createDataFrame(
        [("dblp.org", ["private/"], 50), ("host1.example.org", ["img/img_00000000"], 200)],
        schemas.ROBOTS,
    )
    pending = robots_status(frontier, robots).filter(F.col("status") == "pending")
    return politeness_pop(pending, host_budget)


def run_wave_core(
    spark: SparkSession, indir: str, host_budget: int | None, sample: float | None = None,
    fetch: str = "broadcast",
) -> tuple[int, float]:
    sched = _scheduled(spark, indir, host_budget, sample)
    seq = global_sequence(sched.select("url", "priority"), 0, [F.desc("priority"), F.asc("url")])

    # Fetch = join of the scheduled keys against the image store. The
    # payload bytes must NEVER travel through a shuffle — a blob
    # shuffle is pure I/O that scales with data, not cores (measured:
    # it alone erases the 8→32-core speedup). Two wave regimes:
    #   broadcast — budget-bounded waves, tiny next to the payload
    #     table: broadcast the KEYS into the images scan and decode
    #     at the scan site (scan splits provide the parallelism).
    #     The broadcast build is a DRIVER-SIDE single-thread cost —
    #     level-independent, so at multi-million-row waves it eats
    #     the N→4N scaling margin (measured: ~0.55 eff at a 2M-row
    #     full-frontier wave).
    #   bucketed — waves too large to broadcast: images bucketed by
    #     image_id (one sorted file per bucket), the slim key side
    #     shuffles into the bucket layout, blobs are read
    #     join-aligned in place. Everything scales with cores; no
    #     driver-side constant. (The 10^10-scale shape.)
    keys = seq.withColumn("image_id", F.substring_index("url", "/", -1))
    if fetch == "bucketed":
        images = spark.table("images_b")
        fetched = images.join(keys, "image_id", "inner")
    else:
        images = spark.read.parquet(os.path.join(indir, "images"))
        fetched = images.join(F.broadcast(keys), "image_id", "inner")
    gated = payload_gate(decode_and_verify(fetched))
    # single action: scheduling, sequencing (the sort + row_number run
    # to produce the joined rows), fetch join and payload verification
    # all materialize under this one aggregate.
    agg = gated.agg(
        F.count("*").alias("n"),
        F.sum(F.col("payload_ok").cast("long")).alias("n_ok"),
        F.min("psnr_db").alias("min_psnr"),
    ).collect()[0]
    assert agg["n_ok"] == agg["n"], f"payload gate failed: {agg}"
    return agg["n"], float(agg["min_psnr"])


def measure(
    spark: SparkSession, indir: str, host_budget: int | None, warmup: bool, n_runs: int = 4,
    fetch: str = "broadcast", telemetry: bool = False,
) -> dict:
    if warmup:
        # untimed FULL warm-up run: spawns every Python worker, JIT/
        # codegen-compiles the whole pipeline, and faults the input
        # into the page cache. (A 5%-sample warm-up left a monotone
        # decay across the first 4-5 timed runs at high core counts —
        # warm-up leakage that poisons the median.)
        run_wave_core(spark, indir, host_budget, fetch=fetch)
    # The scheduled count is the politeness-pop output BEFORE the
    # image join (n_fetched is the post-join row count — they can
    # differ if a scheduled url has no stored page). The input is
    # static across runs, so count it once, untimed.
    n_sched = _scheduled(spark, indir, host_budget).count()
    # best-of-N AND median-of-N are both reported: the scaling
    # criterion is about sustained throughput on a warm cluster
    # (codegen, heap growth, Python worker pool fill excluded), but a
    # gate verdict should not flip on the min-vs-median choice — the
    # orchestrator records both.
    runs = []
    for i in range(n_runs):
        t0 = time.monotonic()
        n_fetched, min_psnr = run_wave_core(spark, indir, host_budget, fetch=fetch)
        runs.append(round(time.monotonic() - t0, 3))
        print(f"# run {i}: {runs[-1]}s", flush=True)
    secs = min(runs)
    srt = sorted(runs)
    secs_median = round((srt[len(srt) // 2] + srt[(len(srt) - 1) // 2]) / 2, 3)
    master = spark.sparkContext.master
    extra = {}
    if telemetry:
        from telemetry import stage_telemetry

        # r4 verdict item 8: per-stage shuffle/spill/skew bytes — the
        # baseline the next 10x (80M) compares against
        extra["stages"] = stage_telemetry(spark, top=15)
    return {
        **extra,
        "master": master,
        "n_scheduled": n_sched,
        "n_fetched": n_fetched,
        "min_psnr_db": round(min_psnr, 2),
        "seconds": secs,
        "seconds_median": secs_median,
        "all_runs": runs,
        "urls_per_sec": round((n_sched + n_fetched) / 2 / secs, 1),
        "urls_per_sec_median": round((n_sched + n_fetched) / 2 / secs_median, 1),
        "fetch": fetch,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--dir", required=True)
    ap.add_argument("--n", type=int, default=400_000)
    ap.add_argument("--host-budget", type=int, default=0, help="0 = unbudgeted")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--runs", type=int, default=4)
    # payload side length: 64 px is the default evidence shape; the
    # 8M-URL pair uses 32 px so the images table fits the sandbox
    # disk (~22 GB vs ~80 GB) — the frontier/schedule side, where
    # row-count skew and memory bite, is unaffected.
    ap.add_argument("--img-px", type=int, default=IMG_W)
    # fetch-join regime (see run_wave_core): broadcast for
    # budget-bounded waves, bucketed for full-frontier waves whose
    # key set outgrows a driver-built broadcast.
    ap.add_argument("--fetch", choices=["broadcast", "bucketed"], default="broadcast")
    ap.add_argument("--telemetry", action="store_true",
                    help="collect per-stage shuffle/spill/skew bytes via the "
                         "UI REST API after the timed runs")
    args = ap.parse_args()
    extra = {}
    if args.telemetry:
        extra["spark.ui.enabled"] = "true"
    if args.fetch == "bucketed":
        extra.update({
            # the key side must not be broadcast (that is the regime
            # being avoided) and a shuffled-hash probe beats sorting
            # the key side against the already-sorted buckets
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.join.preferSortMergeJoin": "false",
            # throwaway in-memory catalog home for the re-declared
            # external bucketed table
            "spark.sql.warehouse.dir": os.path.join(args.dir, "warehouse"),
        })
    spark = _spark(args.master, args.shuffle_partitions, extra)
    try:
        if args.prepare:
            if args.fetch == "bucketed":
                prepare_bucketed(spark, args.dir, args.n, args.img_px)
            else:
                prepare(spark, args.dir, args.n, args.img_px)
            print(json.dumps({"prepared": args.n, "dir": args.dir, "fetch": args.fetch}))
        if args.measure:
            if args.fetch == "bucketed":
                _declare_bucketed(spark, args.dir)
            budget = args.host_budget if args.host_budget > 0 else None
            print(json.dumps(measure(spark, args.dir, budget, warmup=not args.no_warmup,
                                     n_runs=args.runs, fetch=args.fetch,
                                     telemetry=args.telemetry)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
