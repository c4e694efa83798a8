"""CLI entry point — `python -m dblp_crawler_spark`.

Mirrors the reference CLI (/root/reference/dblp_crawler/__main__.py:
17-34,141-142): `-y/--year`, `-l/--limit`, `-k/--keyword` (repeat),
`-p/--pid` (repeat), `-j/--journal` (repeat), then a sink subcommand:

  networkx --dest out.json   write the legacy JSON summary
                             (__main__.py:84-91 format)
  mirror                     MERGE-idempotent graph-DB mirror tables
                             in the lakehouse (the Neo4jGraph analog,
                             __main__.py:104-142 / summarizer/neo4j.py)

Engine-specific arguments (no HTTP in this engine — fetches resolve
against the ingested page store, SURVEY.md S1): `--data LAKE_ROOT`
points at the lakehouse holding pages/robots/ccf_rank tables;
politeness knobs `--host-budget`, `--wave-ms`; `--seeds-from-mirror`
(S11, reference data/neo4j.py:4-16) seeds from previously-mirrored
persons instead of/in addition to -p/-j.

DIVERGENCE (documented, SURVEY.md §8/F4): the reference `eval()`s
every -k/-p/-j argument (arg.py:27-43, keyword/arg.py:19-21) so a
CLI string can execute arbitrary code. This CLI is declarative: -k
takes a space-separated AND-rule ("super resolution"), repeated -k
flags OR together (same CNF the reference builds); -p/-j take plain
values. No eval anywhere.
"""

from __future__ import annotations

import argparse
import json
import logging

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("dblp_crawler_spark")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="dblp_crawler_spark")
    parser.add_argument("-y", "--year", type=int, default=2000,
                        help="Only crawl papers after the specified year.")
    parser.add_argument("-l", "--limit", type=int, default=-1,
                        help="Limitation of BFS depth (waves); -1 = to the end.")
    parser.add_argument("-k", "--keyword", action="append", default=[],
                        help="Keyword rule: space-separated words AND together; "
                             "repeat the flag to OR rules.")
    parser.add_argument("-p", "--pid", action="append", default=[],
                        help="Author pids to start crawling.")
    parser.add_argument("-j", "--journal", action="append", default=[],
                        help="Journal keys to start crawling.")
    parser.add_argument("--pid-file", action="append", default=[],
                        help="File of author pids, one per line (# comments and "
                             "blank lines ignored); repeatable. The bulk-seed "
                             "analog of the reference's venue-set seeding "
                             "(README.md:210-236) without eval.")
    parser.add_argument("--journal-file", action="append", default=[],
                        help="File of journal keys, one per line; repeatable.")
    parser.add_argument("--data", required=True,
                        help="Lakehouse root holding the ingested pages/robots/"
                             "ccf_rank tables (the engine's page store).")
    parser.add_argument("--master", default="local[*]")
    parser.add_argument("--host-budget", type=int, default=None)
    parser.add_argument("--wave-ms", type=int, default=None)
    parser.add_argument("--output-year", type=int, default=None,
                        help="F2: filter publications at OUTPUT only (crawl "
                             "still expands through them).")
    parser.add_argument("--seeds-from-mirror", action="store_true",
                        help="S11: also seed from every mirrored person.")
    parser.add_argument("--use-bloom", action="store_true")
    sub = parser.add_subparsers(dest="sink", required=True)
    p_nx = sub.add_parser("networkx", help="Write results to a json file.")
    p_nx.add_argument("--dest", type=str, required=True, help="Path to write results.")
    sub.add_parser("mirror", help="Write results to the lakehouse mirror tables "
                                  "(graph-DB MERGE semantics).")
    return parser


def _read_seed_files(paths: list[str]) -> list[str]:
    """One seed per line; blank lines and '#' comments ignored."""
    out = []
    for path in paths:
        with open(path) as f:
            for line in f:
                v = line.strip()
                if v and not v.startswith("#"):
                    out.append(v)
    return out


def run_crawl(spark, lake, args):
    from pyspark.sql import functions as F

    from . import schemas
    from .operators.mirror import seeds_from_mirror
    from .plans.crawl import CrawlConfig, CrawlEngine

    rules = [[w for w in k.split(" ") if w] for k in args.keyword]
    rules = [r for r in rules if r]
    pids = list(args.pid) + _read_seed_files(args.pid_file)
    journals = list(args.journal) + _read_seed_files(args.journal_file)
    seeds = [{"seed_type": "pid", "value": p} for p in pids] + [
        {"seed_type": "journal", "value": j} for j in journals
    ]
    seed_df = spark.createDataFrame(seeds, schemas.SEEDS) if seeds else (
        spark.createDataFrame([], schemas.SEEDS)
    )
    if args.seeds_from_mirror:
        seed_df = seed_df.unionByName(seeds_from_mirror(lake)).dropDuplicates(
            ["seed_type", "value"]
        )
    lake.overwrite("seeds", seed_df)
    logger.info("Specified keyword rules: %s", rules)
    logger.info("Specified persons for init: %s", pids)
    logger.info("Specified journals or conferences for init: %s", journals)
    logger.info("Specified BFS depth limitation: %s", args.limit)
    cfg = CrawlConfig(
        year=args.year,
        rules=rules,
        limit=args.limit,
        host_budget=args.host_budget,
        wave_ms=args.wave_ms,
        output_year=args.output_year,
        use_bloom=args.use_bloom,
    )
    eng = CrawlEngine(spark, lake, cfg)
    eng.initialize()
    metrics = eng.run_to_end()
    logger.info("Crawl finished: %d waves", len(metrics))
    return eng


def main(argv: list[str] | None = None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    from .lakehouse import Lakehouse
    from .session import get_spark

    spark = get_spark("dblp-crawler-spark", master=args.master)
    try:
        lake = Lakehouse(spark, args.data)
        run_crawl(spark, lake, args)
        nodes = lake.read("nodes")
        edges = lake.read("edges")
        publications = lake.read("publications")
        if args.sink == "networkx":
            from .summary_io import write_summary_json

            write_summary_json(args.dest, nodes, edges, publications)
            logger.info("Summary written to %s", args.dest)
        elif args.sink == "mirror":
            from .operators.mirror import mirror_summarize

            snaps = mirror_summarize(lake, lake.read("pages"), publications)
            logger.info("Mirror committed: %s", json.dumps(snaps))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
