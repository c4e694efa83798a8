"""CLI: ingest a user-supplied CCF catalog into the ccf_rank dim.

Usage:
  python tools/build_ccf_dim.py --lake /path/to/lake \
      --rank A ccf_a.txt --rank B ccf_b.txt --rank C ccf_c.txt \
      [--add B db/journals/pe] ...

Each catalog file holds one venue per line in the reference's list
format (line ends with the venue's dblp URL; spaces inside the URL
are tolerated — PDF extraction artifacts). See
dblp_crawler_spark/sources/ccf_catalog.py for the extraction rule.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from dblp_crawler_spark.lakehouse import Lakehouse  # noqa: E402
from dblp_crawler_spark.session import get_spark  # noqa: E402
from dblp_crawler_spark.sources.ccf_catalog import build_ccf_dim  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lake", required=True, help="lakehouse root")
    ap.add_argument(
        "--rank",
        nargs=2,
        action="append",
        default=[],
        metavar=("RANK", "FILE"),
        help="catalog file for a rank (A/B/C); repeatable",
    )
    ap.add_argument(
        "--add",
        nargs=2,
        action="append",
        default=[],
        metavar=("RANK", "JOURNAL_KEY"),
        help="manual (rank, journal_key) addition; repeatable",
    )
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)
    spark = get_spark("build-ccf-dim", master=args.master)
    lake = Lakehouse(spark, args.lake)
    dim = build_ccf_dim(
        spark,
        lake,
        {r: f for r, f in args.rank},
        extra_keys=[(r, k) for r, k in args.add],
    )
    counts = {r["rank"]: r["n"] for r in dim.groupBy("rank").count().withColumnRenamed("count", "n").collect()}
    print({"table": "ccf_rank", "ranks": counts})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
