"""spark-submit entry point: run the fixture-universe crawl to
completion against a lake directory.

This is the cluster launch path the engine is designed for
(`spark-submit --py-files dblp_crawler_spark.zip tools/submit_crawl.py
<lake_dir> <seed>`): the package ships as a zip on every executor's
PYTHONPATH, the driver script holds no logic beyond wiring config →
engine. tests/test_submit.py runs this exact command as a subprocess
and checks the committed crawl against the oracle — evidence that the
engine is importable and correct under spark-submit packaging, not
just in-process pytest sessions.

Usage: submit_crawl.py <lake_root> <seed> [host_budget]
"""

from __future__ import annotations

import sys

from dblp_crawler_spark import fixtures
from dblp_crawler_spark.lakehouse import Lakehouse
from dblp_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine
from dblp_crawler_spark.session import get_spark


def main() -> None:
    root, seed = sys.argv[1], int(sys.argv[2])
    host_budget = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark("submit-crawl")
    lake = Lakehouse(spark, root)
    u = fixtures.make_universe(n_authors=80, n_pubs=240, n_venues=6, seed=seed)
    fixtures.write_tables(spark, lake, u)
    eng = CrawlEngine(
        spark,
        lake,
        CrawlConfig(
            year=u.year_filter, rules=u.keyword_rules,
            host_budget=host_budget, max_attempts=2,
        ),
    )
    eng.initialize()
    metrics = eng.run_to_end()
    print(f"SUBMIT_CRAWL_DONE waves={len(metrics)}")
    spark.stop()


if __name__ == "__main__":
    main()
