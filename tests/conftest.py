import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dblp_crawler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark(
        "spark-frontier-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            # static conf: bucketed-table tests need a throwaway warehouse
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("wh")),
        },
    )
    yield s
    s.stop()


@pytest.fixture()
def lake(spark, tmp_path):
    from dblp_crawler_spark.lakehouse import Lakehouse

    return Lakehouse(spark, str(tmp_path / "lake"))


@pytest.fixture(scope="session")
def universe():
    from dblp_crawler_spark.fixtures import make_universe

    return make_universe(n_authors=120, n_pubs=360, n_venues=8, seed=7)
