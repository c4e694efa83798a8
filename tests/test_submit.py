"""spark-submit --py-files packaging e2e: the engine must run under
the real cluster launch path (package zipped onto executor
PYTHONPATHs, driver script via spark-submit), not only in-process
pytest sessions, and produce the oracle-exact crawl."""

import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit on PATH")
def test_spark_submit_py_files_crawl(tmp_path, spark):
    pkg_zip = str(tmp_path / "dblp_crawler_spark.zip")
    pkg_root = os.path.join(REPO, "dblp_crawler_spark")
    with zipfile.ZipFile(pkg_zip, "w") as z:
        for root, _, names in os.walk(pkg_root):
            for name in names:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    z.write(full, os.path.relpath(full, REPO))
    lake_root = str(tmp_path / "lake")
    env = {
        **os.environ,
        "SPARK_GRAFT_MASTER": "local[4]",
        # keep the subprocess JVM small next to the session fixture
        "SPARK_GRAFT_DRIVER_MEM": "2g",
    }
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--py-files", pkg_zip,
            os.path.join(REPO, "tools", "submit_crawl.py"),
            lake_root, "99", "8",
        ],
        capture_output=True, text=True, timeout=560, env=env,
        cwd=str(tmp_path),  # NOT the repo: the zip must provide the package
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "SUBMIT_CRAWL_DONE" in proc.stdout

    # the submitted run's committed state must match the oracle
    from dblp_crawler_spark import fixtures, oracle
    from dblp_crawler_spark.lakehouse import Lakehouse

    u = fixtures.make_universe(n_authors=80, n_pubs=240, n_venues=6, seed=99)
    res = oracle.run_oracle(u, host_budget=8, max_attempts=2)
    lake = Lakehouse(spark, lake_root)
    order = [(r.wave, r.seq, r.url) for r in lake.read("crawl_order").orderBy("seq").collect()]
    assert order == res.crawl_order
    assert {r.key for r in lake.read("seen_pubs").collect()} == res.seen_pubs
