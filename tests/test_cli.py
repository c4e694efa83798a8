"""CLI e2e: `python -m dblp_crawler_spark` (reference __main__.py:
141-142) and `python -m dblp_crawler_spark.filter` (reference
filter/__main__.py:10-22) driven as real subprocesses against a
fixture-universe lakehouse; the JSON artifact must equal the oracle's
dict_summary exactly."""

import json
import os
import subprocess
import sys

from dblp_crawler_spark import fixtures, oracle
from dblp_crawler_spark.lakehouse import Lakehouse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_networkx_then_filter(spark, tmp_path):
    u = fixtures.make_universe(n_authors=60, n_pubs=150, n_venues=5, seed=3)
    lroot = str(tmp_path / "clilake")
    lake = Lakehouse(spark, lroot)
    fixtures.write_tables(spark, lake, u)

    dest = str(tmp_path / "out.json")
    args = [sys.executable, "-m", "dblp_crawler_spark", "-y", str(u.year_filter), "-l", "-1"]
    for r in u.keyword_rules:
        args += ["-k", " ".join(r)]
    for p in u.seeds_pids:
        args += ["-p", p]
    for j in u.seeds_journals:
        args += ["-j", j]
    args += ["--data", lroot, "--master", "local[4]", "networkx", "--dest", dest]
    subprocess.run(args, check=True, cwd=REPO, timeout=560)

    with open(dest) as f:
        got = json.load(f)
    want = oracle.dict_summary(oracle.run_oracle(u), u)
    assert got == want

    out2 = str(tmp_path / "filtered.json")
    subprocess.run(
        [sys.executable, "-m", "dblp_crawler_spark.filter", "-i", dest, "-o", out2,
         "-f", "drop_nodes_by_all_publications=3",
         "-f", "drop_old_cooperation=2010", "--master", "local[4]"],
        check=True, cwd=REPO, timeout=560,
    )
    with open(out2) as f:
        got2 = json.load(f)
    assert got2["nodes"]
    # filter semantics (filter/__init__.py:20-25 + utils dangling-edge
    # rule): every surviving node has >=3 page pubs; edges never dangle;
    # cooperation pruned to year >= 2010
    for n in got2["nodes"].values():
        assert len(n["person"]["publications"]) >= 3
    for e in got2["edges"].values():
        assert e["from"] in got2["nodes"] and e["to"] in got2["nodes"]
        for k in e["cooperation"]:
            assert got2["publications"][k]["year"] >= 2010
