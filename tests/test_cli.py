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


def test_cli_bulk_seed_files(spark, tmp_path):
    """Bulk seeding via --pid-file/--journal-file (one value per
    line, comments allowed) — the no-eval analog of the reference's
    venue-set seeding (README.md:210-236). Must be byte-equivalent
    to flag seeding: summary equals the oracle's."""
    u = fixtures.make_universe(n_authors=60, n_pubs=150, n_venues=5, seed=3)
    lroot = str(tmp_path / "clilake")
    lake = Lakehouse(spark, lroot)
    fixtures.write_tables(spark, lake, u)

    pid_file = tmp_path / "pids.txt"
    pid_file.write_text("# seed authors\n" + "".join(f"{p}\n" for p in u.seeds_pids) + "\n")
    journal_file = tmp_path / "journals.txt"
    journal_file.write_text("".join(f"{j}\n" for j in u.seeds_journals))
    assert len(u.seeds_journals) == 2  # the bulk-seed scenario under test

    dest = str(tmp_path / "out.json")
    args = [sys.executable, "-m", "dblp_crawler_spark", "-y", str(u.year_filter), "-l", "-1"]
    for r in u.keyword_rules:
        args += ["-k", " ".join(r)]
    args += ["--pid-file", str(pid_file), "--journal-file", str(journal_file)]
    args += ["--data", lroot, "--master", "local[4]", "networkx", "--dest", dest]
    subprocess.run(args, check=True, cwd=REPO, timeout=560)

    with open(dest) as f:
        got = json.load(f)
    assert got == oracle.dict_summary(oracle.run_oracle(u), u)


def test_cli_filter_module_plugin(spark, tmp_path):
    """--filter-module: a user module registers a custom transform by
    name; the CLI output must be byte-identical to the built-in the
    plugin reimplements via the generic combinators."""
    u = fixtures.make_universe(n_authors=60, n_pubs=150, n_venues=5, seed=3)
    lroot = str(tmp_path / "clilake")
    lake = Lakehouse(spark, lroot)
    fixtures.write_tables(spark, lake, u)

    dest = str(tmp_path / "out.json")
    args = [sys.executable, "-m", "dblp_crawler_spark", "-y", str(u.year_filter)]
    for r in u.keyword_rules:
        args += ["-k", " ".join(r)]
    for p in u.seeds_pids:
        args += ["-p", p]
    args += ["--data", lroot, "--master", "local[4]", "networkx", "--dest", dest]
    subprocess.run(args, check=True, cwd=REPO, timeout=560)

    plugin_dir = tmp_path / "plugins"
    plugin_dir.mkdir()
    (plugin_dir / "my_filters.py").write_text(
        "from pyspark.sql import functions as F\n"
        "from dblp_crawler_spark.filter import map_cooperation, register_filter\n"
        "\n"
        "@register_filter('my_recent_coop')\n"
        "def my_recent_coop(sn, se, sp, raw):\n"
        "    return sn, map_cooperation(se, sp, F.col('year') >= int(raw)), sp\n"
    )
    env = dict(os.environ, PYTHONPATH=f"{plugin_dir}:{os.environ.get('PYTHONPATH', '')}")

    out_plugin = str(tmp_path / "plugin.json")
    subprocess.run(
        [sys.executable, "-m", "dblp_crawler_spark.filter", "-i", dest, "-o", out_plugin,
         "--filter-module", "my_filters", "-f", "my_recent_coop=2010",
         "--master", "local[4]"],
        check=True, cwd=REPO, timeout=560, env=env,
    )
    out_builtin = str(tmp_path / "builtin.json")
    subprocess.run(
        [sys.executable, "-m", "dblp_crawler_spark.filter", "-i", dest, "-o", out_builtin,
         "-f", "drop_old_cooperation=2010", "--master", "local[4]"],
        check=True, cwd=REPO, timeout=560,
    )
    with open(out_plugin) as f, open(out_builtin) as g:
        assert json.load(f) == json.load(g)


def test_curate_cli_e2e(spark, tmp_path):
    """Subprocess e2e of the curation CLI: planted junk (too short /
    high repetition / non-language) is gated out, planted exact and
    near dups collapse to one representative, all original columns
    survive, and the printed JSON report counts match."""
    import json
    import subprocess
    import sys

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs through the quiet field before the sun finally sets "
            "while a gentle wind moves across the warm evening grass ")
    rows = [
        (0, base, "keepme"),
        (1, base, "exact-dup-of-0"),
        (2, base + "one extra tail sentence is appended here today", "near-dup-of-0"),
        (3, "short", "too-short"),
        (4, ("spam spam spam spam spam spam spam spam spam spam "
             "spam spam spam spam spam spam spam spam spam spam"), "repetitive"),
        (5, ("a completely different document about the history of "
             "distributed dataflow systems and the engines behind them "
             "written with plenty of ordinary connective prose"), "keeper-2"),
    ]
    src = tmp_path / "docs.parquet"
    out = tmp_path / "kept"
    spark.createDataFrame(rows, "doc_id long, text string, tag string").write.parquet(str(src))

    proc = subprocess.run(
        [sys.executable, "-m", "dblp_crawler_spark.curate",
         "-i", str(src), "-o", str(out),
         "--dedup", "minhash", "--minhash-threshold", "0.5",
         "--master", "local[4]"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    kept = spark.read.parquet(str(out)).collect()
    kept_ids = {r.doc_id for r in kept}
    assert kept_ids == {0, 5}, kept_ids          # dups 1,2 dropped; junk 3,4 gated
    assert {r.tag for r in kept} == {"keepme", "keeper-2"}  # original columns intact
    assert report["n_input"] == 6 and report["n_gated"] == 4 and report["n_kept"] == 2


def test_curate_keepbest_mode(spark):
    """dedup='keepbest': per key-column group the highest-quality doc
    survives (not the min-id one); gates still run first; singleton
    keys untouched; key_col is mandatory."""
    import pytest as _pytest

    from dblp_crawler_spark.curate import CurateConfig, curate

    good = ("a completely different document about the history of "
            "distributed dataflow systems and the engines behind them "
            "written with plenty of ordinary connective prose")
    noisy = good + " !!! ??? !!! ??? !!! ??? !!! ??? !!! ??? !!! ???"
    rows = [
        (0, noisy, "k1"),     # punct-heavy variant: loses the 0.3 punct band
        (1, good, "k1"),      # clean variant -> survivor of k1 despite larger id
        (2, "short", "k1"),   # gated out before dedup
        (3, good, "k2"),      # singleton key survives
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    cfg = CurateConfig(min_quality=0.0, lang=None, dedup="keepbest", key_col="url")
    kept, report = curate(docs, cfg)
    got = {r.doc_id for r in kept.collect()}
    assert got == {1, 3}, got
    r = report.collect()[0]
    assert (r.n_input, r.n_gated, r.n_kept) == (4, 3, 2)
    assert "__quality" not in kept.columns

    with _pytest.raises(ValueError, match="key_col"):
        curate(docs, CurateConfig(dedup="keepbest"))


def test_bench_scaling_interleaved_pairing_and_gate(tmp_path, monkeypatch):
    """run_pair_interleaved pairs adjacent submits per round, computes
    the true even-length median, and gates on UNROUNDED efficiencies
    (no spark-submit: the submit layer is stubbed)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_scaling", str(REPO) + "/tools/bench_scaling.py")
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)

    # 4 rounds: efficiencies 0.70, 0.78, 0.82, 0.90 -> median (0.78+0.82)/2 = 0.80
    effs = [0.70, 0.78, 0.82, 0.90]
    calls = {"i": 0}

    def fake_submit(master, pyz, job_args):
        if "--prepare" in job_args:
            return {}
        i = calls["i"]
        calls["i"] += 1
        rnd, is_high = divmod(i, 2)
        secs = 100.0 if not is_high else 100.0 / (4 * effs[rnd])
        return {"seconds": secs, "urls_per_sec": 800000 / secs}

    monkeypatch.setattr(bs, "spark_submit", fake_submit)
    res = bs.run_pair_interleaved(800000, str(tmp_path), ("local[4]", "local[16]"), 4)
    assert res["per_round_efficiency"] == [0.7, 0.78, 0.82, 0.9]
    assert res["scaling_efficiency_median"] == 0.8
    assert res["passes_north_rule_median"]          # 0.80 >= 0.8 exactly
    assert res["passes_north_rule"]                 # best 0.90
    # one notch below the boundary must FAIL even though it ROUNDS to 0.8
    effs[:] = [0.70, 0.78, 0.8199, 0.70]  # sorted -> median (0.70+0.78)/2 = 0.74
    calls["i"] = 0
    res2 = bs.run_pair_interleaved(800000, str(tmp_path), ("local[4]", "local[16]"), 4)
    assert not res2["passes_north_rule_median"]
