"""Two-parallelism scaling bench (north_rule criterion, sandbox form).

Orchestrates tools/throughput_job.py via `spark-submit --py-files`
(the north_rule's deployment mode) at local[4] (N) and local[16]
(4N) on the SAME prepared input, then reports throughput at both and
the scaling efficiency  eff = (tput_4N / tput_N) / 4  (target ≥ 0.8).

N=4 vs 4N=16 (not 8 vs 32) because this host has exactly 32 physical
cores: at full 32-way load the cores clock measurably lower (pure-
python burn test: 0.82 per-core ratio 8→32 vs 0.91 at 4→16), which
would confound executor scaling with frequency droop — an artifact a
real 4N-executor cluster (4× machines) does not have.

Prints one JSON line; writes BENCH.md + .bench/scaling.json (the
cached evidence bench.py embeds) when run with --write-md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "tools", "throughput_job.py")


def build_pkg_zip(path: str) -> str:
    pkg = os.path.join(REPO, "dblp_crawler_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def spark_submit(master: str, pyfiles: str, job_args: list[str]) -> dict:
    # the single local-mode JVM stands in for the whole cluster, so
    # heap scales with core count (a 4N-executor cluster has 4N× the
    # RAM of an N-executor cluster at fixed executor size). The
    # per-core factor is tunable (SPARK_GRAFT_MEM_PER_CORE, GB/core;
    # default 1.5) but always EQUAL at both levels, so the pair
    # models bigger executors, never an unfair ratio: the engine's
    # 8M-row wave OOMs the low level at 1.5 GB/core (r5) and runs at
    # 3 — a real cluster sizes executors to the wave, not vice versa.
    n_cores = int(master.split("[")[1].rstrip("]")) if "[" in master else 8
    per_core = float(os.environ.get("SPARK_GRAFT_MEM_PER_CORE", "1.5"))
    cmd = [
        "spark-submit",
        "--master", master,
        "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", f"{int(n_cores * per_core)}g"),
        "--py-files", pyfiles,
        JOB, *job_args,
    ]
    env = dict(os.environ, SPARK_GRAFT_MASTER=master)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=int(os.environ.get("SPARK_GRAFT_SUBMIT_TIMEOUT", "1800")))
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"spark-submit produced no JSON: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def run_pair(n: int, workdir: str, masters: tuple[str, str], runs: int,
             img_px: int = 64, fetch: str = "broadcast") -> dict:
    os.makedirs(workdir, exist_ok=True)
    pyz = build_pkg_zip(os.path.join(workdir, "dblp_crawler_spark.zip"))
    suffix = (f"_px{img_px}" if img_px != 64 else "") + (f"_{fetch}" if fetch != "broadcast" else "")
    indir = os.path.join(workdir, f"input_n{n}{suffix}")
    if not os.path.exists(os.path.join(indir, "frontier", "_SUCCESS")):
        spark_submit(masters[1], pyz, ["--prepare", "--dir", indir, "--n", str(n), "--img-px", str(img_px), "--fetch", fetch])
    res = {}
    for m in masters:
        res[m] = spark_submit(m, pyz, ["--measure", "--dir", indir, "--n", str(n), "--runs", str(runs), "--fetch", fetch])
    lo, hi = res[masters[0]], res[masters[1]]
    # both protocols reported so the gate verdict is not sensitive to
    # the min-vs-median choice (each run is best/median of `runs`)
    eff_best = (hi["urls_per_sec"] / lo["urls_per_sec"]) / 4.0
    eff_median = (hi["urls_per_sec_median"] / lo["urls_per_sec_median"]) / 4.0
    return {
        "n_urls": n,
        "img_px": img_px,
        "fetch": fetch,
        "low": lo,
        "high": hi,
        "scaling_efficiency": round(eff_best, 3),
        "scaling_efficiency_median": round(eff_median, 3),
        "passes_north_rule": eff_best >= 0.8,
        "passes_north_rule_median": eff_median >= 0.8,
    }


def run_pair_interleaved(n: int, workdir: str, masters: tuple[str, str], rounds: int,
                         img_px: int = 64) -> dict:
    """Interleaved protocol: alternate N / 4N submits (A B A B ...)
    and pair each round's two adjacent timings into a per-round
    efficiency. A host whose performance drifts over minutes (the
    failure mode of the block protocol: all-N then all-4N straddles
    the drift) hits BOTH levels of a round almost equally, so the
    per-round ratio cancels it — the same same-session-interleaved-
    pairs discipline BENCH.md already applies to code A/Bs, applied
    to the scaling criterion. Each submit still does its untimed full
    warm-up run (fresh JVM per submit)."""
    os.makedirs(workdir, exist_ok=True)
    pyz = build_pkg_zip(os.path.join(workdir, "dblp_crawler_spark.zip"))
    suffix = f"_px{img_px}" if img_px != 64 else ""
    indir = os.path.join(workdir, f"input_n{n}{suffix}")
    if not os.path.exists(os.path.join(indir, "frontier", "_SUCCESS")):
        spark_submit(masters[1], pyz, ["--prepare", "--dir", indir, "--n", str(n), "--img-px", str(img_px)])
    pairs, lo_runs, hi_runs = [], [], []
    for _ in range(rounds):
        lo = spark_submit(masters[0], pyz, ["--measure", "--dir", indir, "--n", str(n), "--runs", "1"])
        hi = spark_submit(masters[1], pyz, ["--measure", "--dir", indir, "--n", str(n), "--runs", "1"])
        lo_runs.append(lo["seconds"])
        hi_runs.append(hi["seconds"])
        pairs.append((hi["urls_per_sec"] / lo["urls_per_sec"]) / 4.0)
    # true even-length median (same as throughput_job.py) and gate on
    # the UNROUNDED values — rounding is display-only, like run_pair
    srt = sorted(pairs)
    med = (srt[len(srt) // 2] + srt[(len(srt) - 1) // 2]) / 2
    return {
        "n_urls": n,
        "img_px": img_px,
        "protocol": "interleaved",
        "masters": list(masters),
        "low_runs_s": lo_runs,
        "high_runs_s": hi_runs,
        "per_round_efficiency": [round(p, 3) for p in pairs],
        "scaling_efficiency_best": round(max(pairs), 3),
        "scaling_efficiency_median": round(med, 3),
        "passes_north_rule": max(pairs) >= 0.8,
        "passes_north_rule_median": med >= 0.8,
    }


MD_TEMPLATE = """# BENCH — measured scaling evidence (north_rule criterion)

`BASELINE.json` requires throughput scaling efficiency ≥ 0.8 from N
to 4N executors, run via `spark-submit --py-files`. This sandbox has
no multi-node cluster; per the driver instruction the criterion is
evidenced by running the SAME job (`tools/throughput_job.py` — the
per-wave scheduled+fetched core: robots → politeness window →
priority pop → crawl-order sequencing → broadcast-keys fetch join
against the input_hint image+caption table (payload bytes never
shuffle) → Arrow decode + PSNR/phash payload gate) on the SAME
prepared input at two parallelism levels.

Two pairs are reported. The primary pair is local[4]→local[16]: both
levels sit well under this host's 32 physical cores, so per-core
clocks are comparable (measured pure-python burn: 0.91 per-core ratio
4→16 vs 0.82 at 8→32 — at 32-way load the cores clock down, an
artifact a real 4N-executor cluster of 4× machines does not have).
The local[8]→local[32] pair is recorded alongside with that caveat.
Timing protocol: {n_runs} back-to-back runs per level; BOTH best-of
and median-of efficiencies are reported so the verdict is not
sensitive to the protocol choice.

## Primary pair: {m_low} → {m_high}

| Quantity | Value |
|---|---|
| Input | {n_urls:,} frontier URLs → image+caption pages (85% on hot host `dblp.org`) |
| Deployment | `spark-submit --py-files dblp_crawler_spark.zip tools/throughput_job.py` |
| Throughput @ `{m_low}` (N) | **{t_low:,.1f} urls/sec** best / {tm_low:,.1f} median ({s_low:.1f}s best, payload gate 100% pass, min PSNR {p_low} dB) |
| Throughput @ `{m_high}` (4N) | **{t_high:,.1f} urls/sec** best / {tm_high:,.1f} median ({s_high:.1f}s best, payload gate 100% pass, min PSNR {p_high} dB) |
| Scaling efficiency, best-of-{n_runs} | **{eff:.3f}** (target ≥ 0.8 → {verdict}) |
| Scaling efficiency, median-of-{n_runs} | **{eff_med:.3f}** (target ≥ 0.8 → {verdict_med}) |
| All runs @ N | {runs_low} |
| All runs @ 4N | {runs_high} |

## Secondary pair: {m_low2} → {m_high2} (frequency-droop caveat)

| Quantity | Value |
|---|---|
| Throughput @ `{m_low2}` (N) | {t_low2:,.1f} urls/sec best / {tm_low2:,.1f} median |
| Throughput @ `{m_high2}` (4N) | {t_high2:,.1f} urls/sec best / {tm_high2:,.1f} median |
| Scaling efficiency, best-of-{n_runs} | {eff2:.3f} |
| Scaling efficiency, median-of-{n_runs} | {eff2_med:.3f} |
| All runs @ N | {runs_low2} |
| All runs @ 4N | {runs_high2} |

Reproduce: `python tools/bench_scaling.py --n {n_urls} --runs {n_runs} --write-md`.
"""


def write_md(primary: dict, secondary: dict, n_runs: int, path: str) -> None:
    lo, hi = primary["low"], primary["high"]
    lo2, hi2 = secondary["low"], secondary["high"]
    md = MD_TEMPLATE.format(
        n_urls=primary["n_urls"], n_runs=n_runs,
        m_low=lo["master"], m_high=hi["master"],
        t_low=lo["urls_per_sec"], t_high=hi["urls_per_sec"],
        tm_low=lo["urls_per_sec_median"], tm_high=hi["urls_per_sec_median"],
        s_low=lo["seconds"], s_high=hi["seconds"],
        p_low=lo["min_psnr_db"], p_high=hi["min_psnr_db"],
        eff=primary["scaling_efficiency"],
        eff_med=primary["scaling_efficiency_median"],
        verdict="PASS" if primary["passes_north_rule"] else "FAIL",
        verdict_med="PASS" if primary["passes_north_rule_median"] else "FAIL",
        runs_low=lo["all_runs"], runs_high=hi["all_runs"],
        m_low2=lo2["master"], m_high2=hi2["master"],
        t_low2=lo2["urls_per_sec"], t_high2=hi2["urls_per_sec"],
        tm_low2=lo2["urls_per_sec_median"], tm_high2=hi2["urls_per_sec_median"],
        eff2=secondary["scaling_efficiency"],
        eff2_med=secondary["scaling_efficiency_median"],
        runs_low2=lo2["all_runs"], runs_high2=hi2["all_runs"],
    )
    # refreshing the scaling evidence must not clobber the A/B
    # sections appended below it across rounds: carry over every
    # section the template itself does not produce
    template_heads = ("# BENCH", "## Primary pair:", "## Secondary pair:")
    if os.path.exists(path):
        with open(path) as f:
            old = f.read()
        kept = [
            "## " + part
            for part in old.split("\n## ")[1:]
            if not any(("## " + part).startswith(h) for h in template_heads)
        ]
        if kept:
            md = md.rstrip() + "\n\n" + "\n".join(k.rstrip() + "\n" for k in kept)
    with open(path, "w") as f:
        f.write(md)
    cache_dir = os.path.join(REPO, ".bench")
    os.makedirs(cache_dir, exist_ok=True)
    with open(os.path.join(cache_dir, "scaling.json"), "w") as f:
        json.dump({"primary": primary, "secondary": secondary, "runs_per_level": n_runs}, f, indent=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=800_000)
    ap.add_argument("--workdir", default="/tmp/spark_graft_scaling")
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--write-md", action="store_true")
    ap.add_argument("--skip-secondary", action="store_true")
    ap.add_argument("--interleave", action="store_true",
                    help="Alternate N/4N submits; per-round efficiency pairs "
                         "(drift-robust). Prints JSON only; does not write MD.")
    ap.add_argument("--img-px", type=int, default=64)
    ap.add_argument("--fetch", choices=["broadcast", "bucketed"], default="broadcast")
    ap.add_argument("--allow-dirty", action="store_true",
                    help="Measure despite uncommitted package/tool edits "
                         "(the dirty set is recorded in the artifact).")
    args = ap.parse_args()
    from benchguard import refuse_if_dirty

    git = refuse_if_dirty(allow=args.allow_dirty)
    if args.interleave:
        res = run_pair_interleaved(args.n, args.workdir, ("local[4]", "local[16]"), args.runs, args.img_px)
        print(json.dumps({"pair": "4->16", **git, **res}))
        return
    primary = run_pair(args.n, args.workdir, ("local[4]", "local[16]"), args.runs, args.img_px, args.fetch)
    primary.update(git)
    print(json.dumps({"pair": "4->16", **primary}))
    if not args.skip_secondary:
        secondary = run_pair(args.n, args.workdir, ("local[8]", "local[32]"), args.runs, args.img_px)
        secondary.update(git)
        print(json.dumps({"pair": "8->32", **secondary}))
        if args.write_md:
            write_md(primary, secondary, args.runs, os.path.join(REPO, "BENCH.md"))


if __name__ == "__main__":
    main()
