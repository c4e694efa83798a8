"""Time a subset of __spark_entry__.queries() against any sf dir.

The per-round BENCH_r{N}.json times everything at sf0.1; this runner
is for targeted scale-up evidence (r3 verdict item 1): run the heavy
dedup/ANN/curation entries against a tools/make_sfbig.py dir and
compare per-entry seconds + row counts with the sf0.1 baseline.

Usage:
  python tools/bench_entries.py --sf-dir /tmp/sf1 dedup_minhash_lsh ...
  (no names = a built-in heavy-entry list)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_lsh_fast",
    "dedup_simhash", "dedup_simhash_fast",
    "dedup_simhash_capped", "dedup_simhash_overflow",  # r5: pair guard
    "dedup_minhash_capped", "dedup_minhash_overflow",
    "dedup_ngram_jaccard",
    "dedup_components", "dedup_drop_list", "semdedup_drop_list",
    "semdedup_auto",  # r5: cells ∝ n
    "embedding_near_dup", "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_topk",
    "pipeline_curation", "text_quality", "text_lang_id", "text_top_ngrams",
    "decontaminate", "events_sessionization",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--master", default=None)
    ap.add_argument("--allow-dirty", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from benchguard import refuse_if_dirty

    git = refuse_if_dirty(allow=args.allow_dirty)

    import __spark_entry__ as entrymod
    from dblp_crawler_spark.session import get_spark

    spark = get_spark("bench-entries", master=args.master)
    qs = entrymod.queries()
    names = args.names or [n for n in HEAVY if n in qs]
    out, total = {}, 0.0
    for name in names:
        t0 = time.monotonic()
        try:
            df = qs[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            secs = round(time.monotonic() - t0, 3)  # timed: full execution
            out[name] = {"seconds": secs, "rows": df.count()}  # rows untimed
            total += secs
        except Exception as e:  # keep going; report the failure
            out[name] = {"error": str(e)[:300]}
        print(f"# {name}: {out[name]}", flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "total_sec": round(total, 1),
                      "entries": out, **git}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
