"""Curation CLI — `python -m dblp_crawler_spark.curate`.

One declarative pass over a parquet documents table: quality/length/
repetition/language gates, then exact or MinHash near-dup removal;
writes the survivors as parquet and prints (or writes) a one-line
JSON report. No eval; every knob is a typed flag.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="dblp_crawler_spark.curate")
    p.add_argument("-i", "--input", required=True, help="Input parquet path (documents table).")
    p.add_argument("-o", "--output", required=True, help="Output parquet dir for kept docs.")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--max-tokens", type=int, default=100_000)
    p.add_argument("--min-quality", type=float, default=0.7)
    p.add_argument("--max-rep", type=float, default=0.6)
    p.add_argument("--lang", default="en", help="Required lang_id; pass '' to disable the gate.")
    p.add_argument("--dedup", choices=["exact", "minhash", "keepbest", "none"], default="exact")
    p.add_argument("--minhash-threshold", type=float, default=0.8)
    p.add_argument("--key-col", default=None,
                   help="Duplicate group key for --dedup keepbest (e.g. url, caption); "
                        "keeps the highest-quality doc per key.")
    p.add_argument("--report", default=None, help="Also write the JSON report to this path.")
    p.add_argument("--master", default=None, help="Spark master (default: env/local).")
    args = p.parse_args(argv)

    from ..session import get_spark
    from . import CurateConfig, curate

    spark = get_spark("curate", master=args.master)
    cfg = CurateConfig(
        min_tokens=args.min_tokens, max_tokens=args.max_tokens,
        min_quality=args.min_quality, max_rep=args.max_rep,
        lang=args.lang or None, dedup=args.dedup,
        minhash_threshold=args.minhash_threshold,
        text_col=args.text_col, id_col=args.id_col, key_col=args.key_col,
    )
    docs = spark.read.parquet(args.input)
    kept, report = curate(docs, cfg)
    kept.write.mode("overwrite").parquet(args.output)
    row = report.collect()[0].asDict()
    out = {"input": args.input, "output": args.output, **row, "dedup": args.dedup}
    print(json.dumps(out))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
