"""Deterministic large-SF synthesizer (r3 verdict item 1, second half).

The driver ships sf0.001/0.01/0.1 only; the heavy dedup/ANN/curation
entries are all green at sf0.1 (5k docs / 2k vectors) — row counts
where neither skew nor memory bites. This synthesizes a bigger dir of
the SAME shape: `documents` and `embeddings` regenerated at
mult x sf0.1 rows with the same schema, word pool, language mix and
length distribution (hash-seeded, no RNG), and every other sf0.1
table symlinked in so any `queries()` entry runs against the dir
unchanged.

Row identity is deterministic in (row id) alone, so two runs produce
byte-identical tables. Texts are hash-diverse (no accidental
near-dup mass — the dedup entries plant their own duplicates via
doc_id arithmetic, which keeps working at any size).

Usage: python tools/make_sfbig.py --mult 10 --out /tmp/sf1
(mult=10 -> "sf1": 50k docs / 20k vectors; mult=100 -> "sf10").
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from dblp_crawler_spark.session import get_spark

    spark = get_spark("make-sfbig", master=args.master)
    os.makedirs(args.out, exist_ok=True)

    src_docs = spark.read.parquet(f"{SRC}/documents.parquet")
    src_emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_docs = src_docs.count() * args.mult
    n_vecs = src_emb.count() * args.mult
    # the real word pool / language mix, so shingle statistics match
    pool = sorted(
        r.w for r in src_docs.select(
            F.explode(F.split("text", " ")).alias("w")).distinct().collect()
        if r.w
    )
    langs = sorted(r.lang for r in src_docs.select("lang").distinct().collect())
    n_src = src_docs.select("source").distinct().count()
    pool_lit = F.array(*[F.lit(w) for w in pool])
    langs_lit = F.array(*[F.lit(x) for x in langs])

    n_words = (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(80)) + 15).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                pool_lit, (F.pmod(F.xxhash64(F.col("id"), i), F.lit(len(pool))) + 1).cast("int")
            ),
        ),
        " ",
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(
            langs_lit, (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(len(langs))) + 1).cast("int")
        ).alias("lang"),
        F.concat(F.lit("src"), F.pmod("id", F.lit(10)).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("int"))
    docs.repartition(max(32, args.mult)).write.mode("overwrite").parquet(
        os.path.join(args.out, "documents.parquet"))

    dim = len(src_emb.select("embedding").first()[0])
    n_labels = src_emb.select("label").distinct().count()
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000)) - 1000).cast("float") / 1000.0,
        ).alias("embedding"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_labels)).cast("int").alias("label"),
    )
    emb.repartition(max(16, args.mult // 2)).write.mode("overwrite").parquet(
        os.path.join(args.out, "embeddings.parquet"))

    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        dst = os.path.join(args.out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(json.dumps({"out": args.out, "mult": args.mult,
                      "n_docs": n_docs, "n_vecs": n_vecs}))
    spark.stop()


if __name__ == "__main__":
    main()
