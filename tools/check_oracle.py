"""Replicates the driver's correctness gate locally: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir; compare row count, column names, and order-insensitive
values. Usage: python tools/check_oracle.py [sf_dir] [query ...]"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from dblp_crawler_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6g}"
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in osql:
            print(f"rows-only  {name}: {len(srows)} rows")
            continue
        try:
            rel = con.sql(osql[name])
            drows = rel.fetchall()
            dcols = rel.columns
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_n = len(srows) == len(drows)
        sc = canon([tuple(r) for r in srows], scols)
        dc = canon(drows, dcols)
        ok_v = sc == dc
        if ok_cols and ok_n and ok_v:
            print(f"OK    {name}: {len(srows)} rows")
        else:
            failures += 1
            print(f"FAIL  {name}: cols={ok_cols} n={len(srows)}/{len(drows)} values={ok_v}")
            if not ok_cols:
                print("   spark cols:", scols, "duck cols:", dcols)
            if ok_cols and not ok_v:
                diff_s = [r for r in sc if r not in set(map(tuple, dc))][:3]
                diff_d = [r for r in dc if r not in set(map(tuple, sc))][:3]
                print("   spark-only:", diff_s)
                print("   duck-only:", diff_d)
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
