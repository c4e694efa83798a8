"""Audit Spark-vs-DuckDB OUTPUT TYPES for every oracled entry.

The driver's value hash is type-sensitive (round-2 verdict: DuckDB
SUM(BIGINT) → HUGEINT and DECIMAL/DATE artifacts hash-mismatch even
when every value is identical). This audit catches the artifact
class BEFORE the driver does: for each queries()/oracle_sql() pair it
compares the Spark plan schema against DuckDB's described result
types and prints any column whose type FAMILY differs (hugeint vs
int64, decimal vs double, int32 vs int64, date vs timestamp).

Usage: python tools/audit_oracle_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from dblp_crawler_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def spark_family(dt: str) -> str:
    dt = dt.lower()
    if dt in ("bigint", "long"):
        return "i64"
    if dt in ("int", "integer", "smallint", "tinyint"):
        return "i32"
    if dt in ("double", "float"):
        return "f64"
    if dt.startswith("decimal"):
        return "dec"
    if dt == "boolean":
        return "bool"
    if dt in ("string", "varchar"):
        return "str"
    if dt == "date":
        return "date"
    if dt.startswith("timestamp"):
        return "ts"
    return dt


def duck_family(dt: str) -> str:
    dt = dt.lower()
    if dt in ("bigint", "hugeint", "ubigint"):
        return "i64" if dt == "bigint" else "i128"
    if dt in ("integer", "smallint", "tinyint", "uinteger", "usmallint"):
        return "i32"
    if dt in ("double", "float", "real"):
        return "f64"
    if dt.startswith("decimal"):
        return "dec"
    if dt == "boolean":
        return "bool"
    if dt == "varchar":
        return "str"
    if dt == "date":
        return "date"
    if dt.startswith("timestamp"):
        return "ts"
    return dt


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("type-audit", master="local[4]", shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        if name not in osql:
            continue
        try:
            sp = {f.name: spark_family(f.dataType.simpleString())
                  for f in fn(spark, sf_dir).schema.fields}
            dk = {r[0]: duck_family(r[1]) for r in
                  con.sql(f"DESCRIBE {osql[name]}").fetchall()}
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {type(e).__name__}: {str(e)[:150]}")
            bad += 1
            continue
        if set(sp) != set(dk):
            print(f"COLS  {name}: spark={sorted(sp)} duck={sorted(dk)}")
            bad += 1
            continue
        diffs = {c: (sp[c], dk[c]) for c in sp if sp[c] != dk[c]}
        if diffs:
            print(f"TYPE  {name}: {diffs}")
            bad += 1
    print(f"mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
