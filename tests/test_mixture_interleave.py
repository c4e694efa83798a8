"""Weighted-fair mixture interleave: prefix proportionality (the
property a plain shuffle lacks), determinism, weight semantics, and
the DuckDB replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.textstats import (
    mixture_interleave,
    mixture_interleave_sql,
)


def _docs(spark, per_source):
    rows = []
    i = 0
    for s, n in per_source.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_prefix_proportionality(spark):
    docs = _docs(spark, {"a": 120, "b": 40, "c": 40})
    order = (
        mixture_interleave(docs, {"a": 3, "b": 1, "c": 1})
        .orderBy("train_rank")
        .select("source")
        .collect()
    )
    seq = [r.source for r in order]
    assert len(seq) == 200
    # weight 3/5 source: every prefix carries it at 60% ± 2 items
    for L in (10, 25, 50, 100, 150, 200):
        got = seq[:L].count("a")
        want = 3 * L / 5
        assert abs(got - want) <= 2, (L, got, want)


def test_interleave_deterministic_and_total(spark):
    docs = _docs(spark, {"a": 30, "b": 15})
    w = {"a": 2, "b": 1}
    r1 = mixture_interleave(docs, w).orderBy("train_rank").collect()
    r2 = mixture_interleave(docs, w).orderBy("train_rank").collect()
    assert [tuple(x) for x in r1] == [tuple(x) for x in r2]
    ranks = [x.train_rank for x in r1]
    assert ranks == list(range(45))


def test_unknown_source_gets_default_weight(spark):
    docs = _docs(spark, {"a": 20, "zz": 20})
    order = (
        mixture_interleave(docs, {"a": 1})  # zz missing -> default 1
        .orderBy("train_rank")
        .select("source")
        .collect()
    )
    seq = [r.source for r in order]
    for L in (10, 20, 40):
        assert abs(seq[:L].count("a") - L / 2) <= 1


def test_seed_changes_within_source_order_not_mixture(spark):
    docs = _docs(spark, {"a": 40, "b": 20})
    w = {"a": 2, "b": 1}
    s1 = mixture_interleave(docs, w, seed=1).orderBy("train_rank").collect()
    s2 = mixture_interleave(docs, w, seed=2).orderBy("train_rank").collect()
    assert [x.source for x in s1] == [x.source for x in s2]  # schedule fixed
    assert [x.doc_id for x in s1] != [x.doc_id for x in s2]  # docs reshuffled


def test_matches_duckdb_replay(spark):
    docs = _docs(spark, {"a": 25, "b": 10, "c": 5})
    w = {"a": 5, "b": 2}
    eng = sorted(tuple(r) for r in mixture_interleave(docs, w).collect())
    con = duckdb.connect()
    con.register(
        "src_docs",
        pd.DataFrame(
            [(r.doc_id, r.source) for r in docs.collect()],
            columns=["doc_id", "source"],
        ),
    )
    ora = sorted(con.execute(mixture_interleave_sql("src_docs", w)).fetchall())
    assert eng == ora
