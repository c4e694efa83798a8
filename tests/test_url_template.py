"""URL template mining + per-template fan-out cap: template pins,
cap semantics on a planted hot template, salted-vs-single-window
equivalence via the DuckDB replay, determinism."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.functions.urlnorm import url_template, url_template_sql
from dblp_crawler_spark.operators.frontier import template_cap, template_cap_sql


def test_template_pins(spark):
    cases = {
        "https://www.shop.org/item/48213?color=red&size=9":
            "www.shop.org/item/{N}?color&size",
        "https://cal.org/2024/11/30/": "cal.org/{N}/{N}/{N}/",
        "https://cdn.org/obj/deadbeef123456/th.png": "cdn.org/obj/{H}/th.png",
        "https://a.org/мир/7#frag": "a.org/мир/{N}",
        "https://a.org": "a.org/",
        "https://a.org/x2y": "a.org/x{N}y",      # short digit runs collapse
        "https://a.org/cafe": "a.org/cafe",      # <8 hex chars stay literal
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r.url: r.t for r in df.select("url", url_template("url").alias("t")).collect()}
    assert got == cases
    con = duckdb.connect()
    for u, want in cases.items():
        frag = url_template_sql("'" + u + "'")
        assert con.sql(f"SELECT {frag}").fetchone()[0] == want, u


def _urls(spark):
    rows = (
        # hot template: 300 calendar urls
        [(f"https://cal.org/{2000 + i % 25}/{i % 12 + 1}/p{i}",) for i in range(300)]
        # small template: 7 urls
        + [(f"https://a.org/page/{i}",) for i in range(7)]
    )
    return rows, spark.createDataFrame(rows, "url string")


def test_cap_semantics_on_hot_template(spark):
    rows, df = _urls(spark)
    out = template_cap(df, max_per_template=20).collect()
    by_t = {}
    for r in out:
        by_t.setdefault(r.template, []).append(r)
    hot = by_t["cal.org/{N}/{N}/p{N}"]
    small = by_t["a.org/page/{N}"]
    assert len(hot) == 300
    admitted = [r for r in hot if r.admitted]
    assert len(admitted) == 20
    assert sorted(r.tmpl_rank for r in admitted) == list(range(1, 21))
    assert all(r.tmpl_rank is None for r in hot if not r.admitted)
    assert len(small) == 7 and all(r.admitted for r in small)
    assert sorted(r.tmpl_rank for r in small) == list(range(1, 8))


def test_deterministic_and_duckdb_equivalent(spark):
    rows, df = _urls(spark)
    a = sorted(tuple(r) for r in template_cap(df, max_per_template=20).collect())
    b = sorted(tuple(r) for r in template_cap(df, max_per_template=20).collect())
    assert a == b
    con = duckdb.connect()
    con.register("u", pd.DataFrame(rows, columns=["url"]))
    duck = (
        con.sql(template_cap_sql("u", max_per_template=20)).df()
        .sort_values("url").reset_index(drop=True)
    )
    spark_pdf = (
        template_cap(df, max_per_template=20).toPandas()
        .sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck[spark_pdf.columns], check_dtype=False)


def test_no_cartesian_and_bounded_windows(spark):
    _, df = _urls(spark)
    plan = (
        template_cap(df, max_per_template=20)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
