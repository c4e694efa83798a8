"""Host-level content pathologies (operators/hostdup.py): soft-404
template detection and mirror-host containment — hand pins + DuckDB
replays."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.hostdup import (
    mirror_host_pairs,
    mirror_host_pairs_sql,
    soft404_detect,
    soft404_detect_sql,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, content_hash string"
    )


def test_soft404_pins(spark):
    rows = (
        # host A: 6/10 pages share ERR (share 600‰ ≥ 400‰, n 6 ≥ 5)
        [(f"a/{i}", "a", "ERR") for i in range(6)]
        + [(f"a/u{i}", "a", f"ca{i}") for i in range(4)]
        # host B: 3/6 share — share passes but support 3 < min_n
        + [(f"b/{i}", "b", "ERRB") for i in range(3)]
        + [(f"b/u{i}", "b", f"cb{i}") for i in range(3)]
        # host C: 5/20 share — support passes but share 250‰ < 400‰
        + [(f"c/{i}", "c", "ERRC") for i in range(5)]
        + [(f"c/u{i}", "c", f"cc{i}") for i in range(15)]
    )
    out = soft404_detect(_pages(spark, rows)).collect()
    flagged = {r.url for r in out if r.is_soft404}
    assert flagged == {f"a/{i}" for i in range(6)}
    by_url = {r.url: r for r in out}
    assert by_url["a/0"].template_n == 6 and by_url["a/0"].host_n == 10
    assert by_url["a/u0"].template_n is None
    assert len(out) == len(rows)


def test_soft404_replay(spark):
    rows = [(f"u{i}", f"h{i % 4}",
             "T" if i % 3 else f"c{i}") for i in range(60)]
    sdf = _pages(spark, rows)
    spark_pdf = (
        soft404_detect(sdf)
        .select("url", "host", "content_hash", "template_n", "host_n",
                "is_soft404")
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pages", pd.DataFrame(
        rows, columns=["url", "host", "content_hash"]))
    duck_pdf = (
        con.sql(soft404_detect_sql("pages")).df()
        .sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_mirror_pins(spark):
    rows = (
        # m1/m2: perfect mirrors over 5 hashes
        [(f"m1/{i}", "m1", f"s{i}") for i in range(5)]
        + [(f"m2/{i}", "m2", f"s{i}") for i in range(5)]
        # m3 contains 4 of m1's 5 plus 4 own → containment vs m1 =
        # 4/min(5,8) = 0.8 ≥ τ
        + [(f"m3/{i}", "m3", f"s{i}") for i in range(4)]
        + [(f"m3/x{i}", "m3", f"t{i}") for i in range(4)]
        # q1/q2 share only 2 hashes (< min_shared)
        + [("q1/0", "q1", "w0"), ("q1/1", "q1", "w1"), ("q1/2", "q1", "z1"),
           ("q2/0", "q2", "w0"), ("q2/1", "q2", "w1"), ("q2/2", "q2", "z2")]
    )
    got = {(r.host_a, r.host_b): r
           for r in mirror_host_pairs(_pages(spark, rows)).collect()}
    assert set(got) == {("m1", "m2"), ("m1", "m3"), ("m2", "m3")}
    assert got[("m1", "m2")].shared == 5
    assert got[("m1", "m2")].containment == 1.0
    assert got[("m1", "m2")].jaccard == 1.0
    assert got[("m1", "m3")].shared == 4
    assert got[("m1", "m3")].containment == 0.8
    assert got[("m1", "m3")].jaccard == round(4 / 9, 4)


def test_mirror_hot_hash_cap(spark):
    # a boilerplate hash on every host must NOT create pairs
    rows = [(f"h{i}/p", f"h{i}", "EMPTY") for i in range(20)]
    rows += [(f"h{i}/q{j}", f"h{i}", f"c{i}_{j}")
             for i in range(20) for j in range(3)]
    out = mirror_host_pairs(_pages(spark, rows), max_hosts_per_hash=16)
    assert out.count() == 0
    # raising the cap above the spread would admit them (sanity of
    # the cap itself; min_shared=1 so single-hash pairs qualify)
    out2 = mirror_host_pairs(_pages(spark, rows), max_hosts_per_hash=50,
                             tau_milli=100, min_shared=1)
    assert out2.count() == 20 * 19 // 2


def test_mirror_replay(spark):
    rows = [(f"u{i}", f"h{i % 6}", f"c{i % 9}") for i in range(120)]
    sdf = _pages(spark, rows)
    spark_pdf = (
        mirror_host_pairs(sdf, tau_milli=300, min_shared=1)
        .toPandas().sort_values(["host_a", "host_b"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pages", pd.DataFrame(
        rows, columns=["url", "host", "content_hash"]))
    duck_pdf = (
        con.sql(mirror_host_pairs_sql("pages", tau_milli=300, min_shared=1))
        .df().sort_values(["host_a", "host_b"]).reset_index(drop=True)
    )
    assert len(spark_pdf) > 0
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )


def test_mirror_no_cartesian_plan(spark):
    sdf = _pages(spark, [("u", "h", "c")])
    plan = mirror_host_pairs(sdf)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_host_language_profile_pins_and_replay(spark):
    import math

    from dblp_crawler_spark.operators.hostdup import (
        host_language_profile,
        host_language_profile_sql,
    )

    rows = (
        [("a", "en")] * 8 + [("a", "de")] * 2        # clean: en dominant
        + [("b", "en")] * 3 + [("b", "de")] * 3      # tie → 'de' (lex first)
        + [("c", "en"), ("c", "de"), ("c", "fr"), ("c", "zh")]  # farm shape
    )
    df = spark.createDataFrame(rows, "host string, lang string")
    got = {r.host: r for r in host_language_profile(df).collect()}
    assert (got["a"].n_pages, got["a"].n_langs) == (10, 2)
    assert got["a"].dominant_lang == "en" and got["a"].dominant_share == 0.8
    ent_a = -(0.8 * math.log2(0.8) + 0.2 * math.log2(0.2))
    assert got["a"].lang_entropy == round(ent_a, 4)
    assert got["b"].dominant_lang == "de" and got["b"].dominant_share == 0.5
    assert got["b"].lang_entropy == 1.0
    assert got["c"].n_langs == 4 and got["c"].lang_entropy == 2.0
    # replay
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("pages", pd.DataFrame(rows, columns=["host", "lang"]))
    spark_pdf = (host_language_profile(df).toPandas()
                 .sort_values("host").reset_index(drop=True))
    duck_pdf = (con.sql(host_language_profile_sql("pages")).df()
                .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf[spark_pdf.columns], check_dtype=False
    )
