"""Keep-best dedup election: score winner beats min-id, tie falls
back to min-id, losers-only output, singleton absence, DuckDB
replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.dedup import keep_best, keep_best_sql

# cluster 10: best member has the HIGHEST id (election != min-id);
# cluster 20: tie on score -> min id wins; 99 is a singleton.
COMPONENTS = [(1, 10), (2, 10), (3, 10), (21, 20), (22, 20), (99, 99)]
SCORES = [(1, 0.4), (2, 0.7), (3, 1.0), (21, 0.6), (22, 0.6), (99, 0.1)]


def _run(spark):
    cc = spark.createDataFrame(COMPONENTS, "id long, component long")
    sc = spark.createDataFrame(SCORES, "id long, score double")
    return {r.id: r for r in keep_best(cc, sc).collect()}


def test_election(spark):
    got = _run(spark)
    assert got[1].keep_id == 3 and got[2].keep_id == 3
    assert 3 not in got                      # the winner is never dropped
    assert got[22].keep_id == 21             # tie -> min id
    assert 21 not in got
    assert 99 not in got                     # singletons keep themselves
    assert got[1].keep_score == 1.0 and got[1].score == 0.4


def test_keep_best_duckdb_replay(spark):
    cc = spark.createDataFrame(COMPONENTS, "id long, component long")
    sc = spark.createDataFrame(SCORES, "id long, score double")
    spark_pdf = keep_best(cc, sc).toPandas().sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("cc", pd.DataFrame(COMPONENTS, columns=["id", "component"]))
    con.register("sc", pd.DataFrame(SCORES, columns=["id", "score"]))
    duck_pdf = (
        con.sql(keep_best_sql("cc", "sc")).df()
        .sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(spark_pdf, duck_pdf, check_dtype=False)
