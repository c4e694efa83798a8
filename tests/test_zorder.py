"""Z-order layout (functions/zorder.py): Morton key pins vs a
from-spec Python reference, the DuckDB replay, and the zone-map
pruning property that is the operator's reason to exist."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dblp_crawler_spark.functions.zorder import (
    morton_key,
    morton_key_sql,
    zorder_file_stats,
    zorder_file_stats_sql,
)


def _morton_ref(a: int, b: int) -> int:
    a &= 0x7FFFFFFF
    b &= 0x7FFFFFFF
    out = 0
    for i in range(31):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_pins_and_reference(spark):
    cases = [(5, 3), (0, 0), (1, 0), (0, 1), (2**31 - 1, 2**31 - 1),
             (12345678, 87654321), (2**31 + 7, 5)]  # clamp pin
    assert _morton_ref(5, 3) == 27
    df = spark.createDataFrame(cases, "a long, b long")
    got = [r.k for r in df.select(morton_key("a", "b").alias("k")).collect()]
    assert got == [_morton_ref(a, b) for a, b in cases]
    con = duckdb.connect()
    con.register("c", pd.DataFrame(cases, columns=["a", "b"]))
    duck = [r[0] for r in
            con.sql(f"SELECT {morton_key_sql('a', 'b')} FROM c").fetchall()]
    assert duck == got
    # NULL routes to NULL, never tile 0
    ndf = spark.createDataFrame([(None, 3)], "a long, b long")
    assert ndf.select(morton_key("a", "b").alias("k")).collect()[0].k is None


def _files_hit(stats, alo, ahi, blo, bhi):
    return sum(
        1 for r in stats
        if r.max_a >= alo and r.min_a <= ahi and r.max_b >= blo and r.min_b <= bhi
    )


def test_zorder_pruning_beats_linear(spark):
    grid = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(grid, "a long, b long")
    z = zorder_file_stats(df, "a", "b", n_files=16).collect()
    assert sum(r.n_rows for r in z) == 4096
    # linear layout: sort by a only (simulated the same way)
    from pyspark.sql import Window

    lin = (
        df.withColumn("__rn", F.row_number().over(
            Window.orderBy(F.col("a").asc(), F.col("b").asc())) - 1)
        .withColumn("file_id", F.expr("__rn div 256"))
        .groupBy("file_id")
        .agg(F.min("a").alias("min_a"), F.max("a").alias("max_a"),
             F.min("b").alias("min_b"), F.max("b").alias("max_b"))
        .collect()
    )
    # 2-D box: z-order confines it to one 16x16 tile
    assert _files_hit(z, 8, 15, 8, 15) == 1
    assert _files_hit(lin, 8, 15, 8, 15) >= 2
    # predicate on the SECOND column only: linear layout prunes nothing
    assert _files_hit(lin, 0, 63, 0, 7) == 16
    assert _files_hit(z, 0, 63, 0, 7) <= 4


def test_zorder_stats_replay(spark):
    rows = [((i * 131) % 200, (i * 197) % 300) for i in range(500)]
    df = spark.createDataFrame(rows, "a long, b long")
    sp = (zorder_file_stats(df, "a", "b", n_files=8).toPandas()
          .sort_values("file_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("src", pd.DataFrame(rows, columns=["a", "b"]))
    dk = (con.sql(zorder_file_stats_sql("src", "a", "b", n_files=8)).df()
          .sort_values("file_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(sp, dk[sp.columns], check_dtype=False)
