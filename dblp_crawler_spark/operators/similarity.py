"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute-force cosine top-k — the exactness baseline: broadcast the
    (small) query set against the corpus, JVM-side zip_with dot
    products, per-query top-k window;
  * LSH-bucketed ANN — the scale path: deterministic random
    hyperplanes (seeded numpy, shipped as literals) → sign bits →
    bucket equi-join with multi-probe (hamming-1 neighbors), exact
    re-rank inside the candidate set.

At 100 TB the corpus side is bucketed-by-signature on disk, so the
probe join prunes partitions; the brute-force path stays as the
verification oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_sim


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                     q_id: str = "q_id", c_id: str = "vec_id",
                     q_vec: str = "q_vec", c_vec: str = "embedding") -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on corpus id.
    Queries are broadcast (the small side by construction)."""
    q = F.broadcast(queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("__qv")))
    c = corpus.select(F.col(c_id), F.col(c_vec).cast("array<double>").alias("__cv"))
    scored = q.crossJoin(c).withColumn("cosine", cosine_sim(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def _planes_literal(planes: np.ndarray) -> Column:
    """array<array<double>> literal via ONE parsed SQL expression.
    (Building it from per-element F.lit calls costs thousands of py4j
    round trips — measured ~8 s of driver time for 8 tables x 6
    planes x 64 dims before any Spark work started.)"""
    rows = ",".join("array(" + ",".join(f"{float(x)!r}D" for x in row) + ")" for row in planes)
    return F.expr(f"array({rows})")


def lsh_signature(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature: bit_i = 1 iff vec · plane_i > 0 — one
    zip_with over (plane, bitmask) pairs, JVM-side, no UDF."""
    pl = _planes_literal(planes)
    masks = F.expr("array(" + ",".join(f"{1 << i}L" for i in range(len(planes))) + ")")
    bits = F.zip_with(
        pl,
        masks,
        lambda p, m: F.when(
            F.aggregate(F.zip_with(vec, p, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v) > 0,
            m,
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, x: a.bitwiseOR(x))


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 10, n_planes: int = 8,
             n_tables: int = 4, seed: int = 42, dim: int | None = None,
             q_id: str = "q_id", c_id: str = "vec_id",
             q_vec: str = "q_vec", c_vec: str = "embedding",
             multiprobe: bool = True) -> DataFrame:
    """ANN top-k, standard multi-table LSH: L independent plane sets,
    candidate = bucket match in ANY table (plus hamming-1 probes),
    exact cosine re-rank within the candidate set. Recall < 1 by
    design; compare against brute_force_topk to measure it.

    The bucket join key is (table, bucket) — at scale the corpus is
    written bucketed by this key so each probe is partition-pruned."""
    if dim is None:
        dim = len(corpus.select(c_vec).first()[0])
    c0 = corpus.select(F.col(c_id), F.col(c_vec).cast("array<double>").alias("__cv"))
    q0 = queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("__qv"))
    sig_cols_c, sig_cols_q = [], []
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed + t)
        sig_cols_c.append(lsh_signature(F.col("__cv"), planes).alias(f"b{t}"))
        sig_cols_q.append(lsh_signature(F.col("__qv"), planes).alias(f"b{t}"))
    c = c0.select(F.col(c_id), F.col("__cv"), F.posexplode(F.array(*sig_cols_c)).alias("table", "bucket"))
    q = q0.select(F.col(q_id), F.col("__qv"), F.posexplode(F.array(*sig_cols_q)).alias("table", "bucket"))
    if multiprobe:
        masks = F.array(*[F.lit(1 << i).cast("long") for i in range(n_planes)])
        probes = F.array_union(
            F.array(F.col("bucket")),
            F.transform(masks, lambda m: F.col("bucket").bitwiseXOR(m)),
        )
        q = q.withColumn("bucket", F.explode(probes))
    scored = (
        q.join(c, ["table", "bucket"])
        .select(q_id, c_id, "__qv", "__cv")
        .dropDuplicates([q_id, c_id])
        .withColumn("cosine", cosine_sim(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cosine", 6).alias("cosine"), "rank")
    )
