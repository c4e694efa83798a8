"""Product quantization: deterministic codebooks, the own-code-ADC
minimality invariant, identical codes for identical vectors, packing,
and re-ranked recall vs the exact oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.similarity import (
    brute_force_topk,
    pq_adc_topk,
    pq_encode,
    pq_pack,
    pq_topk_reranked,
    pq_train,
)

DIM, M, K = 16, 4, 8


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=DIM).astype(float).tolist()) for i in range(200)]
    # planted exact twin: vec 900 == vec 0
    rows.append((900, rows[0][1]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()


@pytest.fixture(scope="module")
def trained(corpus):
    cb = pq_train(corpus, dim=DIM, m=M, n_codes=K, iters=2, seed=5)
    codes = pq_encode(corpus, cb, dim=DIM, m=M, n_codes=K)
    return cb, codes.cache()


def test_codebook_deterministic(corpus):
    a = pq_train(corpus, dim=DIM, m=M, n_codes=K, iters=1, seed=5)
    b = pq_train(corpus, dim=DIM, m=M, n_codes=K, iters=1, seed=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_identical_vectors_identical_codes(trained):
    _, codes = trained
    packed = {r.vec_id: r.codes for r in pq_pack(codes).collect()}
    assert packed[900] == packed[0]
    assert all(len(c) == M for c in packed.values())
    assert all(0 <= x < K for c in packed.values() for x in c)


def test_own_code_adc_is_minimal(corpus, trained):
    """A query equal to a corpus vector: its own code minimizes every
    subspace distance table, so the vector itself (or an identical
    twin, tie → smaller id) must rank 1."""
    cb, codes = trained
    queries = corpus.filter(F.col("vec_id").isin(0, 17, 42)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = pq_adc_topk(queries, codes, cb, dim=DIM, m=M, k=1).collect()
    got = {r.q_id: r.vec_id for r in top}
    assert got[0] == 0  # twin 900 ties, smaller id wins
    assert got[17] == 17
    assert got[42] == 42


def test_reranked_recall_vs_exact(corpus, trained):
    cb, codes = trained
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = brute_force_topk(queries, corpus, k=10)
    got = pq_topk_reranked(queries, codes, cb, corpus, dim=DIM, m=M,
                           k=10, shortlist=50)
    e = {(r.q_id, r.vec_id) for r in exact.collect()}
    g = {(r.q_id, r.vec_id) for r in got.collect()}
    recall = len(e & g) / len(e)
    assert recall >= 0.5, recall


def test_empty_code_shrinks_codebook(spark):
    # 3 distinct values, 4 requested codes: at most 3 survive a round
    rows = [(i, [float(i % 3)] * DIM) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train(df, dim=DIM, m=M, n_codes=4, iters=1, seed=1)
    per_j = cb.groupBy("j").count().collect()
    assert all(r["count"] <= 3 for r in per_j)
