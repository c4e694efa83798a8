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


# ---- binary sign quantization + hamming ANN ------------------------------------

def _bq_ref(vecs):
    """From-spec Python packing + hamming."""
    codes = {}
    for vid, v in vecs:
        words = []
        for base in range(0, len(v), 32):
            w = 0
            for i, x in enumerate(v[base:base + 32]):
                if x > 0:
                    w |= 1 << i
            words.append(w)
        codes[vid] = words
    return codes


def test_binary_quantize_matches_reference(spark):
    from dblp_crawler_spark.operators.similarity import binary_quantize

    vecs = [
        (i, [((i * 31 + j * 7) % 13 - 6) / 10.0 for j in range(64)])
        for i in range(30)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r.vec_id: list(r.words)
           for r in binary_quantize(df, dim=64).collect()}
    want = _bq_ref([(i, v) for i, v in vecs])
    assert got == want


def test_binary_hamming_topk_exact_and_replay(spark):
    import duckdb
    import pandas as pd

    from dblp_crawler_spark.operators.similarity import (
        binary_hamming_topk,
        binary_hamming_topk_sql,
    )

    vecs = [
        (i, [((i * 31 + j * 7) % 13 - 6) / 10.0 for j in range(64)])
        for i in range(60)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = binary_hamming_topk(df, F.col("vec_id") % 20 == 0, k=5)
    rows = out.collect()
    # python reference distances
    codes = _bq_ref(vecs)

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(codes[a], codes[b]))

    by_q = {}
    for r in rows:
        assert r.vec_id != r.query_id
        assert r.hamming == ham(r.query_id, r.vec_id)
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == 5
        want = sorted(
            ((ham(qid, v), v) for v, _ in vecs if v != qid)
        )[:5]
        got = sorted((r.hamming, r.vec_id) for r in rs)
        assert got == want
    # replay
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        [(i, v) for i, v in vecs], columns=["vec_id", "embedding"]))
    duck = (
        con.sql(binary_hamming_topk_sql("embeddings", "vec_id % 20 = 0", k=5)).df()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    spark_pdf = out.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(spark_pdf, duck[spark_pdf.columns], check_dtype=False)


def test_embedding_quality_gate(spark):
    from dblp_crawler_spark.operators.similarity import embedding_quality

    rows = [
        (1, [0.1] * 64),
        (2, [0.1] * 63 + [float("nan")]),
        (3, [0.0] * 64),
        (4, [0.1] * 32),
        (5, [1e6] + [0.1] * 63),
        (6, []),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: (r.has_nan, r.zero_norm, r.ok)
           for r in embedding_quality(df, dim=64).collect()}
    assert got[1] == (False, False, True)
    assert got[2] == (True, False, False)
    assert got[3] == (False, True, False)
    assert got[4] == (False, False, False)     # wrong dims
    assert got[5] == (False, False, False)     # exploded magnitude
    assert got[6][2] is False and got[7][2] is False
