"""SemDeDup auto-parameterization (r4 verdict item 3): cells grow
with the corpus (k ≈ √n) so the in-cell pair scan can never re-create
the fixed-k quadratic blowup, and the large-k assignment runs through
the Arrow-vectorized exact-int64 argmin — pinned value-identical to
the pure-expression HOF path."""

import math

from dblp_crawler_spark.operators import dedup as D
from dblp_crawler_spark.operators import similarity as SIM


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_vectorized_assign_matches_hof(spark, monkeypatch):
    emb = _emb(spark)
    cents_h, asg_h = SIM.ivf_index_quantized(emb, n_cells=12, iters=1, seed=7)
    hof = {(r["vec_id"], r["cell"]) for r in asg_h.select("vec_id", "cell").collect()}
    cents_hof = {(r["cell"], tuple(r["qcent"])) for r in cents_h.collect()}
    monkeypatch.setattr(SIM, "_MAX_HOF_CELLS", 1)  # force the numpy path
    cents_v, asg_v = SIM.ivf_index_quantized(emb, n_cells=12, iters=1, seed=7)
    vec = {(r["vec_id"], r["cell"]) for r in asg_v.select("vec_id", "cell").collect()}
    cents_vec = {(r["cell"], tuple(r["qcent"])) for r in cents_v.collect()}
    assert vec == hof and len({c for _, c in hof}) > 1
    # the Lloyd update consumed an identical assignment → identical
    # re-normalized integer centroids
    assert cents_vec == cents_hof
    assert dict(asg_v.dtypes)["cell"] == dict(asg_h.dtypes)["cell"]


def test_semdedup_auto_cells_equals_explicit(spark):
    emb = _emb(spark)
    n = emb.count()
    k = max(8, min(math.isqrt(n) + 1, D._MAX_AUTO_CELLS))
    auto = {tuple(r) for r in D.semantic_dedup(emb, threshold=0.9).collect()}
    explicit = {
        tuple(r) for r in D.semantic_dedup(emb, n_cells=k, threshold=0.9).collect()
    }
    assert auto == explicit


def test_semdedup_auto_bounds():
    """Pure sizing arithmetic: floor at 8, cap at _MAX_AUTO_CELLS."""
    size = lambda n: max(8, min(math.isqrt(n) + 1, D._MAX_AUTO_CELLS))  # noqa: E731
    assert size(10) == 8
    assert size(10_000) == 101
    assert size(10**9) == D._MAX_AUTO_CELLS
