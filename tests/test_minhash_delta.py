"""Incremental minhash delta: planted dup found via the state probe,
clean docs pass, and the delta-maintenance exactness contract —
state + wave delta == rebuild-from-scratch index."""

from pyspark.sql import functions as F

from dblp_crawler_spark.functions.hashing import hash60
from dblp_crawler_spark.operators.dedup import (
    minhash_bands,
    minhash_delta,
    minhash_signature,
)

SIG = dict(num_hashes=16, hash_fn=hash60)
KW = dict(num_hashes=16, bands=8, hash_fn=hash60)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus_rows():
    return [
        (i, " ".join(f"w{(i * 31 + j * 7) % 97}" for j in range(40)))
        for i in range(1, 40)
    ]


def test_planted_dup_found_and_clean_docs_pass(spark):
    corpus = _corpus_rows()
    old = _docs(spark, corpus)
    sigs = minhash_signature(old, **SIG)
    band_state = minhash_bands(sigs, bands=8, hash_fn=hash60)
    new_rows = [
        (100, corpus[4][1]),                                   # exact copy of doc 5
        (101, " ".join(f"z{j}" for j in range(40))),           # novel
    ]
    matches, _, _ = minhash_delta(
        _docs(spark, new_rows), sigs, band_state, min_agree_lanes=12, **KW
    )
    got = {(r.doc_id, r.dup_of): r.agree_lanes for r in matches.collect()}
    assert got.get((100, 5)) == 16          # exact dup → all lanes agree
    assert all(nid != 101 for nid, _ in got)


def test_state_plus_delta_equals_rebuild(spark):
    corpus = _corpus_rows()
    wave = [(200, corpus[0][1]), (201, "totally new words only here")]
    old = _docs(spark, corpus)
    sigs = minhash_signature(old, **SIG)
    band_state = minhash_bands(sigs, bands=8, hash_fn=hash60)
    _, new_sigs, new_bands = minhash_delta(
        _docs(spark, wave), sigs, band_state, min_agree_lanes=12, **KW
    )
    merged_sigs = sorted(
        tuple(r) for r in sigs.unionByName(new_sigs).collect()
    )
    merged_bands = sorted(
        tuple(r) for r in band_state.unionByName(new_bands).collect()
    )
    full = _docs(spark, corpus + wave)
    rebuilt_sigs = minhash_signature(full, **SIG)
    rebuilt_bands = minhash_bands(rebuilt_sigs, bands=8, hash_fn=hash60)
    assert merged_sigs == sorted(tuple(r) for r in rebuilt_sigs.collect())
    assert merged_bands == sorted(tuple(r) for r in rebuilt_bands.collect())


def test_probe_plan_is_equi_join(spark):
    corpus = _corpus_rows()
    old = _docs(spark, corpus)
    sigs = minhash_signature(old, **SIG)
    band_state = minhash_bands(sigs, bands=8, hash_fn=hash60)
    matches, _, _ = minhash_delta(
        _docs(spark, [(300, corpus[1][1])]), sigs, band_state,
        min_agree_lanes=12, **KW
    )
    plan = matches._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
