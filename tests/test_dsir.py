"""DSIR hashed n-gram importance weights: target-resembling docs
outrank off-domain docs, exact equality with a from-spec Python
reference (hashlib + bit_length), and degenerate cases."""

import hashlib

from pyspark.sql import functions as F

from dblp_crawler_spark.operators.textstats import dsir_importance

A = "alpha beta gamma delta alpha beta"
B = "zeta eta theta iota kappa lambda"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_domain_docs_score_higher(spark):
    raw = _docs(spark, [(i, A) for i in range(10)] + [(i, B) for i in range(10, 20)])
    target = _docs(spark, [(100, A), (101, A)])
    got = {r.doc_id: r.dsir_bits for r in dsir_importance(raw, target).collect()}
    a_scores = {got[i] for i in range(10)}
    b_scores = {got[i] for i in range(10, 20)}
    assert len(a_scores) == 1 and len(b_scores) == 1
    assert a_scores.pop() > b_scores.pop()


def _h60(s: str, seed: int) -> int:
    return int(hashlib.md5((s + "\x1f" + str(seed)).encode()).hexdigest()[:15], 16)


def _py_dsir(raw, target, n_buckets=1 << 14, seed=11):
    def grams(text):
        t = text.split()
        if len(t) < 2:
            return [" ".join(t)]
        return [f"{a} {b}" for a, b in zip(t, t[1:])]

    def buckets(text):
        return [_h60(g, seed) % n_buckets for g in grams(text)]

    rc, tc = {}, {}
    for _, txt in raw:
        for b in buckets(txt):
            rc[b] = rc.get(b, 0) + 1
    for _, txt in target:
        for b in buckets(txt):
            tc[b] = tc.get(b, 0) + 1
    rt, tt = sum(rc.values()), sum(tc.values())
    norm = (rt + n_buckets).bit_length() - (tt + n_buckets).bit_length()
    out = {}
    for did, txt in raw:
        bs = buckets(txt)
        st = sum((tc.get(b, 0) + 1).bit_length() for b in bs)
        sr = sum((rc.get(b, 0) + 1).bit_length() for b in bs)
        out[did] = (len(bs), st, sr, st - sr + len(bs) * norm)
    return out


def test_matches_python_reference(spark):
    raw_rows = [
        (0, "the quick brown fox"),
        (1, "the quick red fox jumps"),
        (2, "lorem ipsum dolor sit amet"),
        (3, "single"),
        (4, "the quick brown fox"),
    ]
    tgt_rows = [(9, "the quick brown cat"), (8, "quick brown fox den")]
    got = {
        r.doc_id: (r.n_grams, r.sum_t_bits, r.sum_r_bits, r.dsir_bits)
        for r in dsir_importance(_docs(spark, raw_rows), _docs(spark, tgt_rows)).collect()
    }
    assert got == _py_dsir(raw_rows, tgt_rows)


def test_empty_target_is_uniform_penalty(spark):
    raw = _docs(spark, [(0, A), (1, B)])
    target = _docs(spark, []).filter(F.lit(False))
    got = {r.doc_id: r for r in dsir_importance(raw, target).collect()}
    # with no target mass every gram has bits(0+1)=1 on the target
    # side; scores still defined, ranking driven by raw rarity only
    assert set(got) == {0, 1}
    assert all(r.sum_t_bits == r.n_grams for r in got.values())
