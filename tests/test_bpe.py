"""Distributed BPE training (operators/bpe.py): Spark vs the pure-
Python same-algorithm reference, greedy-fold semantics on runs, and
tie-break determinism."""

from dblp_crawler_spark.operators.bpe import bpe_train, bpe_train_py


def _run(spark, texts, n_merges):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        (r.rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(docs, n_merges=n_merges).collect()
    ]


def test_bpe_matches_python_reference(spark):
    texts = ["the theme of the thesis", "these themes are the same",
             "low lower lowest", "newer newest news"]
    assert _run(spark, texts, 8) == bpe_train_py(texts, 8)


def test_bpe_greedy_run_semantics(spark):
    # 'aaaaa' (word count 3): 4 adjacent (a,a) pairs x 3 = 12. Greedy
    # left-to-right merges to [aa, aa, a] — whose pairs (aa,aa) and
    # (aa,a) tie at 3 and resolve to (aa,a) by pair-ASC. The wrong
    # fold [aa, a, aa] would instead yield (a,aa): merge 2 pins the
    # greedy order.
    texts = ["aaaaa aaaaa aaaaa"]
    got = _run(spark, texts, 2)
    assert got[0] == (1, "a", "a", 12)
    assert got[1] == (2, "aa", "a", 3)
    assert got == bpe_train_py(texts, 2)


def test_bpe_tie_break_deterministic(spark):
    # 'ab' and 'cd' both occur twice: (a,b) wins on pair ASC order.
    texts = ["ab cd", "ab cd"]
    got = _run(spark, texts, 1)
    assert got == [(1, "a", "b", 2)] == bpe_train_py(texts, 1)


def test_bpe_stops_when_no_pairs_remain(spark):
    # single-char words: zero adjacent pairs, zero merges
    assert _run(spark, ["a b c", "b c a"], 4) == []
    # one word 'ab': merge 1 consumes it, then nothing remains
    assert _run(spark, ["ab"], 4) == [(1, "a", "b", 1)]


def test_bpe_encode_counts_exact(spark):
    from pyspark.sql import functions as F

    from dblp_crawler_spark.operators.bpe import bpe_encode_counts

    texts = ["the theme of the", "thesis these themes", "low lower lowest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=4)
    got = {r.doc_id: r.n_bpe_tokens
           for r in bpe_encode_counts(docs, merges).collect()}
    # python ground truth: re-train and re-encode with the reference
    ref_merges = bpe_train_py(texts, 4)
    import re

    def enc(word):
        syms = list(word)
        for _, a, b, _ in ref_merges:
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        return len(syms)

    ref = {i: sum(enc(w) for w in re.findall(r"[0-9a-z_]+", t.lower()))
           for i, t in enumerate(texts)}
    assert got == ref
    # merges shrink the count vs raw characters for every doc
    chars = {i: sum(len(w) for w in re.findall(r"[0-9a-z_]+", t.lower()))
             for i, t in enumerate(texts)}
    assert all(got[i] < chars[i] for i in got)
