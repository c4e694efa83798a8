"""Distributed BPE tokenizer training (Sennrich 2016) — the
vocabulary-building step every LLM data pipeline runs before token
counting, chunking, and packing mean anything.

Design for scale: BPE never touches the raw corpus after one pass —
it trains on the WORD-FREQUENCY table (distinct token → count), which
is ~10^6-10^7 rows even for a 100 TB corpus. Each merge round is then
one pair-explode + one hash aggregation over that small table, a
driver-side top-1 (a LIMIT 1 on a tiny aggregate — the same
tiny-action pattern as the IVF build), and one per-word greedy fold,
with `localCheckpoint` truncating lineage per round exactly like
``connected_components``/``pagerank``.

Merge application is the EXACT greedy left-to-right fold (process
symbols in order; if the last accumulated symbol is `a` and the next
is `b`, replace with `ab`) — on a run aaaaa with merge (a,a) this
yields [aa, aa, a], matching reference BPE implementations. The fold
is a Spark `aggregate` higher-order function over the symbol array
(no UDF); the DuckDB oracle replays it with `list_reduce` over a
'|'-delimited accumulator — symbols are drawn from tokenized
[0-9a-z_] text, so '|' can never occur in one. Deterministic
tie-break on (count DESC, left ASC, right ASC) makes the learned
merge table bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_all


def _chars(col: Column) -> Column:
    return F.regexp_extract_all(col, F.lit("."), 0)


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (empty for <2)."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Exact greedy left-to-right merge of adjacent (a, b) → a+b."""
    merged = F.lit(a + b)
    tail = F.when(F.size(syms) >= 2, F.slice(syms, 2, F.size(syms) - 1)).otherwise(
        F.array().cast("array<string>")
    )
    folded = F.aggregate(
        tail,
        F.slice(syms, 1, 1),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.when(F.size(syms) < 2, syms).otherwise(folded)


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus pass: distinct token → count (map-side partial
    agg; this table is what every subsequent round reads)."""
    return (
        docs.select(F.explode(tokens_all(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> DataFrame:
    """Learn `n_merges` BPE merges over the corpus. Returns the merge
    table (rank, left_sym, right_sym, pair_count) — rank 1 is the
    first-learned (most frequent) merge. Stops early if no adjacent
    pair remains. See module docstring for the scale argument."""
    spark = docs.sparkSession
    words = (
        word_freqs(docs, text_col)
        .select("cnt", _chars(F.col("w")).alias("syms"))
        .localCheckpoint()
    )
    merges = []
    for rank in range(1, int(n_merges) + 1):
        top = (
            words.select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("tot"))
            .orderBy(F.desc("tot"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, tot = top[0]["a"], top[0]["b"], int(top[0]["tot"])
        merges.append((rank, a, b, tot))
        words = words.select(
            "cnt", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank long, left_sym string, right_sym string, pair_count long"
    )


def bpe_train_py(texts, n_merges=8):
    """Pure-Python reference of :func:`bpe_train` (same tokenization,
    same greedy merge, same tie-break), used by tests."""
    import re
    from collections import Counter

    words = Counter(
        w for t in texts for w in re.findall(r"[0-9a-z_]+", t.lower())
    )
    table = {w: list(w) for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in table.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        (a, b), tot = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, tot))
        for w, syms in table.items():
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            table[w] = out
    return merges


def bpe_encode_counts(docs: DataFrame, merges: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      broadcast_vocab: bool = True) -> DataFrame:
    """Apply a learned merge table → exact BPE token count per doc —
    the REAL tokenizer-budget number that the regex approximation
    (``textstats`` bpe-ish count) estimates.

    Scale design mirrors training: each DISTINCT word is encoded
    once (the merge folds run on the word table, not the corpus),
    then per-doc counts are one explode + join + sum. The merge
    table is collected driver-side (it is the tokenizer artifact —
    tiny by construction) and applied as `rank`-ordered chained
    greedy folds, identical semantics to training. `broadcast_vocab`
    fits vocabularies up to ~10^7 words in executor memory; disable
    to shuffle-join a larger one.

    Docs whose words all trained into the vocab (always true when
    encoding the training corpus itself) get exact counts; zero-token
    docs produce no row.
    """
    pairs = [
        (r["left_sym"], r["right_sym"])
        for r in merges.orderBy("rank").collect()
    ]
    # apply merges one checkpointed round at a time, exactly like
    # training: chaining all folds into ONE nested expression grows
    # the tree ~5× per merge (42 MB serialized plan at 6 merges,
    # impossible at a real vocab's hundreds) — per-round lineage
    # truncation keeps expression depth O(1) regardless of n_merges
    enc = (
        word_freqs(docs, text_col)
        .select("w", _chars(F.col("w")).alias("syms"))
        .localCheckpoint()
    )
    for a, b in pairs:
        enc = enc.select(
            "w", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint()
    vocab = enc.select("w", F.size("syms").alias("n_sym"))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    return (
        docs.select(F.col(id_col), F.explode(tokens_all(text_col)).alias("w"))
        .join(vocab, "w")
        .groupBy(id_col)
        .agg(F.sum("n_sym").cast("long").alias("n_bpe_tokens"))
    )
