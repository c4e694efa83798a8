"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting. All native expressions (P2-style
tokenization shared with the crawl filter path) — DuckDB-oracle-able
because every formula is plain SQL arithmetic over the same
tokenization regex.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize

# deterministic tiny english stopword list (shared with oracle SQL —
# keep sorted & lowercase)
EN_STOPWORDS = sorted(
    "a an and are as at be by for from has he in is it its of on that the to was were will with".split()
)


def tokens_all(text: Column | str) -> Column:
    """All (non-distinct) tokens — counting needs multiplicity."""
    t = F.lower(F.col(text) if isinstance(text, str) else text)
    return F.filter(F.split(t, r"[^0-9a-z_]+"), lambda w: w != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens_all(text))


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """Ordered word n-grams WITH multiplicity (repetition analysis
    needs duplicates; `dedup.shingles` layers array_distinct on top).

    Built as n-1 zip_with concatenations of shifted slices — flat
    O(tokens) JVM work (a per-index `transform(..., i -> slice)`
    materializes an n-array per position through interpreted lambdas;
    measured ~25× slower). Texts shorter than n tokens collapse to a
    single joined gram so every non-empty doc yields ≥1 gram."""
    toks = tokens_all(text)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    sh = F.slice(toks, 1, m)
    for k in range(1, n):
        sh = F.zip_with(sh, F.slice(toks, k + 1, m), lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(F.size(toks) >= n, sh).otherwise(F.array(F.array_join(toks, " ")))


def token_ngrams(toks: Column, n: int) -> Column:
    """Ordered n-grams of a token-ARRAY column (strict form: the
    caller must guarantee size(toks) >= n, e.g. with a filter —
    shorter arrays make the slice length non-positive). Same n-1
    zip_with shifted-slice construction as word_ngrams, without its
    short-text single-gram fallback; gram i starts at token offset i
    (0-based), which is what span-level operators key on."""
    m = F.size(toks) - (n - 1)
    sh = F.slice(toks, 1, m)
    for k in range(1, n):
        sh = F.zip_with(sh, F.slice(toks, k + 1, m), lambda x, y: F.concat(x, F.lit(" "), y))
    return sh


def repetition_ratio(text: Column | str, n: int = 3) -> Column:
    """Fraction of repeated word n-grams: 1 - distinct/total — the
    classic boilerplate/spam signal of pretraining curation (high =
    the doc repeats itself). Pure per-row expression, no shuffle."""
    g = word_ngrams(text, n)
    return F.when(
        F.size(g) > 0, F.lit(1.0) - F.size(F.array_distinct(g)) / F.size(g)
    ).otherwise(F.lit(0.0))


def top_ngrams(docs: DataFrame, n: int = 3, k: int = 20,
               text_col: str = "text") -> DataFrame:
    """Corpus-wide k most frequent word n-grams (boilerplate
    discovery: the grams shared by thousands of docs are the
    templates/footers to strip). explode → hash-agg with map-side
    partial counts → orderBy+limit, which Spark executes as
    TakeOrderedAndProject: each partition keeps only its local top-k,
    no global sort materialization — scale-safe at any corpus size.
    Ties broken by gram text for a deterministic result."""
    g = docs.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
    return (
        g.groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
    )


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens_all(text)
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(F.length(t) > 0, punct / F.length(t)).otherwise(F.lit(0.0))


def lang_id(text: Column | str, en_threshold: float = 0.05) -> Column:
    """N-gram/stopword heuristic: enough english stopwords → 'en';
    any CJK chars → 'zh'; else 'unk'."""
    t = F.col(text) if isinstance(text, str) else text
    has_cjk = F.length(F.regexp_replace(t, r"[^一-鿿]", "")) > 0
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(stopword_ratio(t) >= en_threshold, F.lit("en"))
        .otherwise(F.lit("unk"))
    )


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality: length band + low punctuation +
    healthy stopword ratio (the classic pretraining heuristics)."""
    t = F.col(text) if isinstance(text, str) else text
    n_tok = F.size(tokens_all(t))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(t) <= 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
    sw_ok = F.when(stopword_ratio(t) >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(len_ok + punct_ok + sw_ok, 6)


def pack_shards(docs: DataFrame, shard_tokens: int, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Sequence packing: walk docs in id order and assign
    shard = floor(exclusive_prefix_tokens / shard_tokens) —
    consecutive docs fill a training shard until its token budget is
    crossed, then the next shard starts. Returns
    (id, n_tokens, shard).

    Same two-pass distributed prefix sum as the crawl's
    `global_sequence` (operators/scheduler.py): range partition on
    id, per-partition running sum in parallel, then the exclusive
    prefix of the per-partition token TOTALS (a #partitions-row
    aggregate) broadcast back. No global single-partition window —
    the only Window.orderBy with no partition key runs over the
    tiny totals aggregate."""
    from pyspark.sql import Window

    n_part = max(2, docs.sparkSession.sparkContext.defaultParallelism)
    d = (
        docs.select(F.col(id_col), token_count(text_col).cast("long").alias("n_tokens"))
        .repartitionByRange(n_part, id_col)
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
        # freeze the partitioning before the two branches read it —
        # independently re-executed range exchanges can draw different
        # boundaries (sampler seed includes the RDD id); see
        # scheduler.global_sequence for the full rationale
        .localCheckpoint(eager=False)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("__pid")
        .agg(F.sum("n_tokens").alias("__t"))
        .select("__pid", F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off"))
    )
    w_run = Window.partitionBy("__pid").orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    prior = F.coalesce(F.sum("n_tokens").over(w_run), F.lit(0)) + F.col("__off")
    return (
        d.join(F.broadcast(offsets), "__pid")
        .withColumn("shard", F.floor(prior / F.lit(int(shard_tokens))).cast("long"))
        .select(id_col, "n_tokens", "shard")
    )


def per_source_cap(docs: DataFrame, n: int, source_col: str = "source",
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Domain quota sampling: keep the top-`n` docs per source by
    (quality DESC, id ASC) — the per-domain cap of corpus mixing,
    which stops one dominant domain from swamping the training mix.

    Scale shape: ONE shuffle keyed on source; rank ≤ n is a window
    group limit, which Spark pushes below the sort (per-partition
    top-n heaps, WindowGroupLimit in the plan) — no domain's full
    doc list is ever sorted in one task beyond its top-n. A skewed
    mega-domain still maps to one partition; cap-then-recap salting
    applies if a single domain outgrows an executor."""
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(F.desc("quality"), F.asc(id_col))
    return (
        docs.select(F.col(id_col), F.col(source_col), quality_score(text_col).alias("quality"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(n))
    )


_FP_MOD = (1 << 31) - 1  # Mersenne prime keeps acc*31+h < 2^63 (ANSI-safe)


def fingerprint64(text: Column | str, hash_fn=None) -> Column:
    """Rolling polynomial fingerprint over tokens:
    acc = (acc * 31 + hash(token) mod M) mod M, M = 2^31-1.
    Order-aware (unlike a bag-of-words hash); pure JVM fold; modular
    arithmetic avoids ANSI overflow while staying deterministic.
    hash defaults to xxhash64; with functions.hashing.hash60 the
    whole fold replays in DuckDB as a list_reduce."""
    from ..functions.hashing import xx64

    hash_fn = hash_fn or xx64
    toks = tokens_all(text)
    m = F.lit(_FP_MOD).cast("long")
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(31).cast("long") + F.pmod(hash_fn(t), m), m),
    )


def doc_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One pass, all stats — single projection, no shuffle."""
    return docs.select(
        F.col(id_col),
        F.size(tokens_all(text_col)).alias("n_tokens"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        lang_id(text_col).alias("lang_pred"),
        quality_score(text_col).alias("quality"),
        fingerprint64(text_col).alias("fingerprint"),
    )


# BPE-ish pre-tokenization: letter runs, digit runs, single
# non-alnum-non-space marks — the GPT-2-style split classes reduced
# to a subset whose semantics are identical in Java regex (Spark) and
# RE2 (DuckDB), so the count is cross-engine oracle-able.
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_token_count(text: Column | str) -> Column:
    """Subword-ish token count: how a BPE pre-tokenizer would split
    the text before merges — the unit that matters for LLM context
    budgeting (punctuation and digit runs count, unlike whitespace
    tokenization). Pure regexp_extract_all, no UDF."""
    t = F.lower(F.col(text) if isinstance(text, str) else text)
    return F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), F.lit(0)))


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document salient terms: the k terms ranked by
    (tf DESC, df ASC, term ASC) with their smoothed tf-idf score
    tf * ln((N+1)/(df+1)) — keyword extraction for corpus search /
    topic tagging. The RANKING key is all-integer (term frequency,
    then corpus rarity, then lexicographic), so the selected rows are
    bit-identical across engines; the float score is a reported
    value, rounded to 6.

    Scale shape: explode(tokens) → (doc,term) hash-agg with map-side
    partials; df is a second hash-agg over the distinct (doc,term)
    pairs (already deduped by the tf agg — no count_distinct blowup);
    N is a broadcast scalar; per-doc top-k is a window group limit
    (rank ≤ k pushed below the sort: per-partition heaps, never a
    full per-doc sort). Three shuffles total, each keyed and
    partial-aggregated — the plan you'd want at 100 TB.
    """
    from pyspark.sql import Window

    toks = docs.select(F.col(id_col), F.explode(tokens_all(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n"))
    w = Window.partitionBy(id_col).orderBy(F.desc("tf"), F.asc("df"), F.asc("term"))
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.col("rk").cast("long").alias("rk"),
            F.round(F.col("tf") * F.log((F.col("n") + 1) / (F.col("df") + 1)), 6).alias("tfidf"),
        )
    )


def hash_split(val_pct: int = 10, id_col: str = "doc_id") -> Column:
    """Deterministic train/val assignment: 'val' iff the first 4 hex
    chars of md5(id) fall below val_pct% of 0x10000. Fixed-width
    lowercase hex compares lexicographically == numerically, and both
    Spark and DuckDB emit the same md5 hex for the same UTF-8 string,
    so the split is portable and bit-stable.

    Why this over row_number % k or rand(seed): it is a pure
    projection (no shuffle, no window), and membership depends only
    on the id — adding or removing other documents never reassigns a
    doc between train and val (the property that keeps eval sets
    uncontaminated as the corpus grows).
    """
    threshold = f"{(int(val_pct) * 0x10000) // 100:04x}"
    h4 = F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 4)
    return F.when(h4 < F.lit(threshold), F.lit("val")).otherwise(F.lit("train"))


def corpus_mix_report(docs: DataFrame, text_col: str = "text",
                      source_col: str = "source") -> DataFrame:
    """The corpus composition rollup a data run ends with: per
    (source, predicted language) — document count, token sum, mean
    quality. One hash-agg with map-side partials over a single
    projection; group-key cardinality is #sources × #langs (tiny), so
    the shuffle is a few rows per partition at any corpus size."""
    return (
        docs.select(
            F.col(source_col).alias("source"),
            lang_id(text_col).alias("lang_pred"),
            token_count(text_col).cast("long").alias("n_tok"),
            quality_score(text_col).alias("q"),
        )
        .groupBy("source", "lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("q"), 6).alias("avg_quality"),
        )
    )


def chunk_tokens(docs: DataFrame, window: int = 32, stride: int = 16,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fixed-token-window chunking with overlap — the step that turns
    curated documents into training samples (context windows). Chunk
    k starts at token k*stride and takes up to `window` tokens; the
    tail chunk may run short. stride < window gives the standard
    overlapping windows (overlap = window - stride); stride == window
    gives disjoint packing.

    Scale shape: pure per-row expressions — one sequence() of start
    offsets, one explode, one slice — a map-only projection with no
    shuffle and no UDF, so the only cost at 100 TB is the deliberate
    output amplification (~window/stride × input tokens). Catalyst
    keeps the whole thing in one WholeStageCodegen span, and the
    parquet scan reads only (id, text).
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokens_all(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__tk") - 1, F.lit(0)), F.lit(stride)
    )
    return (
        docs.select(F.col(id_col), toks.alias("__tk"))
        .select(id_col, "__tk", F.explode(starts).alias("__start"))
        .select(
            F.col(id_col),
            F.floor(F.col("__start") / stride).cast("int").alias("chunk_id"),
            F.slice("__tk", F.col("__start") + 1, F.lit(window)).alias("__chunk"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("__chunk").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def mixture_flatten(docs: DataFrame, source_col: str = "source",
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic temperature-flattening mixture resample
    (alpha = 1/2): re-weights the corpus toward p_s ∝ sqrt(n_s) by
    downsampling over-represented sources — keep rate
    r_s = sqrt(n_min / n_s), so the smallest source is kept whole and
    a source 100× larger keeps 10% of its rows.

    The keep decision is EXACT integer arithmetic on a portable
    30-bit hash uniform:  u² · n_s < n_min · 2^60  ⟺
    u / 2^30 < sqrt(n_min / n_s)  with u = hash60(id) >> 30 — no
    float pow(), so ANY engine (the DuckDB oracle included) derives
    the identical kept set, and membership depends only on the doc id
    and the source counts. decimal(38,0) keeps the product exact
    (u² ≤ 2^60, × n_s stays inside 38 digits up to 10^19-row
    sources).

    Scale shape: one tiny per-source count aggregate (map-side
    partials, #sources rows) broadcast back, then a map-only filter —
    no data shuffle at any corpus size.
    """
    from ..functions.hashing import hash60

    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n_s"))
    n_min = counts.agg(F.min("__n_s").alias("__n_min"))
    u = F.shiftrightunsigned(hash60(F.col(id_col)), 30).cast("decimal(38,0)")
    lhs = u * u * F.col("__n_s").cast("decimal(38,0)")
    rhs = F.col("__n_min").cast("decimal(38,0)") * F.lit(1 << 60).cast("decimal(38,0)")
    return (
        docs.join(F.broadcast(counts), source_col)
        .crossJoin(F.broadcast(n_min))
        .filter(lhs < rhs)
        .select(*docs.columns)  # restore input column order (join fronts the key)
    )


def seeded_shuffle(docs: DataFrame, seed: int = 0, id_col: str = "doc_id") -> DataFrame:
    """Deterministic global training-order shuffle: rank every doc
    by (hash60(id, seed), id) — a seeded pseudorandom permutation
    whose order depends only on ids and the seed, so re-runs (and
    any other engine) derive the identical epoch order, and changing
    the seed gives an independent permutation for the next epoch.

    Returns (id, epoch_rank) with rank contiguous from 0.

    Scale shape: the ranking reuses the crawl's `global_sequence`
    two-pass distributed prefix sum (operators/scheduler.py) — range
    partition on the hash key, per-partition row_number in parallel,
    broadcast exclusive prefix of partition counts; NO global
    single-partition window and no driver-side collect, rank emitted
    as long (a 100 TB corpus outgrows int). This is the shuffle step
    a training-data pipeline runs after curation to break
    source/time locality before sharding."""
    from ..functions.hashing import hash60
    from .scheduler import global_sequence

    d = docs.select(F.col(id_col), hash60(F.col(id_col), seed).alias("__hk"))
    return (
        global_sequence(d, start=0, order_cols=["__hk", id_col], out_type="long")
        .select(id_col, F.col("seq").alias("epoch_rank"))
    )


def lm_bits_score(docs: DataFrame, n: int = 2, text_col: str = "text",
                  id_col: str = "doc_id", hash_fn=None) -> DataFrame:
    """Count-based n-gram LM quality score — the CCNet/KenLM
    perplexity-filter step re-expressed as exact integer work: the
    corpus itself is the language model, and a document's score is
    the mean bit-length of its n-grams' corpus frequencies
    (bit_length(c) = floor(log2 c)+1, an integer log). Fluent text
    built from common constructions scores high; gibberish and
    boilerplate-free noise score low — the same ranking signal as
    negative perplexity under a count LM, with NO floating-point
    log anywhere until the single final divide, so any engine
    derives the identical score (the log2 magnitude is the length
    of the binary literal, string-exact in Spark's bin() and
    DuckDB's bin()).

    Returns (id, n_grams, sum_bits, lm_bits = sum_bits/n_grams).

    Scale shape: explode n-grams (multiplicity kept — frequency
    weighting is the point) → hash-agg corpus counts with map-side
    partials → ONE equi-join back on the 64-bit gram hash → per-doc
    sum/count agg. Gram strings never cross a shuffle (hashes do);
    the counts side is a (hash, count) long pair — at 100 TB this
    is two shuffles over longs plus the join, the same plan family
    as decontaminate. A real deployment scores against a FROZEN
    reference-corpus count table instead of self-counts — same
    plan, the counts side just comes from a stored table.
    """
    from ..functions.hashing import xx64

    hash_fn = hash_fn or xx64
    g = docs.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("__gram")
    ).select(id_col, hash_fn("__gram").alias("__gh"))
    counts = g.groupBy("__gh").agg(F.count("*").alias("__c"))
    return (
        g.join(counts, "__gh")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.length(F.bin("__c"))).cast("long").alias("sum_bits"),
        )
        .select(
            id_col,
            "n_grams",
            "sum_bits",
            F.round(F.col("sum_bits") / F.col("n_grams"), 6).alias("lm_bits"),
        )
    )


def hashed_linear_score(text: Column | str, seed: int = 7) -> Column:
    """fastText-style hashed linear quality scorer with portable
    pseudo-weights: every token hashes to an integer weight in
    [-1000, 1000] (hash60(token, seed) mod 2001 − 1000) and the doc
    score is the weight sum over tokens WITH multiplicity. All
    integer arithmetic on the portable hash family, so any engine
    derives the identical score — the classifier-gate plumbing is
    testable end-to-end without shipping a model.

    A real deployment swaps the hash-derived weight for a learned
    vocabulary table broadcast-joined (or map-looked-up) on the same
    token hash; the plan shape — flat per-token map + per-doc fold,
    no shuffle, no UDF — is exactly this one.
    """
    from ..functions.hashing import hash60

    w = F.transform(
        tokens_all(text),
        lambda t: F.pmod(hash60(t, seed), F.lit(2001)) - 1000,
    )
    return F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + x)


def strip_common_lines(
    docs: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """Corpus-frequency line dedup (the CCNet/C4 boilerplate pass):
    remove every line that occurs >= min_count times ACROSS the
    corpus (nav bars, cookie banners, footers), keeping remaining
    lines in their original order. Complements
    dedup.strip_duplicate_spans (token-window granularity): spans
    catch repeated PASSAGES inside otherwise-unique prose; this
    catches short template lines whose window never reaches k
    tokens.

    Scale shape: explode → ONE corpus-wide hash agg on 64-bit line
    hashes (line text itself never crosses that shuffle) → one
    anti-join back → per-doc reassembly via array_sort(collect_list)
    keyed by line position (no window). Docs whose every line is
    boilerplate survive with text='' — the output is total over the
    input ids.

    Returns (id, text, n_kept, n_removed).
    """
    from ..functions.hashing import xx64

    h = hash_fn or xx64
    lines = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    hashed = lines.select("__id", "pos", "line", h(F.col("line")).alias("lh"))
    common = (
        hashed.groupBy("lh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("lh")
    )
    kept = hashed.join(common, "lh", "left_anti")
    kept_agg = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("__text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = lines.groupBy("__id").agg(F.count(F.lit(1)).alias("__total"))
    return (
        totals.join(kept_agg, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("__text", F.lit("")).alias(text_col),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("__total") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )


# Gopher rule set (Rae et al. 2021, §A1.1 "quality filtering") — the
# standard pretraining-corpus document gates. Every rule below is an
# INTEGER comparison (cross-multiplied thresholds, no float ratios),
# so the per-doc verdicts are bit-identical in any engine — the same
# portability discipline as the crawl's priority arithmetic.
GOPHER_REQUIRED_STOPWORDS = ["and", "be", "have", "of", "that", "the", "to", "with"]


def gopher_rules(text: Column | str, min_words: int = 50,
                 max_words: int = 100_000) -> Column:
    """Per-document Gopher quality rules as a struct of booleans.

    Fields (true = the doc PASSES that rule):
      word_count      min_words <= #tokens <= max_words
      mean_word_len   3 <= mean token length <= 10   (3n <= L <= 10n)
      symbol_ratio    (#'#' + #'...') / #tokens <= 0.1  (10s <= n)
      bullet_lines    <= 90% of lines start with a bullet (10b <= 9m)
      ellipsis_lines  <= 30% of lines end with '...'      (10e <= 3m)
      alpha_words     >= 80% of tokens contain a letter   (5a >= 4n)
      stopwords       >= 2 distinct required stopwords present
      keep            AND of all seven

    Pure per-row projection — no shuffle, no UDF. '...' occurrences
    are counted as non-overlapping leftmost matches (replace-and-
    measure), identical semantics in Spark and ANSI SQL.
    """
    t = F.col(text) if isinstance(text, str) else text
    toks = tokens_all(t)
    n = F.size(toks).cast("long")
    sum_len = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    n_hash = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).cast("long")
    n_ell = F.floor((F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3)
    lines = F.split(t, "\n")
    m = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.ltrim(ln).startswith("- ")
            | F.ltrim(ln).startswith("* ")
            | F.ltrim(ln).startswith("•"),
        )
    ).cast("long")
    n_ell_line = F.size(F.filter(lines, lambda ln: F.rtrim(ln).endswith("..."))).cast("long")
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).cast("long")
    sw = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS])
    n_sw = F.size(F.array_intersect(F.array_distinct(toks), sw))
    r_words = (n >= min_words) & (n <= max_words)
    r_wlen = (F.lit(3) * n <= sum_len) & (sum_len <= F.lit(10) * n)
    r_sym = F.lit(10) * (n_hash + n_ell) <= n
    r_bullet = F.lit(10) * n_bullet <= F.lit(9) * m
    r_ell = F.lit(10) * n_ell_line <= F.lit(3) * m
    r_alpha = F.lit(5) * n_alpha >= F.lit(4) * n
    r_sw = n_sw >= 2
    return F.struct(
        r_words.alias("word_count"),
        r_wlen.alias("mean_word_len"),
        r_sym.alias("symbol_ratio"),
        r_bullet.alias("bullet_lines"),
        r_ell.alias("ellipsis_lines"),
        r_alpha.alias("alpha_words"),
        r_sw.alias("stopwords"),
        (r_words & r_wlen & r_sym & r_bullet & r_ell & r_alpha & r_sw).alias("keep"),
    )


def leakage_free_split(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", val_pct: int = 10,
                       clusters: DataFrame | None = None) -> DataFrame:
    """Train/val split that cannot leak duplicates across the
    boundary: the split key is the document's CONTENT (normalized
    text hash), not its id, so every copy of a text — whatever its
    id — lands on the same side. An id-keyed :func:`hash_split`
    scatters a duplicated document across train AND val, silently
    inflating eval scores; content keying fixes the exact/trivially-
    reformatted tier as a PURE PROJECTION (no join, no shuffle —
    identical normalized texts hash identically by construction).

    Normalization: lowercase + whitespace collapse + trim — the
    same-bytes-after-cleanup tier. For NEAR-dup leakage pass
    `clusters` (id_col, cluster_rep) from
    ``dedup.connected_components`` over MinHash/SimHash pair edges:
    the split then keys on each doc's cluster representative (one
    broadcast-or-shuffle equi-join), putting whole near-dup clusters
    on one side; unclustered docs fall back to the content key.

    Returns (id_col, split) with the same fixed-width-hex threshold
    rule as :func:`hash_split` — portable and bit-stable.
    """
    threshold = f"{(int(val_pct) * 0x10000) // 100:04x}"
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    key = F.md5(norm.cast("binary"))
    if clusters is not None:
        docs = docs.join(
            clusters.select(F.col(id_col), F.col("cluster_rep")), id_col, "left"
        )
        key = F.coalesce(
            F.md5(F.col("cluster_rep").cast("string").cast("binary")), key
        )
    h4 = F.substring(key, 1, 4)
    split = F.when(h4 < F.lit(threshold), F.lit("val")).otherwise(F.lit("train"))
    return docs.select(F.col(id_col), split.alias("split"))


def classifier_calibration(df: DataFrame, score_col: str = "score",
                           label_col: str = "label", n_bins: int = 100) -> DataFrame:
    """Precision/recall/F1 at EVERY threshold in one pass — the
    calibration sweep that turns a quality/toxicity classifier score
    into a defensible gate threshold.

    Scale shape: scores are binned FIRST (one hash agg with map-side
    partials → ≤ `n_bins` rows), then the whole sweep is a window
    over the tiny histogram — never a per-threshold rescan of the
    corpus and never a corpus-sized shuffle. At threshold t =
    bin/n_bins the predicted-positive set is exactly the bins ≥ bin
    (scores are floor-binned, so every score in bin b is ≥ b/n_bins),
    making tp/fp exact cumulative integers; only the final
    precision/recall/f1 divisions are floats (rounded, portable).

    Returns one row per NON-EMPTY bin: (threshold, tp, fp, fn,
    precision, recall, f1). `label_col` must be 0/1; `score_col` in
    [0, 1] (scores == 1.0 clamp into the top bin).
    """
    from pyspark.sql import Window

    b = df.select(
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("long"), F.lit(n_bins - 1)
        ).alias("bin"),
        F.col(label_col).cast("long").alias("lab"),
    )
    hist = b.groupBy("bin").agg(
        F.sum("lab").alias("pos"), F.sum(F.lit(1) - F.col("lab")).alias("neg")
    )
    w = Window.orderBy(F.desc("bin")).rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        hist.select(
            "bin",
            F.sum("pos").over(w).alias("tp"),
            F.sum("neg").over(w).alias("fp"),
            (F.sum("pos").over(tot) - F.sum("pos").over(w)).alias("fn"),
        )
        .select(
            (F.col("bin") / n_bins).alias("threshold"),
            "tp", "fp", "fn",
            F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6).alias("precision"),
            F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6).alias("recall"),
            F.round(
                2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6
            ).alias("f1"),
        )
    )


def cdc_chunks(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               div: int = 16, hash_fn=None) -> DataFrame:
    """Content-defined chunking: boundaries where a local 2-gram hash
    ≡ 0 (mod `div`), so an edit moves only the chunks it touches —
    the property fixed-stride windows (``chunk_tokens``) lack, where
    one inserted token shifts EVERY downstream chunk and defeats
    chunk-level dedup. Expected chunk length ≈ `div` tokens.

    The boundary decision at position i depends only on tokens
    (i-1, i) — maximal locality, the token-level analog of
    Rabin-fingerprint CDC in storage dedup (LBFS, Muthitacharoen
    2001).

    Shape: tokens are EXPLODED to rows so the boundary hash runs as
    a row-level whole-stage-codegen expression — a previous version
    hashed inside array higher-order lambdas (interpreted per
    element: ~15× slower wall-clock on the same corpus). Chunk ids
    are the running sum of boundary flags (lag + cumulative window),
    and chunks reassemble with one doc-keyed aggregation; the window
    and the (id, chunk) groupBy share the single doc-keyed exchange
    (partitioning by a subset of the grouping keys satisfies the
    aggregation's clustering).

    Returns (id, chunk_idx, n_tokens, chunk). `hash_fn(col)->Column`
    defaults to the xxhash64 lane; pass ``functions.hashing.hash60``
    for the cross-engine-replayable family (the driver entry does).
    """
    from pyspark.sql import Window

    from ..functions.hashing import xx64

    h = hash_fn or xx64
    toks = tokens_all(text_col)
    t = docs.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("tok").over(w)
    flag = F.when(
        prev.isNotNull()
        & (h(F.concat(prev, F.lit(" "), F.col("tok"))) % div == 0),
        1,
    ).otherwise(0)
    t = t.withColumn("chunk_idx", F.sum(flag).over(w).cast("long"))
    return (
        t.groupBy(F.col(id_col), "chunk_idx")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk"),
        )
        .select(id_col, "chunk_idx", "n_tokens", "chunk")
    )


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """One-pass ANALYZE-style column profile: per column —
    (column, n total rows, n_null, n_distinct non-null, min_str,
    max_str). The data-quality gate a pipeline runs before training
    on (or publishing) a table: null-rate spikes and cardinality
    collapses are the two cheapest corruption tells.

    ONE aggregation job over the table. With `exact_distinct` the
    plan uses Spark's multi-distinct Expand (rows replicated
    ~#columns× pre-shuffle — exact, and what the DuckDB oracle can
    replay); at 100 TB flip it off for approx_count_distinct (HLL,
    no Expand, one ordinary partial agg) and accept ±2%.
    min/max are emitted as strings so heterogeneous column types fit
    one long-format result (floats render engine-specifically —
    compare them numerically, not through this projection).
    """
    cols = columns or df.columns
    cd = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            cd(F.col(c)).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.select(
        "__n",
        F.expr(
            f"stack({len(cols)}, {parts}) AS (column, n_null, n_distinct, min_str, max_str)"
        ),
    ).select(
        "column", F.col("__n").cast("long").alias("n"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_str", "max_str",
    )


def corpus_drift(docs: DataFrame, baseline: str, group_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """Per-group token-distribution drift vs a baseline group, as the
    EXACT integer L1 (total-variation×2) distance — the corpus-mix
    monitor that catches a source whose content shifted between
    crawls (template change, language flip, spam flood) before it
    poisons a training mix.

    Math that keeps it engine-exact: with per-term counts c_a/c_b and
    totals N_a/N_b, L1 = Σ_t |c_a(t)/N_a − c_b(t)/N_b| scaled by
    N_a·N_b is Σ_t |c_a·N_b − c_b·N_a| — all integers. Terms
    missing from one side contribute their full mass, and those sums
    fold into totals algebra, so ONLY the shared-term join is
    needed:

      l1 = Σ_shared |c_a·N_b − c_b·N_a|
           + (N_a − Σ_shared c_a)·N_b + (N_b − Σ_shared c_b)·N_a

    One token-count aggregation, one term-keyed inner join against
    the (broadcast) baseline counts, one per-group collapse. The
    final drift = l1 / (N_a·N_b) ∈ [0, 2] is the only division
    (rounded, portable). Overflow: c·N must stay < 2^63 — fine to
    ~10^9 tokens per group; shard or subsample beyond.

    Returns (group, n_shared_terms, l1_num, n_tokens, drift); the
    baseline group itself reports drift 0.
    """
    counts = (
        docs.select(F.col(group_col).alias("grp"),
                    F.explode(tokens_all(text_col)).alias("term"))
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.groupBy("grp").agg(F.sum("c").cast("long").alias("n"))
    b_counts = F.broadcast(
        counts.filter(F.col("grp") == baseline)
        .select("term", F.col("c").alias("cb"))
    )
    b_total = F.broadcast(
        totals.filter(F.col("grp") == baseline).select(F.col("n").alias("nb"))
    )
    # the |c_a*N_b - c_b*N_a| sum needs N_a/N_b inside the agg: attach
    # totals (group-keyed join + 1-row broadcast), collapse per group,
    # then LEFT-join back onto `totals` — a group sharing ZERO terms
    # with the baseline must still report (drift = 2, the maximum),
    # which an inner-join-only shape silently drops
    shared = (
        counts.join(b_counts, "term")
        .join(totals, "grp")
        .crossJoin(b_total)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
            F.sum(F.abs(F.col("c") * F.col("nb") - F.col("cb") * F.col("n")))
            .cast("long").alias("__l1s"),
            F.sum("c").cast("long").alias("__sca"),
            F.sum("cb").cast("long").alias("__scb"),
        )
    )
    per = (
        totals.crossJoin(b_total)
        .join(shared, "grp", "left")
        .select(
            "grp", "n", "nb",
            F.coalesce("n_shared_terms", F.lit(0).cast("long")).alias("n_shared_terms"),
            F.coalesce("__l1s", F.lit(0).cast("long")).alias("__l1s"),
            F.coalesce("__sca", F.lit(0).cast("long")).alias("__sca"),
            F.coalesce("__scb", F.lit(0).cast("long")).alias("__scb"),
        )
    )
    l1 = (
        F.col("__l1s")
        + (F.col("n") - F.col("__sca")) * F.col("nb")
        + (F.col("nb") - F.col("__scb")) * F.col("n")
    ).cast("long")
    return per.select(
        F.col("grp").alias(group_col),
        "n_shared_terms",
        l1.alias("l1_num"),
        F.col("n").alias("n_tokens"),
        F.round(l1 / (F.col("n") * F.col("nb")), 6).alias("drift"),
    )


def dsir_importance(raw_docs: DataFrame, target_docs: DataFrame, n: int = 2,
                    n_buckets: int = 1 << 14, seed: int = 11,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hashed n-gram importance weights for data selection (DSIR,
    Xie et al. NeurIPS'23): score each raw document by how much more
    likely its n-grams are under a small TARGET distribution (the
    domain you want more of — a benchmark slice, curated wiki) than
    under the raw-corpus distribution, with n-grams hashed into
    `n_buckets` so both count tables are bounded dims regardless of
    corpus size.

    Integer-exact variant of the log-likelihood ratio: with
    add-one-smoothed bucket counts, log2 p ≈ bits(c+1) − bits(total
    + B) where bits(x) = length(bin(x)) (the lm_bits_score trick —
    never a float log), so

        dsir_bits = Σ_g [bits(c_t+1) − bits(c_r+1)]
                    + n_grams · [bits(R_tot + B) − bits(T_tot + B)]

    is int64 end-to-end and replays bit-identically in any engine.
    Resample by ranking on dsir_bits (ties → id).

    Scale shape: one gram explode per side, two ≤ n_buckets-row
    count dims broadcast back onto the raw grams, one per-doc agg.
    The target side is small by construction; the raw side's counts
    are B-bounded — at 100 TB this is the decontaminate plan family
    with dims that can never outgrow the broadcast threshold.
    """
    from ..functions.hashing import hash60

    def grams(df, keep_id):
        cols = [F.col(id_col)] if keep_id else []
        return df.select(
            *cols, F.explode(word_ngrams(text_col, n)).alias("__gram")
        ).select(
            *([F.col(id_col)] if keep_id else []),
            F.pmod(hash60(F.col("__gram"), seed), F.lit(n_buckets)).alias("__b"),
        )

    rg = grams(raw_docs, True)
    tg = grams(target_docs, False)
    r_counts = rg.groupBy("__b").agg(F.count("*").alias("__cr"))
    t_counts = tg.groupBy("__b").agg(F.count("*").alias("__ct"))
    r_tot = r_counts.agg(F.sum("__cr").alias("__rt"))
    t_tot = t_counts.agg(F.sum("__ct").alias("__tt"))
    bits = lambda c: F.length(F.bin(c)).cast("long")  # noqa: E731
    scored = (
        rg.join(F.broadcast(t_counts), "__b", "left")
        .join(F.broadcast(r_counts), "__b", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(bits(F.coalesce(F.col("__ct"), F.lit(0)) + 1)).cast("long").alias("sum_t_bits"),
            F.sum(bits(F.coalesce(F.col("__cr"), F.lit(0)) + 1)).cast("long").alias("sum_r_bits"),
        )
    )
    norm = bits(F.col("__rt") + n_buckets) - bits(F.col("__tt") + n_buckets)
    return (
        scored.crossJoin(F.broadcast(r_tot))
        .crossJoin(F.broadcast(t_tot))
        .select(
            id_col, "n_grams", "sum_t_bits", "sum_r_bits",
            (
                F.col("sum_t_bits") - F.col("sum_r_bits") + F.col("n_grams") * norm
            ).alias("dsir_bits"),
        )
    )


def dsir_importance_sql(raw: str, target: str, n: int = 2,
                        n_buckets: int = 1 << 14, seed: int = 11) -> str:
    """DuckDB replay of :func:`dsir_importance` over relations
    ``raw(doc_id, text)`` and ``target(doc_id, text)`` — same hash60
    buckets, same bits arithmetic. Requires a `grams` replay of
    word_ngrams: callers inline word_ngrams_sql-compatible CTEs
    ``dsir_rg(doc_id, b)`` and ``dsir_tg(b)`` instead (gram
    extraction differs per planted input), so this fragment starts
    at the count tables."""
    return f"""
        dsir_rc AS (
          SELECT b, COUNT(*) AS cr FROM dsir_rg GROUP BY b
        ), dsir_tc AS (
          SELECT b, COUNT(*) AS ct FROM dsir_tg GROUP BY b
        ), dsir_tot AS (
          SELECT (SELECT SUM(cr) FROM dsir_rc) AS rt,
                 (SELECT coalesce(SUM(ct), 0) FROM dsir_tc) AS tt
        ), dsir_doc AS (
          SELECT g.doc_id, COUNT(*) AS n_grams,
                 CAST(SUM(length(bin(coalesce(t.ct, 0) + 1))) AS BIGINT) AS sum_t_bits,
                 CAST(SUM(length(bin(coalesce(r.cr, 0) + 1))) AS BIGINT) AS sum_r_bits
          FROM dsir_rg g
          LEFT JOIN dsir_tc t ON g.b = t.b
          LEFT JOIN dsir_rc r ON g.b = r.b
          GROUP BY g.doc_id
        )
        SELECT doc_id, n_grams, sum_t_bits, sum_r_bits,
               sum_t_bits - sum_r_bits + n_grams *
                 (CAST(length(bin(rt + {n_buckets})) AS BIGINT)
                  - CAST(length(bin(tt + {n_buckets})) AS BIGINT)) AS dsir_bits
        FROM dsir_doc CROSS JOIN dsir_tot
    """


def mixture_interleave(docs: DataFrame, weights: dict[str, int],
                       source_col: str = "source", id_col: str = "doc_id",
                       seed: int = 17, quantum: int = 1 << 20,
                       default_weight: int = 1) -> DataFrame:
    """Deterministic weighted-fair training-order interleave (WFQ /
    smooth weighted round-robin): every PREFIX of the emitted order
    contains each source in proportion to its weight (within one
    quantum), which is what mixture training actually needs — a
    weight-2 source appearing twice as often *throughout* the epoch,
    not merely twice as often in total (a plain shuffle gives the
    total; early/late drift is unbounded).

    Construction: within each source, docs take the seeded-shuffle
    order k = rank by (hash60(id, seed), id); item k gets the
    virtual finish time ``f = (k+1) * quantum DIV w_s`` and the
    global order is rank by (f, source, k) — the classic
    virtual-time fair-queueing schedule, all-int64 (k < 2^43 at
    quantum 2^20 before overflow, i.e. trillions of docs/source).
    Sources absent from `weights` get `default_weight`. Re-runs and
    other engines derive the identical epoch order; a new seed
    reshuffles within sources while preserving the mixture ratio.

    Scale shape: per-source rank is a source-partitioned window
    (one hash exchange; a pathologically hot source can reuse
    global_sequence per source instead), the final rank reuses the
    crawl's two-pass distributed prefix sum — no single-partition
    window, rank emitted as long.

    Returns (id, source, k, vfinish, train_rank)."""
    from ..functions.hashing import hash60
    from .scheduler import global_sequence

    pairs = [p for kv in sorted(weights.items()) for p in (F.lit(kv[0]), F.lit(kv[1]))]
    wmap = F.create_map(*pairs) if pairs else F.create_map()
    w = F.coalesce(
        F.try_element_at(wmap, F.col(source_col)), F.lit(default_weight)
    ).cast("long")
    wk = Window.partitionBy(source_col).orderBy(
        hash60(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    d = docs.select(
        F.col(id_col), F.col(source_col),
        (F.row_number().over(wk) - 1).cast("long").alias("k"),
        w.alias("__w"),
    ).select(
        id_col, source_col, "k",
        F.expr(f"CAST((k + 1) * {quantum} DIV __w AS BIGINT)").alias("vfinish"),
    )
    return (
        global_sequence(d, start=0, order_cols=["vfinish", source_col, "k"], out_type="long")
        .select(id_col, source_col, "k", "vfinish", F.col("seq").alias("train_rank"))
    )


def mixture_interleave_sql(src: str, weights: dict[str, int], seed: int = 17,
                           quantum: int = 1 << 20, default_weight: int = 1,
                           source_col: str = "source",
                           id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`mixture_interleave` over
    ``src(doc_id, source)`` — same hash60 within-source order, same
    virtual-finish arithmetic, same (f, source, k) total order."""
    from ..functions.hashing import hash60_sql

    cases = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in sorted(weights.items())
    )
    wexpr = f"CASE {source_col} {cases} ELSE {default_weight} END" if weights else str(default_weight)
    return f"""
        WITH mi_k AS (
          SELECT {id_col}, {source_col},
                 CAST(ROW_NUMBER() OVER (PARTITION BY {source_col}
                   ORDER BY {hash60_sql(id_col, seed)} ASC, {id_col} ASC) - 1 AS BIGINT) AS k,
                 CAST({wexpr} AS BIGINT) AS w
          FROM {src}
        ), mi_f AS (
          SELECT {id_col}, {source_col}, k,
                 CAST((k + 1) * {quantum} // w AS BIGINT) AS vfinish
          FROM mi_k
        )
        SELECT {id_col}, {source_col}, k, vfinish,
               CAST(ROW_NUMBER() OVER (ORDER BY vfinish ASC, {source_col} ASC, k ASC) - 1
                    AS BIGINT) AS train_rank
        FROM mi_f
    """


# ---- Unicode script profile --------------------------------------------------

#: (label, script name) — Java spells it \p{IsX}, RE2 \p{X}; both
#: match the same Unicode Script property, verified count-identical.
#: Order = dominance tie-break order.
SCRIPT_TABLE: list[tuple[str, str]] = [
    ("latin", "Latin"),
    ("cyrillic", "Cyrillic"),
    ("han", "Han"),
    ("arabic", "Arabic"),
    ("greek", "Greek"),
    ("hangul", "Hangul"),
    ("devanagari", "Devanagari"),
]


def script_profile(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-doc Unicode-script mix: codepoint counts per script
    (n_latin, n_cyrillic, …), n_other (digits/punct/space are script
    Common — always 'other'), n_chars, and the dominant script
    (most codepoints; ties break in SCRIPT_TABLE order; 'other' only
    when no listed script appears, 'none' for empty text).

    The multilingual-curation signal lang-ID alone misses: mixed-
    script spam (Cyrillic confusables inside Latin text), wrong-
    script content for a claimed language, and script-based corpus
    routing all key on the MIX, not the single label.  Counting is
    length(text) − length(regexp_replace(text, '\\p{IsX}', '')) —
    pure projection, codepoint-exact in both engines, no UDF."""
    t = F.col(text_col)
    n_chars = F.length(t)
    counts = {
        f"n_{label}": n_chars - F.length(
            F.regexp_replace(t, rf"\p{{Is{script}}}", "")
        )
        for label, script in SCRIPT_TABLE
    }
    d = docs.select(F.col(id_col), n_chars.alias("n_chars"),
                    *[c.alias(k) for k, c in counts.items()])
    listed = [F.col(f"n_{label}") for label, _ in SCRIPT_TABLE]
    other = F.col("n_chars") - sum(listed[1:], listed[0])
    m = F.greatest(*listed)
    dom = F.lit("other")
    for label, _ in reversed(SCRIPT_TABLE):
        dom = F.when(F.col(f"n_{label}") == m, label).otherwise(dom)
    dom = F.when(m == 0, F.when(F.col("n_chars") == 0, "none").otherwise("other")).otherwise(dom)
    return d.withColumns({"n_other": other.cast("long"), "dominant": dom})


def script_profile_sql(src: str, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`script_profile` — RE2 ``\\p{X}``
    spellings with the explicit 'g' flag (Spark replaces all by
    default), same counts, same tie-break CASE."""
    t = text_col
    cnt = {
        label: (f"length({t}) - length(regexp_replace({t}, "
                f"'\\p{{{script}}}', '', 'g'))")
        for label, script in SCRIPT_TABLE
    }
    sel = ", ".join(f"CAST({e} AS BIGINT) AS n_{label}" for label, e in cnt.items())
    listed = " + ".join(f"n_{label}" for label, _ in SCRIPT_TABLE)
    m = "GREATEST(" + ", ".join(f"n_{label}" for label, _ in SCRIPT_TABLE) + ")"
    dom_whens = " ".join(
        f"WHEN n_{label} = {m} THEN '{label}'" for label, _ in SCRIPT_TABLE
    )
    return f"""
        WITH sp AS (
          SELECT {id_col}, CAST(length({t}) AS BIGINT) AS n_chars, {sel}
          FROM {src}
        )
        SELECT *, CAST(n_chars - ({listed}) AS BIGINT) AS n_other,
               CASE WHEN {m} = 0 THEN
                 CASE WHEN n_chars = 0 THEN 'none' ELSE 'other' END
               {dom_whens} ELSE 'other' END AS dominant
        FROM sp
    """


def pmi_collocations(docs: DataFrame, k: int = 20, min_count: int = 5,
                     text_col: str = "text") -> DataFrame:
    """Corpus-level collocation mining: top-k adjacent-word bigrams by
    PMI lift — how much more often the pair co-occurs than its parts
    predict. The classic phrase detector (Church & Hanks 1990;
    word2vec's phrase pass): "new york" scores high because p(new,
    york) >> p(new)·p(york); "of the" scores ~1 despite a huge raw
    count. `min_count` suppresses the PMI pathology (a hapax pair of
    two hapax words has infinite lift).

    Output (bigram, n_pair, lift) where
      lift = (c_xy / N2) / ((c_x / N1) · (c_y / N1)),
    N1 = total tokens, N2 = total bigrams, rounded to 4 — identical
    double-op order in :func:`pmi_collocations_sql` so the values
    hash-match cross-engine.

    Plan shape: one explode + two hash aggs (map-side partials), the
    unigram side joined back TWICE (x then y) as broadcast-able
    aggregates of the vocabulary (vocab << corpus at scale — Heaps'
    law), totals are single-row aggregates crossed in; top-k compiles
    to TakeOrderedAndProject (local top-k per partition, no global
    sort). Nothing here is quadratic in the corpus.
    """
    toks = tokens_all(text_col)
    tk = docs.select(toks.alias("t")).filter(F.size("t") >= 1)
    uni = tk.select(F.explode("t").alias("w"))
    uc = uni.groupBy("w").agg(F.count("*").alias("c"))
    n1 = uni.agg(F.count("*").alias("n1"))
    m = F.size("t") - 1
    bg = (
        tk.filter(F.size("t") >= 2)
        .select(F.explode(
            F.zip_with(F.slice("t", 1, m), F.slice("t", 2, m),
                       lambda x, y: F.struct(x.alias("x"), y.alias("y")))
        ).alias("b"))
        .select("b.x", "b.y")
    )
    bc = bg.groupBy("x", "y").agg(F.count("*").alias("cb"))
    n2 = bg.agg(F.count("*").alias("n2"))
    lift = F.round(
        (F.col("cb") * 1.0 / F.col("n2"))
        / ((F.col("cx") * 1.0 / F.col("n1")) * (F.col("cy") * 1.0 / F.col("n1"))),
        4,
    )
    return (
        bc.filter(F.col("cb") >= min_count)
        .join(F.broadcast(uc.select(F.col("w").alias("x"), F.col("c").alias("cx"))), "x")
        .join(F.broadcast(uc.select(F.col("w").alias("y"), F.col("c").alias("cy"))), "y")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            F.concat_ws(" ", "x", "y").alias("bigram"),
            F.col("cb").alias("n_pair"),
            lift.alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("bigram"))
        .limit(k)
    )


def pmi_collocations_sql(src: str, k: int = 20, min_count: int = 5,
                         text_col: str = "text") -> str:
    """DuckDB replay of :func:`pmi_collocations` — same tokenizer,
    same double-op order, same (lift DESC, bigram) cut."""
    return f"""
        WITH pm_tk AS (
          SELECT regexp_extract_all(lower({text_col}), '[0-9a-z_]+') AS t
          FROM {src}
        ), pm_uni AS (
          SELECT unnest(t) AS w FROM pm_tk
        ), pm_uc AS (
          SELECT w, COUNT(*) AS c FROM pm_uni GROUP BY w
        ), pm_n1 AS (
          SELECT COUNT(*) AS n1 FROM pm_uni
        ), pm_bg AS (
          SELECT t[g] AS x, t[g+1] AS y
          FROM pm_tk, UNNEST(generate_series(1, len(t)-1)) AS u(g)
          WHERE len(t) >= 2
        ), pm_bc AS (
          SELECT x, y, COUNT(*) AS cb FROM pm_bg GROUP BY x, y
        ), pm_n2 AS (
          SELECT COUNT(*) AS n2 FROM pm_bg
        )
        SELECT x || ' ' || y AS bigram, cb AS n_pair,
               ROUND((cb * 1.0 / n2)
                     / ((ux.c * 1.0 / n1) * (uy.c * 1.0 / n1)), 4) AS lift
        FROM pm_bc
        JOIN pm_uc ux ON ux.w = x
        JOIN pm_uc uy ON uy.w = y
        CROSS JOIN pm_n1 CROSS JOIN pm_n2
        WHERE cb >= {min_count}
        ORDER BY lift DESC, bigram ASC
        LIMIT {k}
    """


def stratified_sample(docs: DataFrame, k: int, stratum_col: str = "lang",
                      id_col: str = "doc_id", seed: int = 0,
                      n_salts: int = 16) -> DataFrame:
    """Exact k-per-stratum deterministic sample — the eval-set /
    human-review draw: "give me 1,000 docs per language", reproducible
    across runs AND engines because the pseudo-random order is the
    portable hash60(id, seed) family, not rand().

    A naive `sample(fraction)` gives binomial counts (±√n) and
    nothing for rare strata; a single `Window.partitionBy(stratum)`
    sorts the BIGGEST stratum in one task. This uses the same salted
    two-level top-k as the politeness pop: per-(stratum, salt) local
    top-k (bounded sorts, parallel), then a re-rank of the ≤
    n_salts·k survivors — exact (a global top-k row ranks ≤ k within
    its own salt), and the second window's input is O(k), not O(n).

    Output: the sampled rows with their 1-based `rk` within the
    stratum (rk ≤ k). Strata smaller than k are returned whole.
    """
    from ..functions.hashing import hash60

    key = hash60(F.col(id_col).cast("string"), seed)
    order = [F.asc("__skey"), F.asc(id_col)]
    salted = docs.withColumn("__skey", key).withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_salts))
    )
    w1 = Window.partitionBy(stratum_col, "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
    )
    w2 = Window.partitionBy(stratum_col).orderBy(*order)
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .drop("__skey", "__salt", "__rn1")
    )


def stratified_sample_sql(src: str, k: int, stratum_col: str = "lang",
                          id_col: str = "doc_id", seed: int = 0) -> str:
    """DuckDB replay of :func:`stratified_sample` — single window
    over the portable hash order (the salted two-level form is plan
    shape; equivalence is the politeness-pop contract)."""
    from ..functions.hashing import hash60_sql

    h = hash60_sql(id_col, seed)
    return f"""
        WITH ss AS (
          SELECT *, row_number() OVER (
                   PARTITION BY {stratum_col}
                   ORDER BY {h} ASC, {id_col} ASC) AS rk
          FROM {src}
        )
        SELECT * FROM ss WHERE rk <= {k}
    """


# code-keyword vocabulary shared with the SQL replay — keep sorted
CODE_KEYWORDS = sorted(
    "def return import function var let const class void int float "
    "public static print printf println null nullptr true false if "
    "else for while elif lambda struct enum typedef include namespace".split()
)
CODE_SYMBOL_RE = r"[\[\]{}();=<>#$]"


def code_prose_detect(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", sym_weight: float = 1.0,
                      kw_weight: float = 0.02,
                      threshold: float = 0.06) -> DataFrame:
    """Code-vs-prose gate: source code in a text corpus is either a
    prize (code-model pretraining) or a contaminant (a chat-tuned
    text mix) — both need the split BEFORE tokenizer training, since
    code flips the whitespace/symbol distribution a BPE fits to.

    Two O(len) signals, no UDF:
      * ``sym_ratio`` — density of code punctuation
        (``[]{}();=<>#$``) among characters;
      * ``kw_hits``  — distinct code keywords present (token-set
        intersect with a fixed vocabulary — distinct, so prose
        quoting the word "return" once is one hit, not a signal).

    score = sym_weight·sym_ratio + kw_weight·kw_hits;
    is_code = score ≥ threshold. The deliberately transparent linear
    form matches the engine's other distilled gates
    (hashed_linear_score, phash_linear_gate): swap weights, keep the
    plan — a map-only projection the scan absorbs at any scale.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_sym = n_chars - F.length(F.regexp_replace(t, CODE_SYMBOL_RE, ""))
    toks = F.array_distinct(tokens_all(text_col))
    kw = F.array(*[F.lit(w) for w in CODE_KEYWORDS])
    kw_hits = F.size(F.array_intersect(toks, kw))
    sym_ratio = F.when(n_chars > 0, F.round(n_sym * 1.0 / n_chars, 4)).otherwise(F.lit(0.0))
    score = F.round(sym_ratio * sym_weight + kw_hits * kw_weight, 4)
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_sym.cast("long").alias("n_sym"),
        sym_ratio.alias("sym_ratio"),
        kw_hits.cast("long").alias("kw_hits"),
        score.alias("code_score"),
        (score >= threshold).alias("is_code"),
    )


def code_prose_detect_sql(src: str, text_col: str = "text",
                          id_col: str = "doc_id", sym_weight: float = 1.0,
                          kw_weight: float = 0.02,
                          threshold: float = 0.06) -> str:
    """DuckDB replay of :func:`code_prose_detect` — same regex, same
    distinct-token intersect, same rounded linear score."""
    kws = ", ".join(f"'{w}'" for w in CODE_KEYWORDS)
    return f"""
        WITH cp0 AS (
          SELECT {id_col},
                 CAST(length({text_col}) AS BIGINT) AS n_chars,
                 CAST(length({text_col}) - length(regexp_replace(
                      {text_col}, '{CODE_SYMBOL_RE}', '', 'g')) AS BIGINT) AS n_sym,
                 CAST(len(list_filter(
                      list_distinct(regexp_extract_all(lower({text_col}),
                                                       '[0-9a-z_]+')),
                      w -> list_contains([{kws}], w))) AS BIGINT) AS kw_hits
          FROM {src}
        ), cp1 AS (
          SELECT *, CASE WHEN n_chars > 0
                         THEN ROUND(n_sym * 1.0 / n_chars, 4)
                         ELSE 0.0 END AS sym_ratio
          FROM cp0
        )
        SELECT {id_col}, n_chars, n_sym, sym_ratio, kw_hits,
               ROUND(sym_ratio * {sym_weight} + kw_hits * {kw_weight}, 4)
                 AS code_score,
               ROUND(sym_ratio * {sym_weight} + kw_hits * {kw_weight}, 4)
                 >= {threshold} AS is_code
        FROM cp1
    """


def zipf_slope(docs: DataFrame, k: int = 100, text_col: str = "text",
               group_col: str = "source") -> DataFrame:
    """Zipf rank-frequency slope per corpus slice: regress ln(freq)
    on ln(rank) over the top-k terms. Natural language sits near
    slope −1; template/boilerplate-heavy slices flatten (the head is
    machine-repeated), gibberish steepens — a one-number corpus-
    health signal that catches generator spam a per-doc gate misses
    because every individual page looks fine.

    Cross-engine float discipline: each ln() is rounded to 6 decimals
    and CAST TO DECIMAL, and all four regression sums run in decimal
    — exact and associative, so partial-aggregation order (which
    differs between engines and between runs) cannot move the result.
    Only the final closed-form slope
        (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)
    is evaluated in double, in the same op order as
    :func:`zipf_slope_sql`, then rounded to 4.

    Plan shape: explode + per-(slice, word) count (map-side
    partials); the rank window runs over the VOCABULARY aggregate
    (Heaps-law small, not the corpus) per slice; one final agg row
    per slice. Output: (group, n_terms, zipf_slope).
    """
    toks = tokens_all(text_col)
    wc = (
        docs.select(F.col(group_col).alias("g"), F.explode(toks).alias("w"))
        .groupBy("g", "w").agg(F.count("*").alias("c"))
    )
    w_rank = Window.partitionBy("g").orderBy(F.desc("c"), F.asc("w"))
    top = wc.withColumn("r", F.row_number().over(w_rank)).filter(F.col("r") <= k)
    dec = "decimal(18,6)"
    x = F.round(F.log(F.col("r").cast("double")), 6).cast(dec)
    y = F.round(F.log(F.col("c").cast("double")), 6).cast(dec)
    staged = top.select("g", x.alias("x"), y.alias("y"))
    agg = staged.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_terms"),
        slope.alias("zipf_slope"),
    )


def zipf_slope_sql(src: str, k: int = 100, text_col: str = "text",
                   group_col: str = "source") -> str:
    """DuckDB replay of :func:`zipf_slope` — same rounded-decimal
    staging, same exact sums, same double op order."""
    return f"""
        WITH zs_wc AS (
          SELECT {group_col} AS g, w, COUNT(*) AS c
          FROM (SELECT {group_col}, unnest(regexp_extract_all(
                       lower({text_col}), '[0-9a-z_]+')) AS w FROM {src})
          GROUP BY g, w
        ), zs_top AS (
          SELECT g, c, row_number() OVER (
                   PARTITION BY g ORDER BY c DESC, w ASC) AS r
          FROM zs_wc QUALIFY r <= {k}
        ), zs_xy AS (
          SELECT g,
                 CAST(ROUND(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
                 CAST(ROUND(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
          FROM zs_top
        ), zs_agg AS (
          SELECT g, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
                 SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
          FROM zs_xy GROUP BY g
        )
        SELECT g AS {group_col}, CAST(n AS BIGINT) AS n_terms,
               ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
                 AS zipf_slope
        FROM zs_agg
    """


# ---- encoding-damage (mojibake) detection ------------------------------------
#
# UTF-8 bytes decoded once too often as Latin-1/CP1252 leave an
# unmistakable residue — 'Ã©' for é, 'â€™' for ’, 'Ð¿Ñ€Ð¸Ð²ÐµÑ‚'
# for Cyrillic — and a corpus keeps every such page unless something
# counts the residue: lang-ID still says "latin script", charset
# detection sees a valid declaration (the damage happened UPSTREAM
# of us, in some exporter), and dedup treats each mangling as fresh
# text.  The signatures are structural, not lexical: a 2-byte UTF-8
# misdecode is lead U+00C2..U+00DF followed by a continuation byte's
# Latin-1/CP1252 image; a 3-byte misdecode is lead U+00E0..U+00EF
# followed by TWO of them.  The follower class is rendered from one
# Python table into BOTH engines (the shared-table discipline), so
# the regexes cannot drift.  Legit accented text almost never puts
# continuation-image characters (C1 controls, curly quotes, †, ‰)
# right after an accented letter twice in a row — and the flag also
# requires a minimum hit count and density.  Pure projection.

#: CP1252's images of bytes 0x80..0x9F (the non-Latin-1 ones)
_CP1252_HIGH = [
    0x20AC, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021, 0x02C6,
    0x2030, 0x0160, 0x2039, 0x0152, 0x017D, 0x2018, 0x2019, 0x201C,
    0x201D, 0x2022, 0x2013, 0x2014, 0x02DC, 0x2122, 0x0161, 0x203A,
    0x0153, 0x017E, 0x0178,
]
_MOJI_FOLLOWER = ("[\\x{0080}-\\x{00BF}"
                  + "".join(f"\\x{{{c:04X}}}" for c in _CP1252_HIGH) + "]")
MOJI2_RE = "[\\x{00C2}-\\x{00DF}]" + _MOJI_FOLLOWER
MOJI3_RE = "[\\x{00E0}-\\x{00EF}]" + _MOJI_FOLLOWER + _MOJI_FOLLOWER
MOJI_REPL_RE = "\\x{FFFD}"


def mojibake_stats(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_hits: int = 2,
                   per_kchar: float = 1.0) -> DataFrame:
    """Per-doc encoding-damage profile: counts of 2-byte and 3-byte
    misdecode signatures and U+FFFD replacement chars, damage density
    per 1000 chars, and the drop flag (>= min_hits AND density >=
    per_kchar).  Non-overlapping leftmost matches in both engines."""
    t = F.col(text_col)

    def n(pat):
        return F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("long")

    d = docs.select(
        F.col(id_col),
        n(MOJI2_RE).alias("n_moji2"),
        n(MOJI3_RE).alias("n_moji3"),
        n(MOJI_REPL_RE).alias("n_replacement"),
        F.length(t).cast("long").alias("n_chars"),
    )
    hits = F.col("n_moji2") + F.col("n_moji3") + F.col("n_replacement")
    dens = F.round(hits * F.lit(1000.0) / F.greatest(F.col("n_chars"), F.lit(1)), 4)
    return d.withColumns(
        {
            "moji_per_kchar": dens,
            "mojibake_flag": (hits >= min_hits) & (dens >= per_kchar),
        }
    )


def mojibake_stats_sql(src: str, text_col: str = "text",
                       id_col: str = "doc_id", min_hits: int = 2,
                       per_kchar: float = 1.0) -> str:
    """DuckDB replay of :func:`mojibake_stats` — the same rendered
    signature regexes, counts via len(regexp_extract_all)."""
    def n(pat):
        return f"CAST(len(regexp_extract_all({text_col}, '{pat}')) AS BIGINT)"

    return f"""
        WITH mj AS (
          SELECT {id_col},
                 {n(MOJI2_RE)} AS n_moji2,
                 {n(MOJI3_RE)} AS n_moji3,
                 {n(MOJI_REPL_RE)} AS n_replacement,
                 CAST(length({text_col}) AS BIGINT) AS n_chars
          FROM {src}
        )
        SELECT *,
               ROUND((n_moji2 + n_moji3 + n_replacement) * 1000.0
                     / greatest(n_chars, 1), 4) AS moji_per_kchar,
               (n_moji2 + n_moji3 + n_replacement) >= {min_hits}
                 AND ROUND((n_moji2 + n_moji3 + n_replacement) * 1000.0
                           / greatest(n_chars, 1), 4) >= {per_kchar}
                 AS mojibake_flag
        FROM mj
    """


# ---- tokenizer fertility by language ----------------------------------------
#
# Context budgets are paid in TOKENS but corpora are weighed in
# chars/words — and the exchange rate differs per language (CJK and
# agglutinative languages cost multiples of English under the same
# tokenizer). The per-language fertility table (chars per BPE-ish
# token, BPE-vs-whitespace blowup) is what a mixture designer uses
# to convert corpus weights into effective token budgets. One hash
# agg over the corpus with both existing token counters; ratios are
# the only floats, rounded identically in both engines.

def tokenizer_fertility(docs: DataFrame, text_col: str = "text",
                        lang_col: str = "lang") -> DataFrame:
    """Per language: n_docs, n_chars, n_tokens (whitespace-ish),
    n_bpe_tokens, chars_per_bpe_token, bpe_per_token (the subword
    blowup factor; NULL when a language has no whitespace tokens)."""
    d = docs.select(
        F.col(lang_col).alias("lang"),
        F.length(F.col(text_col)).cast("long").alias("c"),
        token_count(F.col(text_col)).cast("long").alias("t"),
        bpe_token_count(F.col(text_col)).cast("long").alias("b"),
    )
    g = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("c").alias("n_chars"),
        F.sum("t").alias("n_tokens"),
        F.sum("b").alias("n_bpe_tokens"),
    )
    return g.select(
        "lang", "n_docs", "n_chars", "n_tokens", "n_bpe_tokens",
        F.round(F.col("n_chars") / F.greatest(F.col("n_bpe_tokens"), F.lit(1)), 4)
         .alias("chars_per_bpe_token"),
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("n_bpe_tokens") / F.col("n_tokens"), 4))
         .alias("bpe_per_token"),
    )


def tokenizer_fertility_sql(src: str, text_col: str = "text",
                            lang_col: str = "lang") -> str:
    """DuckDB replay of :func:`tokenizer_fertility` — same token
    regexes (shared constants), same rounding."""
    return f"""
        WITH tf AS (
          SELECT {lang_col} AS lang,
                 CAST(length({text_col}) AS BIGINT) AS c,
                 CAST(len(regexp_extract_all(lower({text_col}),
                          '[0-9a-z_]+')) AS BIGINT) AS t,
                 CAST(len(regexp_extract_all(lower({text_col}),
                          '{BPE_TOKEN_RE}')) AS BIGINT) AS b
          FROM {src}
        ), tg AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(c) AS BIGINT) AS n_chars,
                 CAST(SUM(t) AS BIGINT) AS n_tokens,
                 CAST(SUM(b) AS BIGINT) AS n_bpe_tokens
          FROM tf GROUP BY lang
        )
        SELECT lang, n_docs, n_chars, n_tokens, n_bpe_tokens,
               ROUND(n_chars * 1.0 / greatest(n_bpe_tokens, 1), 4)
                 AS chars_per_bpe_token,
               CASE WHEN n_tokens > 0
                    THEN ROUND(n_bpe_tokens * 1.0 / n_tokens, 4) END
                 AS bpe_per_token
        FROM tg
    """


# ---- temperature-scaled source mixture (alpha = 1/2) --------------------------
#
# Proportional sampling lets English swamp every other language;
# uniform sampling over-trains tiny sources. The standard fix
# (mBERT/XLM-R's exponentiated smoothing) samples source s with
# probability n_s^alpha / sum n^alpha. alpha is fixed at 1/2 here
# deliberately: sqrt is an IEEE-754 correctly-rounded operation, so
# the shares replay bit-identically in every engine, where a general
# pow(n, 0.3) depends on each libm's last-ulp behavior — the same
# determinism-over-generality trade the fixed-point quantizers make.
# One count agg + one 1-row broadcast of the normalizer.

def temperature_mixture(docs: DataFrame,
                        source_col: str = "source") -> DataFrame:
    """Per source: n_docs, raw_share, temp_share (sqrt-smoothed
    sampling probability), boost = temp_share / raw_share (>1 means
    the source is up-sampled by smoothing). Shares rounded to 6.
    The per-source weight is quantized to an int64 (floor of
    sqrt * 10^6) BEFORE the normalizer sum: a float sum's value
    depends on partition arrival order, an integer sum never does —
    the only floats are the two final one-divisions."""
    g = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"))
    wint = F.floor(F.sqrt(F.col("n_docs")) * F.lit(1_000_000.0)).cast("long")
    gw = g.withColumn("__wi", wint)
    w = gw.select(F.sum("n_docs").alias("__n"), F.sum("__wi").alias("__w"))
    j = gw.join(F.broadcast(w))
    raw = F.round(F.col("n_docs") / F.col("__n"), 6)
    temp = F.round(F.col("__wi") / F.col("__w"), 6)
    return j.select(
        "source", "n_docs", raw.alias("raw_share"), temp.alias("temp_share"),
        F.round(temp / raw, 4).alias("boost"),
    )


def temperature_mixture_sql(src: str, source_col: str = "source") -> str:
    """DuckDB replay of :func:`temperature_mixture` — same sqrt
    smoothing and rounding."""
    return f"""
        WITH tm_g AS (
          SELECT {source_col} AS source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(floor(sqrt(COUNT(*)) * 1000000.0) AS BIGINT) AS wi
          FROM {src} GROUP BY {source_col}
        ), tm_w AS (
          SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
                 CAST(SUM(wi) AS BIGINT) AS w
          FROM tm_g
        )
        SELECT source, n_docs,
               ROUND(n_docs * 1.0 / n, 6) AS raw_share,
               ROUND(wi * 1.0 / w, 6) AS temp_share,
               ROUND(ROUND(wi * 1.0 / w, 6)
                     / ROUND(n_docs * 1.0 / n, 6), 4) AS boost
        FROM tm_g, tm_w
    """


# ---- invisible / bidi control characters -------------------------------------
#
# Zero-width and bidi-control codepoints are the web's invisible
# ink: hidden watermarks, SEO cloaking, spoofed filenames
# (RLO-reversed extensions), and prompt-injection payloads that
# survive every visual review — a training corpus wants them
# counted and usually stripped. Two rendered classes (zero-width:
# ZWSP/ZWNJ/ZWJ/WJ/ZWNBSP-BOM; bidi controls: the 202A-202E
# embedding/override block plus the 2066-2069 isolates), counted
# per doc, plus a cleaned text column with both classes removed —
# the same one-table-renders-both-engines discipline as the
# mojibake signatures. Pure projection.

_ZERO_WIDTH = [0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF]
_BIDI_CTRL = [0x202A, 0x202B, 0x202C, 0x202D, 0x202E,
              0x2066, 0x2067, 0x2068, 0x2069]
ZW_RE = "[" + "".join(f"\\x{{{c:04X}}}" for c in _ZERO_WIDTH) + "]"
BIDI_RE = "[" + "".join(f"\\x{{{c:04X}}}" for c in _BIDI_CTRL) + "]"


def invisible_chars(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per doc: n_zero_width, n_bidi_ctrl, has_invisible, and
    clean_text with both classes removed."""
    t = F.col(text_col)

    def n(pat):
        return F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("long")

    d = docs.select(
        F.col(id_col),
        n(ZW_RE).alias("n_zero_width"),
        n(BIDI_RE).alias("n_bidi_ctrl"),
        F.regexp_replace(F.regexp_replace(t, ZW_RE, ""), BIDI_RE, "")
        .alias("clean_text"),
    )
    return d.withColumn(
        "has_invisible",
        (F.col("n_zero_width") + F.col("n_bidi_ctrl")) > 0)


def invisible_chars_sql(src: str, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`invisible_chars` — same rendered
    classes."""
    def n(pat):
        return f"CAST(len(regexp_extract_all({text_col}, '{pat}')) AS BIGINT)"

    return f"""
        SELECT {id_col},
               {n(ZW_RE)} AS n_zero_width,
               {n(BIDI_RE)} AS n_bidi_ctrl,
               regexp_replace(regexp_replace({text_col}, '{ZW_RE}', '', 'g'),
                              '{BIDI_RE}', '', 'g') AS clean_text,
               {n(ZW_RE)} + {n(BIDI_RE)} > 0 AS has_invisible
        FROM {src}
    """
