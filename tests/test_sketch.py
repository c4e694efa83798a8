"""HLL distinct sketch: register determinism (pinned vs from-spec
XXH64), mergeability (a CRDT max-join), and accuracy vs exact."""

from pyspark.sql import functions as F

from dblp_crawler_spark.operators.sketch import (
    hll_build,
    hll_error_bound,
    hll_estimate,
    hll_merge,
)
from xxh64_ref import xxh64_bytes

P = 12
M64 = (1 << 64) - 1


def _expected_register_rho(key: str, p: int = P) -> tuple[int, int]:
    h = xxh64_bytes(key.encode(), seed=42)
    register = h >> (64 - p)
    w = (h << p) & M64
    if w == 0:
        return register, 64 - p + 1
    return register, 65 - w.bit_length()


def test_registers_match_from_spec_xxh64(spark):
    keys = [f"user/{i}" for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {(r.register, r.rho) for r in hll_build(df, "key", p=P).collect()}
    expect = {}
    for k in keys:
        reg, rho = _expected_register_rho(k)
        expect[reg] = max(expect.get(reg, 0), rho)
    assert got == set(expect.items())


def test_merge_equals_single_build(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) register-exactly
    — the property that lets per-partition/per-day sketches answer
    global questions without rescans."""
    a = spark.range(0, 3000).select(F.concat(F.lit("u"), F.col("id")).alias("key"))
    b = spark.range(2000, 5000).select(F.concat(F.lit("u"), F.col("id")).alias("key"))
    merged = {(r.register, r.rho) for r in hll_merge(hll_build(a, "key"), hll_build(b, "key")).collect()}
    single = {(r.register, r.rho) for r in hll_build(a.unionByName(b), "key").collect()}
    assert merged == single


def test_estimate_accuracy_and_groups(spark):
    n = 20_000
    df = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("key"),
        (F.col("id") % 2 == 0).cast("string").alias("g"),
    )
    est = {r.g: r.n_distinct_est for r in hll_estimate(hll_build(df, "key", ["g"], p=P), p=P).collect()}
    tol = 4 * hll_error_bound(P)  # 4 sigma ≈ 6.5% at p=12
    for g, exact in (("true", n // 2), ("false", n // 2)):
        assert abs(est[g] - exact) / exact < tol, (g, est[g], exact)


def test_small_range_linear_counting(spark):
    """Tiny cardinalities route through linear counting — estimates
    there must be near-exact, not harmonic-mean noise."""
    df = spark.range(40).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    est = hll_estimate(hll_build(df, "key", p=P), p=P).collect()[0].n_distinct_est
    assert abs(est - 40) <= 2


def test_cms_never_underestimates_and_is_tight_for_heavy_keys(spark):
    from dblp_crawler_spark.operators.sketch import cms_build, cms_merge, cms_query

    # zipf-ish: one hot host with 5000 hits, 500 cold hosts with 1-2
    hot = spark.range(5000).select(F.lit("dblp.org").alias("host"))
    cold = spark.range(1000).select(F.concat(F.lit("h"), F.col("id") % 500).alias("host"))
    df = hot.unionByName(cold)
    sk = cms_build(df, "host").cache()
    exact = {r.host: r.n for r in df.groupBy("host").agg(F.count("*").alias("n")).collect()}
    est = {r.host: r.cnt_est for r in cms_query(sk, df.select("host").distinct(), "host").collect()}
    for h, n in exact.items():
        assert est[h] >= n  # count-min NEVER underestimates
    # heavy hitter is near-exact (w=4096 >> distinct keys → few collisions)
    assert est["dblp.org"] <= exact["dblp.org"] + 10
    # absent key probes to ~0 (collision slack only)
    ghost = spark.createDataFrame([("nosuch.example",)], "host string")
    assert cms_query(sk, ghost, "host").collect()[0].cnt_est <= 10


def test_cms_merge_equals_single_build(spark):
    from dblp_crawler_spark.operators.sketch import cms_build, cms_merge

    a = spark.range(0, 2000).select(F.concat(F.lit("h"), F.col("id") % 50).alias("host"))
    b = spark.range(0, 3000).select(F.concat(F.lit("h"), F.col("id") % 80).alias("host"))
    merged = {(r.row, r.slot, r.cnt) for r in cms_merge(cms_build(a, "host"), cms_build(b, "host")).collect()}
    single = {(r.row, r.slot, r.cnt) for r in cms_build(a.unionByName(b), "host").collect()}
    assert merged == single  # integer counters: EXACT equality


def test_cms_params_travel_with_sketch(spark):
    """(d, w) are embedded in the sketch: queries address slots with
    the BUILD parameters automatically, and mixing parameter sets is
    a hard error instead of a silently-wrong estimate."""
    import pytest

    from dblp_crawler_spark.operators.sketch import cms_build, cms_merge, cms_query

    df = spark.createDataFrame([(f"h{i % 7}",) for i in range(70)], "host string")
    sk_small = cms_build(df, "host", d=2, w=64)
    est = {r.host: r.cnt_est for r in cms_query(sk_small, df.select("host").distinct(), "host").collect()}
    assert all(v >= 10 for v in est.values())  # never underestimates
    mixed = cms_merge(sk_small, cms_build(df, "host", d=4, w=128))
    with pytest.raises(ValueError, match="parameter sets"):
        cms_query(mixed, df.select("host").distinct(), "host")


# ---- log2-histogram quantile sketch --------------------------------------


def test_hist_bucket_boundaries(spark):
    """Power-of-two boundaries must be exact: the binary-length trick
    cannot suffer float-log wobble (log2(2^k) - epsilon)."""
    from dblp_crawler_spark.operators.sketch import hist_build

    vals = [0, 1, 2, 3, 4, 7, 8, 1023, 1024, (1 << 40) - 1, 1 << 40]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    got = dict(
        (r.bucket, r.cnt) for r in hist_build(df, "v", ["g"]).collect()
    )
    assert got == {-1: 1, 0: 1, 1: 2, 2: 2, 3: 1, 9: 1, 10: 1, 39: 1, 40: 1}


def test_hist_merge_equals_single_build(spark):
    from dblp_crawler_spark.operators.sketch import hist_build, hist_merge

    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 17 % 4096 + 1).alias("v"),
    )
    single = hist_build(df, "v", ["g"])
    merged = hist_merge(
        hist_build(df.filter(F.col("id") % 2 == 0), "v", ["g"]),
        hist_build(df.filter(F.col("id") % 2 == 1), "v", ["g"]),
    )
    a = sorted(map(tuple, single.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b


def test_hist_quantile_factor2_envelope(spark):
    """Guarantee: true_q <= estimate < 2 * true_q for values >= 1,
    checked against the rank-exact quantile operator."""
    from dblp_crawler_spark.operators.quantiles import exact_group_quantiles
    from dblp_crawler_spark.operators.sketch import hist_build, hist_quantile

    df = spark.range(5000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * 2654435761 % 100000 + 1).alias("v"),
    )
    est = {r.g: (r.p50_ub, r.p90_ub, r.p99_ub)
           for r in hist_quantile(hist_build(df, "v", ["g"]), ["g"]).collect()}
    true = {r.g: (r.p50, r.p90, r.p99)
            for r in exact_group_quantiles(df, "v", "g").collect()}
    for g, (t50, t90, t99) in true.items():
        e50, e90, e99 = est[g]
        for t, e in ((t50, e50), (t90, e90), (t99, e99)):
            assert t <= e < 2 * t, (g, t, e)
