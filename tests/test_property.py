"""Property-based engine-vs-oracle equivalence (SURVEY.md §5.6):
random universe shapes and scheduler configs must always produce the
exact oracle crawl order and seen set, plus the standing invariants
(seen-set monotonicity via per-wave metrics, politeness budget never
exceeded, no dangling edges)."""

import collections

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dblp_crawler_spark import fixtures, oracle
from dblp_crawler_spark.lakehouse import Lakehouse
from dblp_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_authors=st.integers(min_value=25, max_value=60),
    n_pubs=st.integers(min_value=60, max_value=150),
    host_budget=st.sampled_from([None, 5, 11]),
)
def test_engine_matches_oracle_on_random_universes(
    spark, tmp_path_factory, seed, n_authors, n_pubs, host_budget
):
    u = fixtures.make_universe(
        n_authors=n_authors, n_pubs=n_pubs, n_venues=4, seed=seed, with_images=False
    )
    lake = Lakehouse(spark, str(tmp_path_factory.mktemp("prop")))
    fixtures.write_tables(spark, lake, u)
    cfg = CrawlConfig(
        year=u.year_filter, rules=u.keyword_rules, host_budget=host_budget, max_attempts=2
    )
    eng = CrawlEngine(spark, lake, cfg)
    eng.initialize()
    metrics = eng.run_to_end()
    res = oracle.run_oracle(u, host_budget=host_budget, max_attempts=2)

    order = [(r.wave, r.seq, r.url) for r in lake.read("crawl_order").orderBy("seq").collect()]
    assert order == res.crawl_order
    assert {r.key for r in lake.read("seen_pubs").collect()} == res.seen_pubs

    # politeness: per (wave, host) scheduled person fetches ≤ budget
    if host_budget is not None:
        sched = collections.Counter()
        host_of = {r["url"]: r["host"] for r in lake.read("frontier").collect()}
        for wave, _seq, url in order:
            if url in host_of:
                sched[(wave, host_of[url])] += 1
        assert all(c <= host_budget for c in sched.values()), sched

    # seen-set monotonicity: pubs_new per wave sums to the final set
    assert sum(m["pubs_new"] for m in metrics) == len(res.seen_pubs)

    # no dangling edges: both endpoints of every edge are nodes
    node_ids = {r.pid for r in lake.read("nodes").collect()}
    for e in lake.read("edges").collect():
        assert e.src in node_ids and e.dst in node_ids


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """connected_components (min-label propagation + pointer jump,
    Observation-terminated) equals a direct union-find on arbitrary
    random edge lists — including self-dup edges, chains, and
    multi-component graphs."""
    from dblp_crawler_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical component = min node id reachable
    expected = {}
    nodes = {n for e in edges for n in e}
    roots = {n: find(n) for n in nodes}
    min_of_root: dict[int, int] = {}
    for n, r in roots.items():
        min_of_root[r] = min(min_of_root.get(r, n), n)
    expected = {n: min_of_root[roots[n]] for n in nodes}

    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == expected


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.tuples(
            st.lists(st.sampled_from("alpha beta gamma delta x y2 _z".split()),
                     min_size=0, max_size=40),
        ),
        min_size=1, max_size=25,
    ),
    window=st.integers(min_value=1, max_value=9),
    stride=st.integers(min_value=1, max_value=9),
)
def test_chunk_tokens_reconstruction_property(spark, data, window, stride):
    """For ANY document and any (window, stride): chunk k covers
    tokens [k*stride, k*stride+window); concatenating each chunk's
    first `stride` tokens plus the final chunk's remainder
    reconstructs the document exactly; chunk sizes never exceed
    window."""
    from dblp_crawler_spark.operators.textstats import chunk_tokens

    rows = [(i, " ".join(toks)) for i, (toks,) in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = collections.defaultdict(dict)
    for r in chunk_tokens(df, window=window, stride=stride).collect():
        out[r.doc_id][r.chunk_id] = (r.n_chunk_tokens, r.chunk_text)
    for i, (toks,) in enumerate(data):
        chunks = out[i]
        assert sorted(chunks) == list(range(len(chunks)))
        recon = []
        for k in sorted(chunks):
            n, txt = chunks[k]
            ctoks = txt.split() if txt else []
            assert n == len(ctoks) <= window
            assert ctoks == toks[k * stride: k * stride + window]
            recon.extend(ctoks[:stride] if k < max(chunks) else ctoks)
        if stride <= window:
            assert recon == toks  # full coverage, no token lost
        # every chunk start < n_tokens (no phantom chunks) except the
        # single chunk emitted for an empty/short doc
        assert max(chunks) * stride <= max(len(toks) - 1, 0)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=6),
)
def test_mixture_flatten_property(spark, sizes):
    """For ANY source-size profile: output ⊆ input, every min-size
    source is kept whole, keep decisions depend only on doc_id (two
    runs identical), and expected keep counts track sqrt(n_min/n_s)
    within a loose deterministic band."""
    from dblp_crawler_spark.operators.textstats import mixture_flatten

    rows, base = [], 0
    for s_i, n in enumerate(sizes):
        rows += [(base + j, f"doc {base + j}", f"s{s_i}") for j in range(n)]
        base += 10_000
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = {r.doc_id for r in mixture_flatten(df).collect()}
    assert kept <= {r[0] for r in rows}
    again = {r.doc_id for r in mixture_flatten(df).collect()}
    assert kept == again
    n_min = min(sizes)
    by_src = collections.Counter(r[2] for r in rows if r[0] in kept)
    for s_i, n in enumerate(sizes):
        if n == n_min:
            assert by_src[f"s{s_i}"] == n  # smallest source kept whole
        exp = n * (n_min / n) ** 0.5
        # 30-bit uniform, deterministic: band = ±(4·sqrt(exp) + 2)
        assert abs(by_src[f"s{s_i}"] - exp) <= 4 * exp ** 0.5 + 2


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vecs=st.lists(
        st.tuples(
            st.lists(st.integers(min_value=-9, max_value=9), min_size=6, max_size=6),
            st.lists(st.integers(min_value=-9, max_value=9), min_size=6, max_size=6),
        ),
        min_size=1, max_size=12,
    ),
    tau_pct=st.integers(min_value=1, max_value=99),
)
def test_clip_gate_matches_exact_fraction_model(spark, vecs, tau_pct):
    """The cross-multiplied integer gate must equal cos >= tau decided
    in EXACT rational arithmetic (Fraction — no float round-off):
    keep <=> dot > 0 and dot^2/( |a|^2 |b|^2 ) >= (tau_pct/100)^2."""
    from fractions import Fraction

    from dblp_crawler_spark.operators.multimodal import clip_alignment_gate

    rows = [(i, a, b) for i, (a, b) in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id long, img_emb array<long>, cap_emb array<long>")
    got = {r.id: bool(r.align_keep) for r in clip_alignment_gate(df, tau_pct=tau_pct).collect()}
    for i, (a, b) in enumerate(vecs):
        dot = sum(x * y for x, y in zip(a, b))
        na, nb = sum(x * x for x in a), sum(y * y for y in b)
        want = dot > 0 and na > 0 and nb > 0 and (
            Fraction(dot * dot, na * nb) >= Fraction(tau_pct, 100) ** 2
        )
        assert got[i] == want, (i, a, b, tau_pct, dot, na, nb)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    target=st.sampled_from([512, 2048, 16384]),
    n=st.integers(min_value=5, max_value=60),
)
def test_warc_layout_matches_reference_on_random_records(spark, seed, target, n):
    """Random record sets at random shard targets: the distributed
    placement must equal the sequential from-spec reference exactly
    (the property warc_layout exists for)."""
    import random

    from tests.test_warc_layout import _py_layout

    from dblp_crawler_spark.operators.archive import warc_layout

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        host = f"h{rng.randrange(4)}.org"
        url = f"https://{host}/p/{rng.randrange(10_000)}-{i}"
        payload = "x" * rng.randrange(1, 900)
        rows.append((url, rng.randrange(10**6), "text/html", i, payload))
    df = spark.createDataFrame(
        rows, "url string, ts long, mime string, digest long, payload string"
    )
    got = sorted(
        tuple(r) for r in warc_layout(df, target_bytes=target)
        .select("surt", "url", "ts", "mime", "digest", "shard", "rec_offset", "rec_len")
        .collect()
    )
    assert got == sorted(_py_layout(rows, target))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    cap=st.integers(min_value=1, max_value=12),
)
def test_template_cap_invariants_on_random_urls(spark, seed, cap):
    """Any input, any cap: exactly min(cap, template size) admitted
    per template, admitted ranks are 1..m, non-admitted ranks NULL."""
    import collections
    import random

    from dblp_crawler_spark.operators.frontier import template_cap

    rng = random.Random(seed)
    rows = [
        (f"https://h{rng.randrange(3)}.org/{rng.choice(['a', 'b'])}/{rng.randrange(10_000)}",)
        for _ in range(120)
    ]
    df = spark.createDataFrame(rows, "url string").distinct()
    out = template_cap(df, max_per_template=cap).collect()
    by_t = collections.defaultdict(list)
    for r in out:
        by_t[r.template].append(r)
    for t, rs in by_t.items():
        admitted = [r for r in rs if r.admitted]
        assert len(admitted) == min(cap, len(rs)), t
        assert sorted(r.tmpl_rank for r in admitted) == list(range(1, len(admitted) + 1))
        assert all(r.tmpl_rank is None for r in rs if not r.admitted)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    delay=st.integers(min_value=1, max_value=50),
)
def test_politeness_timeline_matches_simulator_on_random_waves(spark, seed, delay):
    import random

    from tests.test_politeness_timeline import _simulate

    from dblp_crawler_spark.operators.scheduler import politeness_timeline

    rng = random.Random(seed)
    rows = [
        (f"h{rng.randrange(4)}", f"u{i}", rng.randrange(300)) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "host string, url string, ready_us long")
    got = {r.url: (r.k, r.start_us, r.finish_us)
           for r in politeness_timeline(df, delay_us=delay).collect()}
    assert got == _simulate(rows, delay)
