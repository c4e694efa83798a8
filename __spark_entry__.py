"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes the engine's operator inventory (SURVEY.md §2 +
the training-pipeline additions) over the driver-provided TPC-H-ish
tables; `oracle_sql()` gives the DuckDB-equivalent SQL. Column names
and rounding are aligned on both sides. Crawl-specific operators that
need the fixture universe (BFS waves, politeness, robots, bloom,
payload gates) are verified engine-vs-oracle in tests/ — here their
relational cores are exercised on the generic tables so the DuckDB
gate covers the same plan shapes.

Non-SQL-expressible entries (xxhash64-based minhash/simhash/
fingerprint, LSH ANN) have no oracle_sql → rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_crawler_spark.functions.text import keyword_cnf_match, keyword_weak_match
from dblp_crawler_spark.operators import dedup as D
from dblp_crawler_spark.operators import similarity as SIM
from dblp_crawler_spark.operators import textstats as T
from dblp_crawler_spark.streaming import events as E

CNF_RULES = [["spark", "join"], ["window", "agg"]]
SW_LIST = "', '".join(T.EN_STOPWORDS)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the engine's J5 pair-co-occurrence core on sf0.001."""
    return q_pair_cooccurrence(spark, "/root/testdata/sf0.001")


# ---- crawl-semantics family (engine operator cores) -----------------------
def q_pushdown_year_filter(spark, sf_dir):
    """P1: year predicate pushed to the scan, partial agg (A1)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.year("l_shipdate") >= 2000)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )


def q_keyword_cnf_filter(spark, sf_dir):
    """P2: OR-of-ANDs CNF keyword match (keyword/__init__.py:24-32)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(keyword_cnf_match("text", CNF_RULES))
        .groupBy("lang")
        .agg(F.count("*").alias("n_matched"))
    )


def q_keyword_weak_filter(spark, sf_dir):
    """P3: any-word weak match (keyword/__init__.py:34-39)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(keyword_weak_match("text", CNF_RULES).alias("weak_match")).agg(
        F.count("*").alias("n")
    )


def q_canonical_title_hash(spark, sf_dir):
    """P4: canonicalization → distinct canonical keys per brand."""
    part = _t(spark, sf_dir, "part")
    canon = F.regexp_replace(F.lower("p_name"), "[^0-9a-z]", "")
    return part.groupBy("p_brand").agg(F.count_distinct(canon).alias("n_canon"))


def q_url2doi(spark, sf_dir):
    """P5: url→doi extraction over a constructed ee column."""
    from dblp_crawler_spark.functions.text import url2doi

    docs = _t(spark, sf_dir, "documents")
    url = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.lit("https://doi.org/10.1234/"), F.col("doc_id"))
    ).otherwise(F.concat(F.lit("https://example.org/"), F.col("doc_id")))
    return docs.select("doc_id", url2doi(url).alias("doi")).filter(F.col("doi").isNotNull())


def q_journal_key_prefix(spark, sf_dir):
    """P6: first-k-segment URL canonicalization (substring_index)."""
    part = _t(spark, sf_dir, "part")
    path = F.concat(F.regexp_replace(F.col("p_type"), " ", "/"), F.lit("/"), F.col("p_brand"))
    return part.groupBy(F.substring_index(path, "/", 2).alias("jkey")).agg(F.count("*").alias("n"))


def q_dim_broadcast_lookup(spark, sf_dir):
    """P7: broadcast dim join + coalesce('N') (parser.py:124-129)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_regionkey") < 3)
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .groupBy(F.coalesce("r_name", F.lit("N")).alias("rank"))
        .agg(F.count("*").alias("n"))
    )


def q_frontier_antijoin(spark, sf_dir):
    """J3/U3: seen-set anti-join — customers with no orders since
    1998 (the year filter keeps the result non-empty at every SF)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") >= 1998)
    nation = _t(spark, sf_dir, "nation")
    no_orders = cust.join(orders.select("o_custkey"), cust.c_custkey == orders.o_custkey, "left_anti")
    return (
        no_orders.join(nation, no_orders.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


def q_frontier_expand_join(spark, sf_dir):
    """J1: candidate expansion minus a synthetic seen set."""
    orders = _t(spark, sf_dir, "orders")
    cands = orders.filter(F.year("o_orderdate") >= 1997).select("o_custkey").distinct()
    unseen = cands.filter(F.col("o_custkey") % 7 != 0)
    return unseen.agg(F.count("*").alias("n_new"))


def q_pair_cooccurrence(spark, sf_dir):
    """J5: canonical-ordered pair self-join (co-authorship core)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.withColumnsRenamed({"l_partkey": "a"})
    b = li.withColumnsRenamed({"l_partkey": "b"})
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )


def q_degree_threshold(spark, sf_dir):
    """A6: degree filter — parts in ≥ 8 distinct orders."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count_distinct("l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 8)
    )


def q_politeness_window(spark, sf_dir):
    """O5: per-host budget window — top-3 orders per customer."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


def q_priority_pop(spark, sf_dir):
    """T3: deterministic global priority pop (top-100)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


def q_seen_set_union(spark, sf_dir):
    """U1/U3: set union + except on key sets."""
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    done = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    union = urgent.union(done).distinct()
    minus = urgent.exceptAll(done).select("o_orderkey").distinct()
    return union.agg(F.count("*").alias("n_union")).crossJoin(
        minus.agg(F.count("*").alias("n_minus"))
    )


def q_url_canonicalize(spark, sf_dir):
    """General URL canonicalization collapsing raw spellings to one
    seen-set key (north_rule's first verb: "canonicalizes and hashes
    candidate URLs"; generalizes the reference's dblp-only '.html'
    strip, download.py). Five planted raw spellings per document —
    scheme/host case, default port, fragment, unsorted + empty query
    params, trailing slash — must collapse to exactly three canonical
    URLs per host group, proving the frontier can never double-fetch
    a re-spelled resource. Pure projection + one hash agg; the DuckDB
    oracle replays canonical_url_sql verbatim."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.functions.urlnorm import canonical_url

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    k = (F.col("doc_id") % 50).cast("string")
    variants = F.array(
        F.concat(F.lit("http://example"), k, F.lit(".org/path/"), k, F.lit("?b=2&a=1")),
        F.concat(F.lit("HTTP://EXAMPLE"), k, F.lit(".ORG:80/path/"), k, F.lit("/?a=1&b=2#frag")),
        F.concat(F.lit("http://example"), k, F.lit(".org/path/"), k, F.lit("#sec")),
        F.concat(F.lit("https://example"), k, F.lit(".org:443/other/"), k),
        F.concat(F.lit("https://example"), k, F.lit(".org/other/"), k, F.lit("?")),
    )
    raw = docs.select(F.explode(variants).alias("url"))
    return (
        raw.select("url", canonical_url("url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct("url").alias("n_forms"),
        )
        .select(
            "canonical_url",
            "n_raw",
            "n_forms",
            hash60("canonical_url").alias("seen_key"),
        )
    )


def q_frontier_pagerank(spark, sf_dir):
    """Link-centrality frontier prioritization: integer-exact
    PageRank (operators/pagerank.py) over a planted 3-out-degree
    portable-hash graph on the documents ids — the web-crawl analog
    of the reference's venue/year priority (PageRank-ordered
    crawling). All mass arithmetic is integer floor division, so the
    ranks are bit-identical in any engine and at any partitioning;
    the oracle replays 4 power iterations as chained CTEs."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.pagerank import pagerank

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n")))
    edges = None
    for j in (1, 2, 3):
        ej = docs.crossJoin(n).select(
            F.col("doc_id").alias("src"),
            (hash60("doc_id", j) % F.col("n")).alias("dst"),
        )
        edges = ej if edges is None else edges.union(ej)
    pr = pagerank(edges, iters=4)
    return pr.select(F.col("id").alias("doc_id"), "rank_int")


def q_link_trustrank(spark, sf_dir):
    """Seeded trust propagation (operators/pagerank.trustrank) over
    the same planted portable-hash link graph as frontier_pagerank:
    teleport mass lands only on the trusted seed set (every 13th
    doc), so spam regions reachable solely from untrusted pages
    score 0 where plain PageRank's uniform base would rank them —
    the Gyöngyi et al. spam-demotion signal a frontier blends with
    rank and HITS. Integer-exact; the oracle unrolls 4 seeded
    iterations as chained CTEs."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.pagerank import trustrank

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n")))
    edges = None
    for j in (1, 2, 3):
        ej = docs.crossJoin(n).select(
            F.col("doc_id").alias("src"),
            (hash60("doc_id", j) % F.col("n")).alias("dst"),
        )
        edges = ej if edges is None else edges.union(ej)
    seeds = docs.filter(F.col("doc_id") % 13 == 0).select(F.col("doc_id").alias("id"))
    tr = trustrank(edges, seeds, iters=4)
    return tr.select(F.col("id").alias("doc_id"), "trust_int")


def q_host_pagerank(spark, sf_dir):
    """Host-level weighted PageRank (operators/pagerank.
    pagerank_weighted): the planted page link graph projected to
    hosts (doc/dst mod 40) with parallel links collapsed into count
    weights — the granularity a crawl actually prioritizes, at
    ~1000x fewer edge rows per iteration than page-level rank, and
    (slightly) MORE exact: one (r*w) div sw division per edge loses
    nothing where the expanded multigraph evaporates r mod sw.
    Oracle unrolls 4 weighted iterations as chained CTEs."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.pagerank import pagerank_weighted

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n")))
    edges = None
    for j in (1, 2, 3):
        ej = docs.crossJoin(n).select(
            (F.col("doc_id") % 40).alias("src"),
            ((hash60("doc_id", j) % F.col("n")) % 40).alias("dst"),
        )
        edges = ej if edges is None else edges.union(ej)
    hosts = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    pr = pagerank_weighted(hosts, iters=4)
    return pr.select(F.col("id").alias("host_id"), "rank_int")


def q_link_hits(spark, sf_dir):
    """Hub/authority frontier scoring: integer-exact HITS
    (operators/hits.py) over the same planted 3-out-degree
    portable-hash link graph as frontier_pagerank — hubs are the
    pages to expand from, authorities the URLs to fetch first. Both
    mutual-reinforcement sums are int64 with divide-first L-infinity
    fixed-point normalization, so scores are bit-identical in any
    engine; the oracle replays 3 iterations as chained CTEs."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.hits import hits

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n")))
    edges = None
    for j in (1, 2, 3):
        ej = docs.crossJoin(n).select(
            F.col("doc_id").alias("src"),
            (hash60("doc_id", j) % F.col("n")).alias("dst"),
        )
        edges = ej if edges is None else edges.union(ej)
    hs = hits(edges, iters=3)
    return hs.select(F.col("id").alias("doc_id"), "auth_int", "hub_int")


def q_host_budget_alloc(spark, sf_dir):
    """Largest-remainder apportionment of a 1000-slot wave budget
    across hosts (source stands in for host; weight = total bytes
    pending). Exact integer quotas — floor via `div`, leftover slots
    to the largest remainders through the distributed two-pass rank
    (no single-partition window). SUM(budget) == 1000 exactly."""
    from dblp_crawler_spark.operators.budget import host_budget_alloc

    docs = _t(spark, sf_dir, "documents")
    hosts = docs.groupBy(F.col("source").alias("host")).agg(
        F.sum("n_chars").cast("long").alias("weight")
    )
    return host_budget_alloc(hosts, budget=1000)


def q_anchor_text_agg(spark, sf_dir):
    """Anchor-text aggregation (operators/anchors.py) over the same
    planted 3-out-degree portable-hash link graph as
    frontier_pagerank, with each link's anchor = the first 4 tokens
    of the SOURCE doc's text. Per-target top-2 terms ranked by
    (distinct linking pages, link count, term) — explode → one
    (dst, term) hash agg → dst-keyed WindowGroupLimit."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.anchors import anchor_terms, anchor_text_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    n = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n")))
    links = None
    for j in (1, 2, 3):
        lj = docs.crossJoin(n).select(
            F.col("doc_id").alias("src"),
            (hash60("doc_id", j) % F.col("n")).alias("dst"),
            F.col("text").alias("anchor"),
        )
        links = lj if links is None else links.union(lj)
    terms = anchor_terms(links, max_terms=4)
    return anchor_text_topk(terms, k=2)


_ROBOTS_VARIANTS = [
    "# hi\nUser-agent: *\nDisallow: /private\nDisallow: /tmp\nCrawl-delay: 2",
    "User-agent: googlebot\nDisallow: /g\n\nUser-agent: *\nDisallow: /x",
    "Disallow: /orphan\nUser-agent: badbot\nUser-agent: *\nDisallow: /y\nCrawl-delay: 10",
    "User-agent: onlybot\nDisallow: /z",
    "User-agent: *\nDisallow: /a\nCrawl-delay: 1\n\nUser-agent: *\nDisallow: /b\nCrawl-delay: 3",
    "USER-AGENT :  *\ndisallow:/caps",
]


def q_robots_parse(spark, sf_dir):
    """robots.txt → the scheduler's politeness inputs
    (sources/webparse.parse_robots): RFC-9309 group semantics —
    stacked User-agent lines form one group, orphan directives are
    ignored, only wildcard groups apply, malformed multi-star files
    union their prefixes and take the max crawl delay. Planted: 24
    hosts cycling six adversarial robots.txt shapes; per-host
    windowed parse, no global state. The oracle replays the whole
    windowed parse (parse_robots_sql)."""
    from dblp_crawler_spark.sources.webparse import parse_robots

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 24)
    txt = F.lit(None).cast("string")
    for i, v in enumerate(_ROBOTS_VARIANTS):
        txt = F.when(F.col("doc_id") % 6 == i, F.lit(v)).otherwise(txt)
    pages = docs.select(
        F.format_string("h%d.org", "doc_id").alias("host"), txt.alias("robots_txt")
    )
    return parse_robots(pages)


def q_robots_sitemap_lines(spark, sf_dir):
    """`Sitemap:` declarations from robots.txt (webparse.
    robots_sitemaps): RFC 9309 treats them as global lines valid
    ANYWHERE in the file — planted variants put them before groups,
    inside groups, doubled, case-shifted (SITEMAP:), colon-tight,
    with comments and raw URL spellings; extraction is position-
    independent and canonicalizing, closing the robots → sitemap →
    fetch_plan discovery chain. DuckDB replays line split, extract,
    and canonical_url_sql exactly."""
    from dblp_crawler_spark.sources.webparse import robots_sitemaps

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 40)
    hh = (F.col("doc_id") % 40).cast("string")
    h = F.concat(F.lit("h"), hh, F.lit(".org"))
    v0 = F.concat(F.lit("User-agent: *\nDisallow: /x\nSitemap: HTTP://H"), hh,
                  F.lit(".ORG:80/sitemap0.xml\n"))
    v1 = F.concat(F.lit("Sitemap: http://h"), hh, F.lit(".org/sm_a.xml\n"
                  "User-agent: *\nsitemap: http://h"), hh, F.lit(".org/sm_b.xml#frag\n"))
    v2 = F.lit("# no declarations here\nUser-agent: *\nDisallow: /\n")
    v3 = F.concat(F.lit("SITEMAP:http://h"), hh, F.lit(".org/deep/sm.xml  \n"))
    txt = (
        F.when(F.col("doc_id") % 4 == 0, v0)
        .when(F.col("doc_id") % 4 == 1, v1)
        .when(F.col("doc_id") % 4 == 2, v2)
        .otherwise(v3)
    )
    pages = docs.select(h.alias("host"), txt.alias("robots_txt"))
    return robots_sitemaps(pages)


_ROBOTS_RULE_VARIANTS = [
    # Allow override under a broader Disallow + '$'-anchored wildcard
    # + an empty Disallow (matches nothing, dropped by the parser)
    "User-agent: *\nDisallow: /private\nAllow: /private/pub*\n"
    "Disallow: /tmp/*.pdf$\nDisallow:",
    # '$' anchor vs longer prefix: /a matches both, Disallow is longer
    "User-agent: *\nDisallow: /a$\nAllow: /a",
    # equal-length tie -> Allow wins; pattern not starting with '/'
    "User-agent: *\nAllow: /x\nDisallow: /x\nDisallow: *.json$",
    # non-star group only: no applicable rules, everything allowed
    "User-agent: otherbot\nDisallow: /",
    # orphan directive ignored; the star group only Allows
    "Disallow: /orphan\nUser-agent: *\nAllow: /only",
    # no rules at all -> host never appears in the rules table
    "# empty file",
]

_ROBOTS_RULE_PATHS = [
    "/private/file",      # v0: Disallow /private
    "/private/pub42",     # v0: longer Allow wins
    "/tmp/x.pdf",         # v0: wildcard + $ anchor
    "/tmp/x.pdfx",        # v0: $ anchor misses .pdfx
    "/a",                 # v1: /a$ (3) beats /a (2)
    "/ab",                # v1: only Allow /a matches
    "/data/f.json",       # v2: *.json$ matches anywhere
    "/",                  # bare root
]


_CACHE_HEADER_VARIANTS = [
    "HTTP/1.1 200 OK\r\nDate: Tue, 19 Aug 2026 03:00:00 GMT\r\n"
    "Cache-Control: public, max-age=3600\r\nContent-Type: text/html\r\n",
    "Cache-Control: public, max-age=60, s-maxage=600\r\n",   # shared-cache wins
    "Cache-Control: no-store, max-age=900\r\n",              # no-store forces 0
    "cache-control: NO-CACHE, max-age=120\r\n",              # revalidate + ttl
    "Date: Tue, 19 Aug 2026 03:00:00 GMT\r\n"
    "Expires: Tue, 19 Aug 2026 05:00:00 GMT\r\n",            # fallback 7200
    "Date: Tue, 19 Aug 2026 03:00:00 GMT\r\n"
    "Expires: Mon, 18 Aug 2026 03:00:00 GMT\r\n",            # past -> clamp 0
    "Expires: Tue, 19 Aug 2026 05:00:00 GMT\r\n",            # no Date -> NULL
    "Content-Type: image/png\r\nServer: x\r\n",              # no info -> NULL
    "Date: yesterday-ish\r\nExpires: Tue, 19 Aug 2026 05:00:00 GMT\r\n",
    "Cache-Control: no-storefront, s-maxage=50\r\n",         # boundary traps
]


def q_cache_policy(spark, sf_dir):
    """RFC 9111 freshness from raw response headers (freshness.
    cache_policy): no-store / no-cache gates and the ttl budget with
    shared-cache precedence (s-maxage > max-age > Expires−Date,
    difference-only so timezone handling cancels cross-engine;
    malformed dates absorb to NULL via try_to_timestamp). This is
    where fetch_plan's revalidate/skip tiers get their budget from
    the ORIGIN instead of the reference's hardcoded per-class TTLs
    (downloader.py:34-49). Planted: 40 responses cycling ten header
    shapes incl. token-boundary traps (no-storefront, s-maxage vs
    max-age)."""
    from dblp_crawler_spark.operators.freshness import cache_policy

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 40)
    hdr = F.lit(None).cast("string")
    for i, v in enumerate(_CACHE_HEADER_VARIANTS):
        hdr = F.when(F.col("doc_id") % 10 == i, F.lit(v)).otherwise(hdr)
    resp = docs.select(
        F.concat(F.lit("http://h"), (F.col("doc_id") % 10).cast("string"),
                 F.lit(".org/p/"), F.col("doc_id").cast("string")).alias("url"),
        hdr.alias("headers"),
    )
    return cache_policy(resp)


_META_HTML_VARIANTS = [
    # both directives + raw-spelling canonical needing canonicalization
    '<html><head><meta name="robots" content="noindex, nofollow">'
    '<link rel="canonical" href="HTTP://H{i}.ORG:80/real#f"></head><body>x</body>',
    # content-first attr order, single quotes, caps token
    "<meta content='NOINDEX' name='robots'><p>body</p>",
    # unquoted name, the 'none' alias (= noindex + nofollow)
    '<meta name=robots content="none">',
    # decoy meta; no directives
    '<meta name="viewport" content="width=device-width"><p>plain</p>',
    # nofollow only + href-first canonical with a relative target
    '<meta name="robots" content="nofollow"><link href="/rel/p{i}" rel=canonical>',
    # token-boundary trap: noindexING must NOT match
    '<meta name="robots" content="noindexing">',
]


def q_html_meta_directives(spark, sf_dir):
    """In-page crawl-control directives (webparse.
    html_meta_directives): meta-robots noindex / nofollow (incl. the
    'none' alias) and rel=canonical, matched across attribute orders
    and quote styles with RE2-safe patterns so the oracle replays
    them exactly; canonical hrefs come back in canonical URL form so
    they join frontier keys directly. nofollow is the link-expansion
    gate, canonical the page-side alias signal complementing
    alias_collapse. Planted: 36 pages cycling six adversarial HTML
    shapes incl. a token-boundary trap (noindexing)."""
    from dblp_crawler_spark.sources.webparse import html_meta_directives

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 36)
    hh = (F.col("doc_id") % 6).cast("string")
    html = F.lit(None).cast("string")
    for i, v in enumerate(_META_HTML_VARIANTS):
        parts = v.split("{i}")
        expr = F.lit(parts[0])
        for p in parts[1:]:
            expr = F.concat(expr, hh, F.lit(p))
        html = F.when(F.col("doc_id") % 6 == i, expr).otherwise(html)
    pages = docs.select(
        F.concat(
            F.lit("http://h"), hh, F.lit(".org/page/"), F.col("doc_id").cast("string")
        ).alias("url"),
        html.alias("html"),
    )
    return html_meta_directives(pages)


def q_host_shard_assign(spark, sf_dir):
    """Rendezvous (HRW) host → shard placement (scheduler.
    host_shards): shard = argmax over s of hash60(host, s), folded
    into one int64 MAX key — when the cluster resizes n→m shards,
    only hosts whose NEW shard wins move (expected n/m stay), where
    hash-mod placement reshuffles all but 1/m of the politeness
    state, bloom-bank buckets, and delay budgets that live with a
    host's shard. 97 planted hosts → 8 shards; the movement bound
    itself is pinned in tests/test_host_shards.py. The oracle
    replays the rendezvous key and the MAX fold."""
    from dblp_crawler_spark.operators.scheduler import host_shards

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    hosts = docs.select(
        F.format_string("h%d.example.org", F.pmod("doc_id", F.lit(97))).alias("host")
    )
    return host_shards(hosts, 8)


def q_robots_decide(spark, sf_dir):
    """RFC 9309 access decisions (scheduler.robots_decide over
    webparse.parse_robots_rules): longest-match precedence with
    Allow-wins-ties, '*' wildcards and the '$' end anchor — the
    semantics the prefix-only robots_status cannot express (e.g.
    `Allow: /private/pub*` overriding `Disallow: /private`). Planted:
    6 hosts cycling adversarial robots.txt shapes × 8 path cases per
    host; rules fan out host-keyed, the winner folds into one int64
    MAX key (spec*2 + is_allow) — no window. The oracle replays group
    parse, regex construction, and the precedence fold."""
    from dblp_crawler_spark.operators.scheduler import robots_decide
    from dblp_crawler_spark.sources.webparse import parse_robots_rules

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    hosts = docs.filter(F.col("doc_id") < 6)
    txt = F.lit(None).cast("string")
    for i, v in enumerate(_ROBOTS_RULE_VARIANTS):
        txt = F.when(F.col("doc_id") % 6 == i, F.lit(v)).otherwise(txt)
    pages = hosts.select(
        F.format_string("h%d.org", "doc_id").alias("host"), txt.alias("robots_txt")
    )
    cand = docs.filter(F.col("doc_id") < 48)
    path = F.lit(None).cast("string")
    for i, p in enumerate(_ROBOTS_RULE_PATHS):
        path = F.when(F.expr("doc_id div 6") == i, F.lit(p)).otherwise(path)
    urls = cand.select(
        F.concat(
            F.lit("http://h"), (F.col("doc_id") % 6).cast("string"), F.lit(".org"), path
        ).alias("url")
    )
    return robots_decide(urls, parse_robots_rules(pages))


def _planted_sitemap_pages(docs):
    """Shared planted per-host urlset XML (raw-spelling locs,
    lastmod on 4 of 5 records) used by q_sitemap_discover and
    q_fetch_plan — kept in one place so their oracles stay aligned."""
    hh = (F.col("doc_id") % 40).cast("string")
    did = F.col("doc_id").cast("string")
    lm = F.concat(
        F.lit("2024-"),
        F.lpad(((F.col("doc_id") % 12) + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0"),
    )
    blk = F.concat(
        F.lit("<url><loc>HTTP://H"), hh, F.lit(".ORG:80/page/"), did,
        F.lit("/#frag</loc>"),
        F.when(
            F.col("doc_id") % 5 != 0,
            F.concat(F.lit("<lastmod>"), lm, F.lit("</lastmod>")),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    return (
        docs.select(F.concat(F.lit("h"), hh, F.lit(".org")).alias("host"), blk.alias("blk"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.array_join(F.sort_array(F.collect_list("blk")), ""),
                F.lit("</urlset>"),
            ).alias("sitemap_xml")
        )
    )


def _planted_canonical_urls(docs, mod: int):
    """Canonical spellings of every `mod`-th planted page URL."""
    hh = (F.col("doc_id") % 40).cast("string")
    did = F.col("doc_id").cast("string")
    return docs.filter(F.col("doc_id") % mod == 0).select(
        F.concat(F.lit("http://h"), hh, F.lit(".org/page/"), did).alias("url")
    )


def q_sitemap_discover(spark, sf_dir):
    """Sitemap-driven frontier discovery (sources/webparse.
    sitemap_entries): per-host urlset XML is synthesized from the
    documents table (raw-spelling <loc>s — uppercase scheme/host,
    explicit :80, trailing slash, fragment — plus <lastmod> on 4 of
    5 records), parsed back into (url, lastmod DATE|NULL) records,
    and anti-joined against a planted canonical seen set — the bulk
    discovery channel next to robots_parse, keyed on CANONICAL form
    so re-spelled locs can never re-enter the frontier. The DuckDB
    oracle replays the whole round trip (sitemap_entries_sql +
    canonical_url_sql)."""
    from dblp_crawler_spark.sources.webparse import sitemap_entries

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    pages = _planted_sitemap_pages(docs)
    seen = _planted_canonical_urls(docs, 3)
    return sitemap_entries(pages).join(seen, "url", "left_anti")


def q_fetch_plan(spark, sf_dir):
    """Discovery-side freshness triage (operators/recrawl.
    fetch_plan): the parsed sitemap entries (url, lastmod|NULL) join
    the fetch state (every 3rd page fetched on 2024-06-15) and split
    into fetch / revalidate / skip — never-fetched and
    sitemap-says-changed URLs are fetched, fetched-but-lastmod-less
    URLs get a conditional GET, and provably-fresh URLs cost zero
    bytes BEFORE scheduling spends politeness budget on them. ONE
    url-keyed left join; DuckDB replays parse, state, and the CASE
    exactly."""
    from dblp_crawler_spark.operators.recrawl import fetch_plan
    from dblp_crawler_spark.sources.webparse import sitemap_entries

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    ent = sitemap_entries(_planted_sitemap_pages(docs)).select("url", "lastmod")
    state = _planted_canonical_urls(docs, 3).select(
        "url", F.to_date(F.lit("2024-06-15")).alias("last_fetch")
    )
    return fetch_plan(ent, state)


def q_sitemap_index_expand(spark, sf_dir):
    """Two-level sitemap discovery (webparse.sitemap_index_urls +
    sitemap_entries): each host shards its urlset into two child
    sitemaps behind a sitemapindex (the 50k-URL protocol cap forces
    this nesting on real sites); the pipeline extracts raw-spelled
    child locs from the index, joins them CANONICALIZED against the
    fetched page store, and parses the child bodies into page URLs —
    proving the index tier round-trips through the same
    canonical-join discipline as page discovery. Fully replayed by
    DuckDB (sitemap_index_urls_sql + sitemap_entries_sql)."""
    from dblp_crawler_spark.sources.webparse import sitemap_entries, sitemap_index_urls

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    hh = (F.col("doc_id") % 40).cast("string")
    did = F.col("doc_id").cast("string")
    cc = (F.col("doc_id") % 2).cast("string")
    urlblk = F.concat(
        F.lit("<url><loc>HTTP://H"), hh, F.lit(".ORG:80/page/"), did,
        F.lit("/#f</loc></url>"),
    )
    children = (
        docs.select(
            F.concat(F.lit("http://h"), hh, F.lit(".org/sitemap"), cc, F.lit(".xml")).alias("url"),
            urlblk.alias("blk"),
        )
        .groupBy("url")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.array_join(F.sort_array(F.collect_list("blk")), ""),
                F.lit("</urlset>"),
            ).alias("xml")
        )
    )
    idxblk = F.concat(
        F.lit("<sitemap><loc>HTTP://H"), hh, F.lit(".ORG:80/sitemap"), cc,
        F.lit(".xml</loc></sitemap>"),
    )
    index = (
        docs.select(F.concat(F.lit("h"), hh, F.lit(".org")).alias("host"), idxblk.alias("blk"))
        .distinct()
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<sitemapindex>"),
                F.array_join(F.sort_array(F.collect_list("blk")), ""),
                F.lit("</sitemapindex>"),
            ).alias("sitemap_xml")
        )
    )
    fetched = (
        sitemap_index_urls(index)
        .join(children, F.col("sitemap_url") == F.col("url"))
        .select("host", F.col("xml").alias("sitemap_xml"))
    )
    return sitemap_entries(fetched).select("host", "url")


def q_warc_parse(spark, sf_dir):
    """Text-mode WARC/1.0 segment parsing (sources/webparse.
    warc_records): per-host segments are synthesized from the
    documents table (one response record per doc, every 9th record
    declaring 5 bytes MORE than its payload — a torn write), parsed
    back into (uri, rec_type, content_length, body, truncated)
    records with the payload clipped to the declared length — the
    Common Crawl-style ingestion tier plus the declared-vs-actual
    audit a resumable fetcher runs before trusting a segment. DuckDB
    replays the round trip via warc_records_sql."""
    from dblp_crawler_spark.sources.webparse import warc_records

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    hh = (F.col("doc_id") % 40).cast("string")
    body = F.substring("text", 1, 64)
    cl = F.length(body) + F.when(F.col("doc_id") % 9 == 0, F.lit(5)).otherwise(F.lit(0))
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://h"),
        hh, F.lit(".org/page/"), F.col("doc_id").cast("string"),
        F.lit("\r\nContent-Length: "), cl.cast("string"),
        F.lit("\r\n\r\n"), body, F.lit("\r\n\r\n"),
    )
    segs = (
        docs.select(F.concat(F.lit("h"), hh, F.lit(".org")).alias("host"), rec.alias("rec"))
        .groupBy("host")
        .agg(F.array_join(F.sort_array(F.collect_list("rec")), "").alias("warc"))
    )
    return warc_records(segs)


def q_image_header_dims(spark, sf_dir):
    """Header-only image dimensions (operators/sniff.image_dims): the
    resolution prefilter that must run BEFORE bytes reach a decoder —
    png IHDR (BE), gif logical screen (LE), bmp info header (LE), and
    a bounded JPEG SOF segment walk (1 or 2 APP0 segments planted by
    id parity, exercising multi-hop). Payloads are real-format headers
    synthesized from doc_id via printf-hex (portable), parsed back as
    pure expressions over ONE 64-byte hex projection — blobs never
    shuffle, no UDF, no decode. DuckDB replays construction and parse
    (image_dims_sql, generated from the same offsets)."""
    from dblp_crawler_spark.operators.sniff import image_dims

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    w = (F.col("doc_id") % 900 + 100).cast("long")
    h = ((F.col("doc_id") * 7) % 900 + 100).cast("long")

    def be(c, n):
        return F.format_string(f"%0{n}X", c)

    def le(c, n_bytes):
        parts = [((c / F.lit(256**i)).cast("long") % 256).cast("int") for i in range(n_bytes)]
        return F.format_string("%02X" * n_bytes, *parts)

    app0 = "FFE0" + "0010" + "4A46494600" + "00" * 9
    sof = F.concat(F.lit("FFC0" + "0011" + "08"), be(h, 4), be(w, 4), F.lit("03" + "00" * 9))
    hexstr = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("89504E470D0A1A0A" + "0000000D49484452"),
                        be(w, 8), be(h, 8), F.lit("0806")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("474946383961"), le(w, 2), le(h, 2), F.lit("F70000")))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("424D" + "00" * 16), le(w, 4), le(h, 4), F.lit("00" * 4)))
        .otherwise(
            F.concat(F.lit("FFD8"), F.lit(app0),
                     F.when(F.col("doc_id") % 8 == 7, F.lit(app0)).otherwise(F.lit("")),
                     sof))
    )
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return image_dims(imgs).select("doc_id", "fmt", "width", "height")


def q_html_text_extract(spark, sf_dir):
    """HTML boilerplate strip (sources/webparse.html_to_text): the
    fetch→curation hand-off — script/style/comments removed, tags
    dropped, entities decoded, whitespace collapsed, all as one
    codegen-fused regexp chain over planted pages wrapping each
    document's text in markup. The DuckDB oracle replays the exact
    fragment (html_to_text_sql)."""
    from dblp_crawler_spark.sources.webparse import html_to_text

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><script>var x = 1;</script><style>.a{}</style></head>"
              "<body><h1>Doc &amp; "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><!-- c --><p>"),
        F.col("text"),
        F.lit("&nbsp;&lt;end&gt;</p></body></html>"),
    )
    pages = docs.select("doc_id", html.alias("html"))
    return pages.select(
        "doc_id",
        html_to_text("html").alias("text"),
    ).withColumn("n_chars", F.length("text").cast("long"))


def q_line_dedup(spark, sf_dir):
    """Corpus-frequency line boilerplate removal (CCNet/C4 pass,
    textstats.strip_common_lines): planted 4-line pages — a unique
    id line, a footer shared by EVERY page, the document body, and a
    per-language nav line — must lose exactly the >=5-frequency
    lines while keeping survivors in order; the all-hash agg keeps
    line text out of the corpus-wide shuffle. Fully replayed by the
    DuckDB oracle (hash60 line hashes, string_agg ORDER BY pos)."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("id: "), F.col("doc_id").cast("string"), F.lit("\n"),
            F.lit("COMMON FOOTER"), F.lit("\n"),
            F.col("text"), F.lit("\n"),
            F.lit("lang: "), F.col("lang"),
        ).alias("text"),
    )
    return T.strip_common_lines(planted, min_count=5, hash_fn=hash60)


def q_redirect_resolve(spark, sf_dir):
    """Transitive redirect resolution before frontier admission
    (operators/redirects.py): planted 10-node chains ending at a
    terminal plus 10-node cycles (every 20th block), walked under a
    12-hop cap — chains resolve to their block terminal with exact
    hop counts, cycles cap out resolved=false exactly like an HTTP
    client's too-many-redirects. One equi-join per round against the
    functional redirect map, Observation-terminated. Oracle: a
    recursive CTE walking the same map to the same cap, max_by(cur,
    hops) per src."""
    from dblp_crawler_spark.operators.redirects import resolve_redirects

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    chain = docs.filter(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 1).alias("dst")
    )
    cycle = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 9).alias("dst")
    )
    return resolve_redirects(chain.union(cycle), max_hops=12)


def q_url_trap_filter(spark, sf_dir):
    """Spider-trap triage before frontier admission
    (functions/urlnorm.url_trap_flags): planted per-doc URLs cycling
    clean / 10-deep path / repeated-segment loop / PHPSESSID alias /
    calendar archive; the report is per-host counts of each trap
    class. Pure projection + one hash agg; DuckDB replays the exact
    heuristics (url_trap_flags_sql)."""
    from dblp_crawler_spark.functions.urlnorm import url_host, url_trap_flags

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    k = (F.col("doc_id") % 50).cast("string")
    v = F.col("doc_id") % 5
    deep_path = "/" + "/".join(f"p{i}" for i in range(10))
    url = (
        F.when(v == 0, F.concat(F.lit("http://h"), k, F.lit(".org/a/b?x=1")))
        .when(v == 1, F.concat(F.lit("http://h"), k, F.lit(".org" + deep_path)))
        .when(v == 2, F.concat(F.lit("http://h"), k, F.lit(".org/cat/page/cat/page/cat")))
        .when(v == 3, F.concat(F.lit("http://h"), k, F.lit(".org/a?PHPSESSID=abc&x=1")))
        .otherwise(F.concat(F.lit("http://h"), k, F.lit(".org/2020/01/2020/02/x")))
    )
    flagged = docs.select(url.alias("url")).select(
        url_host("url").alias("host"), url_trap_flags("url").alias("t")
    )
    return flagged.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.col("t.deep_path").cast("int")).alias("n_deep"),
        F.sum(F.col("t.repeated_segments").cast("int")).alias("n_repeat"),
        F.sum(F.col("t.session_param").cast("int")).alias("n_session"),
        F.sum(F.col("t.calendar_loop").cast("int")).alias("n_calendar"),
        F.sum(F.col("t.is_trap").cast("int")).alias("n_trapped"),
    )


def q_frontier_admission(spark, sf_dir):
    """The composed open-web admission path
    (operators/frontier.admit_candidates — north_rule:
    "canonicalizes and hashes candidate URLs, tests membership
    against a ... URL-seen filter"): six planted spellings per doc
    (five aliases/variants + one session-id trap) are canonicalized,
    trap-dropped, batch-deduped on the hash60 seen key, and
    anti-joined against a planted persistent seen set (every 4th
    host's main page already crawled). Output is SF-independent by
    construction — the dedup collapses document multiplicity — which
    itself proves the collapse happened. Fully SQL-replayed."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.frontier import admit_candidates

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    k = (F.col("doc_id") % 50).cast("string")
    variants = F.array(
        F.concat(F.lit("http://example"), k, F.lit(".org/path/"), k, F.lit("?b=2&a=1")),
        F.concat(F.lit("HTTP://EXAMPLE"), k, F.lit(".ORG:80/path/"), k, F.lit("/?a=1&b=2#frag")),
        F.concat(F.lit("http://example"), k, F.lit(".org/path/"), k, F.lit("#sec")),
        F.concat(F.lit("https://example"), k, F.lit(".org:443/other/"), k),
        F.concat(F.lit("https://example"), k, F.lit(".org/other/"), k, F.lit("?")),
        F.concat(F.lit("http://example"), k, F.lit(".org/a?PHPSESSID=x")),
    )
    cand = docs.select(F.explode(variants).alias("url"))
    seen = docs.filter((F.col("doc_id") % 50) % 4 == 0).select(
        hash60(
            F.concat(F.lit("http://example"), k, F.lit(".org/path/"), k, F.lit("?a=1&b=2"))
        ).alias("seen_key")
    )
    return admit_candidates(cand, seen, hash_fn=hash60)


def q_video_scene_cuts(spark, sf_dir):
    """Shot-boundary segmentation on stored per-frame phashes
    (multimodal.scene_cuts): 8 planted frames per video in three
    scenes (portable-hash base per scene, small XOR jitter within),
    cut where adjacent hamming > 10. One window per video, frame
    bytes never in the plan. Oracle replays lag + running-sum
    islands + bit_count(xor) exactly."""
    from dblp_crawler_spark.functions.hashing import HASH60_SEP
    from dblp_crawler_spark.operators.multimodal import scene_cuts

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    frames = docs.select(
        F.col("doc_id").alias("video_id"),
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("frame_idx"),
    )
    scene = F.expr("frame_idx div 3").cast("string")
    base = F.conv(
        F.substring(
            F.md5(F.concat(F.col("video_id").cast("string"), F.lit(HASH60_SEP), scene)),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    planted = frames.withColumn(
        "phash", base.bitwiseXOR((F.col("frame_idx") % 3).cast("long"))
    )
    return scene_cuts(planted, max_hamming=10)


_VTT_A_PRE = ("WEBVTT\n\n00:01.000 --> 00:03.500 align:start\n"
              "<v N>alpha ")
_VTT_A_POST = "\n\n01:02:03.456 --> 01:02:04.000\nbeta\ngamma\n"
_VTT_B_PRE = "WEBVTT\n\nNOTE nothing\n\n00:00.100 --> 00:00.200\nsolo "
_VTT_B_POST = "\n"
_VTT_NONE = "WEBVTT\n\nno cues"


def q_webvtt_cues(spark, sf_dir):
    """WebVTT cue parsing (subtitles.webvtt_cues): caption tracks are
    the only video/language alignment a crawler gets without ASR —
    cue blocks to (cue_idx, start_ms, end_ms, text) with exact
    integer millisecond timestamps (hours optional and unbounded),
    styling/voice tags stripped, multi-line payloads joined, NOTE
    blocks and cue-less files contributing nothing. Pure regexp +
    one posexplode, map-side."""
    from dblp_crawler_spark.sources.subtitles import webvtt_cues

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    vtt = (
        F.when(m == 0, F.concat(F.lit(_VTT_A_PRE), sid, F.lit(_VTT_A_POST)))
        .when(m == 1, F.concat(F.lit(_VTT_B_PRE), sid, F.lit(_VTT_B_POST)))
        .otherwise(F.lit(_VTT_NONE))
    )
    files = docs.select(F.col("doc_id").alias("video_id"), vtt.alias("vtt"))
    return webvtt_cues(files)


def q_pipeline_video_text(spark, sf_dir):
    """Composed video→text sample mining in ONE plan — the video
    analog of pipeline_image_harvest: stored frame phashes →
    scene_segments (lag + running-sum islands, ONE window per video,
    no frame bytes) → webvtt_cues on the video's caption track →
    scene_transcripts (interval-overlap on the video_id equi-join,
    cue-order string agg). Each output row is a mintable training
    sample: (video, scene, time span, transcript). Planted: 8
    frames/video in three 3-3-2 scenes at 1000 ms cadence; cues at
    fixed times with one cue STRADDLING the scene-1/2 cut (it must
    appear in both transcripts) and scene 3 silent for every third
    video. The DuckDB replay chains the same three fragments."""
    from dblp_crawler_spark.functions.hashing import HASH60_SEP
    from dblp_crawler_spark.operators.multimodal import (
        scene_segments,
        scene_transcripts,
    )
    from dblp_crawler_spark.sources.subtitles import webvtt_cues

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    frames = docs.select(
        F.col("doc_id").alias("video_id"),
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("frame_idx"),
    )
    scene = F.expr("frame_idx div 3").cast("string")
    base = F.conv(
        F.substring(
            F.md5(F.concat(F.col("video_id").cast("string"),
                           F.lit(HASH60_SEP), scene)),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    planted = frames.withColumns(
        {
            "phash": base.bitwiseXOR((F.col("frame_idx") % 3).cast("long")),
            "ts_ms": (F.col("frame_idx") * F.lit(1000)).cast("long"),
        }
    )
    segs = scene_segments(planted, max_hamming=10)

    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    vtt = F.concat(
        F.lit("WEBVTT\n\n00:00.500 --> 00:01.200\nopen "), sid,
        # straddles the scene-1 (ts 0..2000) / scene-2 (3000..5000) cut
        F.lit("\n\n00:01.800 --> 00:03.300\nbridge "), sid,
        F.when(m != 2,
               F.concat(F.lit("\n\n00:06.100 --> 00:07.000\nclose "), sid))
        .otherwise(F.lit("")),
        F.lit("\n"),
    )
    files = docs.select(F.col("doc_id").alias("video_id"), vtt.alias("vtt"))
    cues = webvtt_cues(files)
    return scene_transcripts(segs, cues)


_SRT_PRE = "1\n00:00:01,000 --> 00:00:03,500\n<i>seg</i> "
_SRT_MID = "\n\n9\n00:01:00,250 --> 01:00:00,000\nmore "
_SRT_POST = "\n"


def q_srt_cues(spark, sf_dir):
    """SubRip parsing (subtitles.srt_cues): the other dominant
    subtitle format — comma decimal separator, mandatory hours,
    numbered cues whose declared numbers are IGNORED (wild files
    skip and repeat them; position is the only trustworthy index).
    Output contract byte-identical to webvtt_cues so
    scene_transcripts consumes either."""
    from dblp_crawler_spark.sources.subtitles import srt_cues

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    srt = F.when(
        F.col("doc_id") % 3 == 2, F.lit("no cues here")
    ).otherwise(
        F.concat(F.lit(_SRT_PRE), sid, F.lit(_SRT_MID), sid,
                 F.lit(_SRT_POST))
    )
    files = docs.select(F.col("doc_id").alias("video_id"), srt.alias("srt"))
    return srt_cues(files)


def q_jsonld_image_license(spark, sf_dir):
    """JSON-LD ImageObject mining (webparse.jsonld_images): the one
    channel that carries image LICENSE metadata — schema.org's
    license + acquireLicensePage (the fields Google's image-license
    program indexes), plus creditText/creator attribution; a
    compliance-clean image dataset needs these at mining time, not
    after a takedown. Script blocks cut by regex, payload parsed
    with real JSON functions on BOTH engines (never regex over
    JSON). Planted: a fully-attributed CC block, a NewsArticle
    block (dropped), a url-fallback block, and an invalid-JSON
    block (NULL-absorbed)."""
    from dblp_crawler_spark.sources.webparse import jsonld_images

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org/a/p"), sid)
    b1 = F.concat(
        F.lit('{"@type":"ImageObject","contentUrl":"/ph/c'), sid,
        F.lit('.jpg","caption":"photo '), sid,
        F.lit('","license":"https://creativecommons.org/licenses/by/4.0/",'
              '"creditText":"Agency","creator":{"name":"Ann '), sid,
        F.lit('"}}'),
    )
    b2 = F.lit('{"@type":"NewsArticle","headline":"x"}')
    b3 = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit('{"@type":"ImageObject","url":"https://cdn'),
                 (F.col("doc_id") % 5).cast("string"),
                 F.lit(".net/u"), sid, F.lit('.png"}')),
    ).otherwise(F.lit('{"@type":"ImageObject", broken'))
    html = F.concat(
        F.lit('<script type="application/ld+json">'), b1, F.lit("</script>"),
        F.lit('<script type="application/ld+json">'), b2, F.lit("</script>"),
        F.lit('<script type="application/ld+json">'), b3, F.lit("</script>"),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return jsonld_images(pages)


_HLS_MASTER_PRE = ("#EXTM3U\n"
                   "#EXT-X-STREAM-INF:BANDWIDTH=800000,RESOLUTION=640x360\n"
                   "low/")
_HLS_MASTER_MID = (".m3u8\n#EXT-X-STREAM-INF:BANDWIDTH=2500000,"
                   "RESOLUTION=1280x720\nmid/")
_HLS_MASTER_POST = ".m3u8\n"
_HLS_VOD_PRE = "#EXTM3U\n#EXT-X-TARGETDURATION:10\n#EXTINF:9.009,\nsa"
_HLS_VOD_MID = ".ts\n#EXTINF:10,\nsb"
_HLS_VOD_POST = ".ts\n#EXT-X-ENDLIST\n"
_HLS_LIVE_PRE = "#EXTM3U\n#EXTINF:6.0,\nlv"
_HLS_LIVE_POST = ".ts\n"


def _hls_files(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    m3u8 = (
        F.when(m == 0, F.concat(F.lit(_HLS_MASTER_PRE), sid,
                                F.lit(_HLS_MASTER_MID), sid,
                                F.lit(_HLS_MASTER_POST)))
        .when(m == 1, F.concat(F.lit(_HLS_VOD_PRE), sid,
                               F.lit(_HLS_VOD_MID), sid,
                               F.lit(_HLS_VOD_POST)))
        .otherwise(F.concat(F.lit(_HLS_LIVE_PRE), sid,
                            F.lit(_HLS_LIVE_POST)))
    )
    url = F.concat(F.lit("https://v"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".ex.org/s"), sid, F.lit("/index.m3u8"))
    return docs.select(url.alias("url"), m3u8.alias("m3u8"))


def q_hls_segments(spark, sf_dir):
    """HLS media-segment extraction (hls.hls_segments): web video
    ships as .m3u8 playlists, not .mp4 files — segment URIs resolve
    against the playlist URL and EXTINF decimal seconds parse to
    EXACT integer milliseconds (9.009 → 9009), the unit a fetch
    scheduler and a transcription budget both consume."""
    from dblp_crawler_spark.sources.hls import hls_segments

    return hls_segments(_hls_files(spark, sf_dir))


def q_hls_playlist(spark, sf_dir):
    """HLS playlist routing summary (hls.hls_playlist): master vs
    media via RFC 8216's mutually-exclusive tag sets, the bitrate
    ladder's max bandwidth, exact total duration from summed EXTINF
    fragments, and the VOD/live split (EXT-X-ENDLIST) that decides
    harvestability — one projection over the playlist text, counts
    and sums from the same regexp arrays the exploding extractors
    use, no join back."""
    from dblp_crawler_spark.sources.hls import hls_playlist

    return hls_playlist(_hls_files(spark, sf_dir))


def q_hls_variants(spark, sf_dir):
    """HLS master-playlist variant ladder (hls.hls_variants): one
    row per rendition with bandwidth + declared resolution — the
    table a harvester picks its fetch tier from (highest resolution
    worth the bytes, or lowest for contact-sheet sampling)."""
    from dblp_crawler_spark.sources.hls import hls_variants

    return hls_variants(_hls_files(spark, sf_dir))


def q_pipeline_av_discovery(spark, sf_dir):
    """Composed audio/video discovery in ONE plan — the AV-axis
    integration statement, sibling of pipeline_image_discovery:
    video-sitemap declarations (sitemap_videos) equi-joined to the
    fetched playlist store keyed by the declared URL, routed by
    hls_playlist (master / VOD / live / missing), and rolled up per
    host: how much of the declared inventory is fetchable VOD, how
    many declared minutes of content the host really offers. Every
    stage is an oracled operator; the replay chains the same
    fragments. Planted: every third declaration has no fetched
    playlist (coverage gap), the rest cycle master/VOD/live."""
    from dblp_crawler_spark.sources.hls import hls_playlist
    from dblp_crawler_spark.sources.webparse import sitemap_videos

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id").cast("string")
    hh = (F.col("doc_id") % 10).cast("string")
    xml = F.concat(
        F.lit("<urlset><url><loc>https://h"), hh, F.lit(".org/w/"), d,
        F.lit("</loc><video:video><video:content_loc>https://cdn"), hh,
        F.lit(".net/v/"), d,
        F.lit(".m3u8</video:content_loc><video:title>Clip "), d,
        F.lit("</video:title></video:video></url></urlset>"),
    )
    sm_pages = docs.select(
        F.concat(F.lit("h"), hh, F.lit(".org")).alias("host"),
        xml.alias("sitemap_xml"))
    declared = sitemap_videos(sm_pages)

    m = F.col("doc_id") % 3
    m3u8 = (
        F.when(m == 1, F.concat(F.lit(_HLS_VOD_PRE), d,
                                F.lit(_HLS_VOD_MID), d,
                                F.lit(_HLS_VOD_POST)))
        .when(F.col("doc_id") % 2 == 0,
              F.concat(F.lit(_HLS_MASTER_PRE), d,
                       F.lit(_HLS_MASTER_MID), d,
                       F.lit(_HLS_MASTER_POST)))
        .otherwise(F.concat(F.lit(_HLS_LIVE_PRE), d,
                            F.lit(_HLS_LIVE_POST)))
    )
    store = docs.where(m != 0).select(
        F.concat(F.lit("https://cdn"), hh, F.lit(".net/v/"), d,
                 F.lit(".m3u8")).alias("url"),
        m3u8.alias("m3u8"),
    )
    routed = hls_playlist(store)
    j = declared.join(
        routed, declared["video_url"] == routed["url"], "left"
    )
    return j.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_declared"),
        F.count("kind").alias("n_fetched"),
        F.sum(F.when((F.col("kind") == "media") & ~F.col("live"), 1)
              .otherwise(0)).alias("n_vod"),
        F.sum(F.when(F.coalesce(F.col("live"), F.lit(False)), 1)
              .otherwise(0)).alias("n_live"),
        F.sum(F.when(F.col("kind") == "master", 1).otherwise(0))
        .alias("n_master"),
        F.coalesce(
            F.sum(F.when((F.col("kind") == "media") & ~F.col("live"),
                         F.col("total_duration_ms")).otherwise(F.lit(0))),
            F.lit(0),
        ).alias("vod_duration_ms"),
    )


_HLS_LANGS = ["en", "de", "fr", "es"]


def q_hls_media_renditions(spark, sf_dir):
    """HLS alternate renditions (hls.hls_media_renditions): master
    playlists declare audio tracks and SUBTITLE tracks as
    EXT-X-MEDIA lines with a LANGUAGE attribute — the discovery
    channel telling a multilingual corpus which caption languages
    exist BEFORE fetching anything. Muxed audio (URI-less) yields a
    NULL rendition_url; subtitle URIs resolve against the master."""
    from dblp_crawler_spark.sources.hls import hls_media_renditions

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _HLS_LANGS]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    m3u8 = F.concat(
        F.lit('#EXTM3U\n#EXT-X-MEDIA:TYPE=AUDIO,GROUP-ID="aud",'
              'NAME="Main",LANGUAGE="en",DEFAULT=YES\n'
              '#EXT-X-MEDIA:TYPE=SUBTITLES,GROUP-ID="subs",NAME="T",'
              'LANGUAGE="'), lang,
        F.lit('",DEFAULT=NO,URI="subs/'), lang, F.lit("-"), sid,
        F.lit('.vtt"\n#EXT-X-STREAM-INF:BANDWIDTH=800000\nlow.m3u8\n'),
    )
    url = F.concat(F.lit("https://v"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".ex.org/m"), sid, F.lit("/master.m3u8"))
    return hls_media_renditions(
        docs.select(url.alias("url"), m3u8.alias("m3u8")))


def q_pipeline_subtitle_harvest(spark, sf_dir):
    """Composed multilingual subtitle harvest in ONE plan: master
    playlists → hls_media_renditions (SUBTITLES tracks with their
    LANGUAGE) → equi-join the fetched caption-track store on the
    resolved rendition URL → webvtt_cues → per-language inventory
    (tracks, cues, total caption milliseconds) — the table a
    multilingual video-text corpus budgets transcription-free
    supervision from. Every stage an oracled fragment; the replay
    chains the same three. Planted: every fifth declared track
    missing from the store (fetch gap)."""
    from dblp_crawler_spark.sources.hls import hls_media_renditions
    from dblp_crawler_spark.sources.subtitles import webvtt_cues

    rends = q_hls_media_renditions(spark, sf_dir).where(
        F.col("type") == "SUBTITLES"
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _HLS_LANGS]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    vtt_url = F.concat(
        F.lit("https://v"), (F.col("doc_id") % 10).cast("string"),
        F.lit(".ex.org/m"), sid, F.lit("/subs/"), lang, F.lit("-"), sid,
        F.lit(".vtt"),
    )
    dur_s = (F.col("doc_id") % 7 + 2).cast("string")
    vtt = F.concat(
        F.lit("WEBVTT\n\n00:01.000 --> 00:0"), dur_s,
        F.lit(".000\nhello "), sid,
        F.lit("\n\n01:00.000 --> 01:30.500\nworld "), sid, F.lit("\n"),
    )
    store = docs.where(F.col("doc_id") % 5 != 0).select(
        vtt_url.alias("vtt_url"), vtt.alias("vtt"))
    cues = webvtt_cues(store, keep=["vtt_url"])
    j = rends.join(cues, rends["rendition_url"] == cues["vtt_url"], "left")
    return j.groupBy("language").agg(
        F.count_distinct(F.col("rendition_url")).alias("n_declared_tracks"),
        F.count_distinct(F.col("vtt_url")).alias("n_fetched_tracks"),
        F.count(F.col("cue_idx")).alias("n_cues"),
        F.coalesce(
            F.sum(F.col("end_ms") - F.col("start_ms")), F.lit(0)
        ).cast("long").alias("caption_ms"),
    )


def q_events_asof_attribution(spark, sf_dir):
    """As-of join: each click attributes to the user's most recent
    strictly-preceding view (running last-ignorenulls window — one
    shuffle, linear per user; no range join)."""
    ev = _t(spark, sf_dir, "events")
    return E.asof_attribute(ev, anchor_type="click", attr_type="view")


def q_events_range_join(spark, sf_dir):
    """Range join (banded): purchases within 30 min after a click,
    same user — equi-join on (user, Δ-bin) + exact inequality
    filter; never a per-user nested loop."""
    ev = _t(spark, sf_dir, "events")
    return E.range_follow_join(ev, anchor_type="click", follow_type="purchase", within_minutes=30)


def q_events_hypertable_rollup(spark, sf_dir):
    """Continuous-aggregate rollup: day stats composed from hour
    partials composed from minute partials (sum-of-sums; one raw
    scan at the finest level only)."""
    ev = _t(spark, sf_dir, "events")
    return E.hypertable_rollup(ev)


def q_sketch_distinct_users(spark, sf_dir):
    """Mergeable HLL distinct sketch (pure expressions): estimated
    distinct users per event_type, on the portable hash family so
    the DuckDB oracle replays registers AND estimate. The harmonic
    sum is an exact scaled-integer aggregate (hll_estimate), so the
    estimate is bit-deterministic across partitionings and engines;
    the only residual fp is deterministic scalar arithmetic.
    xxhash64 stays the library default (registers value-pinned in
    tests/test_sketch.py)."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.sketch import hll_build, hll_estimate

    ev = _t(spark, sf_dir, "events")
    sk = hll_build(ev, "user_id", ["event_type"], p=12, hash_fn=hash60, hash_bits=60)
    return hll_estimate(sk, p=12, hash_bits=60)


def q_sketch_heavy_hitters(spark, sf_dir):
    """Count-min heavy hitters (pure expressions, integer counters —
    exact deterministic aggregation): top estimated-activity users
    from the sketch alone, on the portable hash family so the DuckDB
    oracle replays the counters and the min-over-rows query exactly.
    Never-underestimate + exact-merge pinned in tests/test_sketch.py."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.sketch import cms_build, cms_query

    ev = _t(spark, sf_dir, "events")
    sk = cms_build(ev, "user_id", hash_fn=hash60)
    est = cms_query(sk, ev.select("user_id").distinct(), "user_id", hash_fn=hash60)
    return est.orderBy(F.desc("cnt_est"), F.asc("user_id")).limit(10)


def q_text_bpe_tokens(spark, sf_dir):
    """BPE-ish pre-tokenizer counts per source (letter/digit runs +
    punctuation marks); exact integer SUM/COUNT avg like
    text_token_count."""
    docs = _t(spark, sf_dir, "documents")
    n = T.bpe_token_count("text")
    return docs.groupBy("source").agg(
        F.sum(n).alias("total_bpe_tokens"),
        F.round(F.sum(n) / F.count(F.lit(1)), 4).alias("avg_bpe_tokens"),
    )


def q_metrics_rollup(spark, sf_dir):
    """A1/A7: per-class counters."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.count_distinct("user_id").alias("n_users"),
    )


# ---- training-pipeline family ---------------------------------------------
def q_dedup_exact(spark, sf_dir):
    """Exact dedup groups on a 40-char text prefix (hash groupBy)."""
    docs = _t(spark, sf_dir, "documents")
    pfx = docs.select(F.col("doc_id"), F.substring("text", 1, 40).alias("pfx"))
    return D.exact_dup_groups(pfx, text_col="pfx", id_col="doc_id")


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Blocked 3-gram Jaccard near-dup pairs."""
    docs = _t(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, block_col="source", n=3, threshold=0.2)


def q_dedup_containment(spark, sf_dir):
    """Asymmetric shingle-containment excerpt detection
    (operators/dedup.py:containment_pairs): for every 17th doc a
    derived excerpt (front half of its text, shifted id) is unioned
    in, and the operator must flag each excerpt→original pair with
    cont_a ≈ 1 even where Jaccard sits near 0.5 — the direction-
    sensitive signal symmetric near-dup passes can't give. Planted
    excerpts are pure substring arithmetic, so the DuckDB oracle
    replays the whole pipeline exactly."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    planted = docs.filter(F.col("doc_id") % 17 == 3).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "source",
        F.expr("substring(text, 1, length(text) div 2)").alias("text"),
    )
    return D.containment_pairs(
        docs.unionByName(planted), block_col="source", n=3, threshold=0.6
    )


def q_dedup_editdist(spark, sf_dir):
    """Character-level near-dup verification (operators/dedup.
    edit_distance_pairs): every 29th doc gets a planted single-char
    edit copy — invisible to word-shingle Jaccard (no whole token
    changes) but at Levenshtein distance exactly 1, the OCR-noise/
    typo tier. Prefix-bounded (80 chars) blocked-quadratic verifier;
    levenshtein is the same textbook DP in Spark and DuckDB, so the
    oracle replays distances exactly."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    edited = docs.filter(F.col("doc_id") % 29 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "source",
        F.concat(
            F.substring("text", 1, 10), F.lit("#"), F.expr("substring(text, 12)")
        ).alias("text"),
    )
    return D.edit_distance_pairs(
        docs.unionByName(edited), block_col="source", prefix=80, max_dist=8
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dups on the PORTABLE hash family
    (functions.hashing.hash60, md5-derived): the full pipeline —
    32 min-hash lanes → 8 band hashes → candidate equi-join → exact
    Jaccard verify — replays bit-identically in the DuckDB oracle.
    The xxhash64 fast path stays the library default and is
    value-pinned against a from-spec XXH64 in tests."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents")
    return D.minhash_near_dups(docs, num_hashes=32, bands=8, threshold=0.2, hash_fn=hash60)


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dups on the portable 60-bit hash family
    (hash_fn=hash60, bits=60): per-token hash → lane votes → packed
    simhash → prefix-block + hamming verify, all replayed by the
    DuckDB oracle. xxhash64/64-bit stays the library default."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs, max_hamming=8, prefix_bits=8, hash_fn=hash60, bits=60)


#: skip-and-flag cap for the simhash prefix-block pair guard: at
#: sf0.01 (the gate SF) 2 of 92 blocks overflow (82 and 32+ docs of
#: 500) so BOTH sides of the guard are exercised, and at any SF the
#: emitted pair stream is bounded by n_blocks * cap^2 / 2 — the r4
#: sf1 run measured 52M unguarded pairs on the homogeneous corpus.
SIMHASH_BLOCK_CAP = 32


def q_dedup_simhash_capped(spark, sf_dir):
    """SimHash near-dup with the PAIR-EXPLOSION GUARD (r4 verdict
    item 2): identical portable parameterization to `dedup_simhash`
    (hash60, 60 bits, prefix 8, hamming <= 8) plus max_block=32 —
    prefix blocks holding more than 32 docs are excluded from pair
    expansion (skip-and-flag; the flagged blocks are THE
    `dedup_simhash_overflow` entry), so candidate volume is bounded
    by 256 * 32^2/2 pairs regardless of corpus skew. Fully oracled:
    DuckDB replays fingerprints, blocking, the block-size gate, and
    the in-block hamming verify."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs, max_hamming=8, prefix_bits=8, hash_fn=hash60,
                               bits=60, max_block=SIMHASH_BLOCK_CAP)


def q_dedup_simhash_overflow(spark, sf_dir):
    """The flag half of the guard: (block, n_docs) for every simhash
    prefix block over the cap — the escalation worklist a production
    pass routes to a non-quadratic treatment (exact-hash dedup, the
    pigeonhole multi-block tier, or per-block sampling) instead of
    exploding. Together with `dedup_simhash_capped` this partitions
    the corpus's candidate mass exactly."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents")
    return D.simhash_block_overflow(docs, prefix_bits=8, hash_fn=hash60, bits=60,
                                    max_block=SIMHASH_BLOCK_CAP)


#: skip-and-flag cap for the minhash LSH band-bucket guard. The
#: driver's synthetic documents produce small buckets (max 3 at
#: sf0.01), so cap 2 exercises BOTH guard sides at the gate SF; on a
#: boilerplate-heavy production corpus the same cap bounds the
#: candidate stream at bands · n_buckets · cap²/2 (the planted-clique
#: behavior is pinned in tests/test_pair_guard.py::test_lsh_bucket_cap).
MINHASH_BUCKET_CAP = 2


def q_dedup_minhash_capped(spark, sf_dir):
    """MinHash+LSH with the band-bucket PAIR-EXPLOSION GUARD:
    identical portable parameterization to `dedup_minhash_lsh`
    (hash60, 32 lanes, 8 bands, Jaccard >= 0.2) plus max_bucket=2 —
    band buckets holding more docs are excluded from candidate
    expansion (skip-and-flag; the flagged buckets are THE
    `dedup_minhash_overflow` entry). Fully oracled: DuckDB replays
    signatures, banding, the bucket-size gate, the candidate join,
    and the exact-Jaccard verify."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents")
    return D.minhash_near_dups(docs, num_hashes=32, bands=8, threshold=0.2,
                               hash_fn=hash60, max_bucket=MINHASH_BUCKET_CAP)


def q_dedup_minhash_overflow(spark, sf_dir):
    """The flag half of the minhash guard: (band, band_hash, n_docs)
    for every LSH band bucket over the cap — the escalation worklist
    the capped entry skipped. Together the two entries partition the
    candidate mass exactly (same signatures, same banding)."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents")
    sigs = D.minhash_signature(docs, num_hashes=32, hash_fn=hash60)
    return D.lsh_bucket_overflow(sigs, bands=8, hash_fn=hash60,
                                 max_bucket=MINHASH_BUCKET_CAP)


def q_dedup_minhash_lsh_fast(spark, sf_dir):
    """The PRODUCTION-hash MinHash+LSH path: library-default
    xxhash64 lanes (JVM-side, one hash call per shingle per lane)
    instead of the md5-derived portable hash60 family the oracled
    `dedup_minhash_lsh` entry uses for bit-identical DuckDB replay.
    Same pipeline, same parameters — only the hash family differs,
    so this is the entry that benches the deployable speed (r2
    measured the xxhash64 path ~4x faster). Rows-only by design:
    DuckDB has no xxhash64, and the hash values themselves are
    value-pinned against a from-spec XXH64 reimplementation in
    tests/test_hash_oracle.py."""
    docs = _t(spark, sf_dir, "documents")
    return D.minhash_near_dups(docs, num_hashes=32, bands=8, threshold=0.2)


def q_dedup_simhash_fast(spark, sf_dir):
    """The production-hash SimHash path: library-default xxhash64 /
    64-bit fingerprints vs the oracled `dedup_simhash` entry's
    portable hash60/60-bit parameterization. Same per-token votes →
    packed fingerprint → prefix-block + hamming verify; rows-only by
    design (hash family pinned in tests/test_hash_oracle.py)."""
    docs = _t(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs, max_hamming=8, prefix_bits=8)


def q_embedding_near_dup(spark, sf_dir):
    """Cosine ≥ τ pairs, blocked by label. τ=0.3 here because the
    driver's embeddings table is synthetic and contains no planted
    near-dup pairs — at a real near-dup τ (0.8+) the result is empty
    at every SF and the oracle comparison would be vacuous. The
    operator's behavior at high τ is pinned separately on planted
    duplicates in tests/test_pipeline_ops.py."""
    emb = _t(spark, sf_dir, "embeddings")
    return D.embedding_near_dups(emb, block_col="label", threshold=0.3)


def q_embedding_near_dup_planted(spark, sf_dir):
    """Near-dup semantics at a MEANINGFUL τ (0.9): the driver's
    synthetic embeddings contain no natural near-dups, so every 10th
    vector is planted back with id+1000000 — each plant pairs with
    its source at cosine ~1.0. Exercises the high-τ path end-to-end
    with a DuckDB oracle over the identically-augmented input."""
    emb = _t(spark, sf_dir, "embeddings")
    plants = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    aug = emb.select("vec_id", "embedding", "label").unionByName(plants)
    return D.embedding_near_dups(aug, block_col="label", threshold=0.9)


def q_semdedup_drop_list(spark, sf_dir):
    """SemDeDup: coarse-quantize the embedding space (fixed-point
    IVF — exact integer cell membership), find cosine>=0.9 pairs
    ONLY within cells, group transitively, drop all but the min-id
    representative. The driver's embeddings have no natural dups at
    τ=0.9, so every 10th vector is planted back TWICE (trios test
    transitive grouping); the DuckDB oracle replays the quantizer,
    the in-cell pair scan, and the recursive-CTE components."""
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "embedding")
    p1 = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    p2 = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 2000000).alias("vec_id"), "embedding"
    )
    aug = base.unionByName(p1).unionByName(p2)
    return D.semantic_dedup(aug, n_cells=8, iters=1, seed=99, threshold=0.9)


def q_semdedup_auto(spark, sf_dir):
    """SemDeDup with the AUTO-SIZED quantizer (r4 verdict item 3):
    same augmented corpus as `semdedup_drop_list` but n_cells=None,
    so k = clamp(⌈√n⌉, 8, 4096) grows with the corpus and the
    in-cell pair scan stays ~n^1.5 instead of quadratic at fixed k
    (the r4 sf1 lesson: 190 s at 10× rows with k pinned at 8).
    Returns the per-corpus drop-list SIZE (not the list): with
    corpus-sized k the kept/dropped partition depends on k, and k
    depends on a runtime count() — which a STATIC oracle SQL string
    cannot express, so this entry is rows-only by design; the
    auto == explicit-k equivalence is pinned in
    tests/test_semdedup_auto.py and the explicit-k path is the fully
    oracled `semdedup_drop_list`."""
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "embedding")
    p1 = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    p2 = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 2000000).alias("vec_id"), "embedding"
    )
    aug = base.unionByName(p1).unionByName(p2)
    drops = D.semantic_dedup(aug, n_cells=None, iters=1, seed=99, threshold=0.9)
    return drops.agg(F.count("*").alias("n_dropped"))


def q_dedup_components(spark, sf_dir):
    """Near-dup pairs → transitive duplicate clusters (connected
    components by min-label propagation). The grouping step after
    pair finding: A~B, B~C collapse to one cluster even when A~C was
    never emitted. Oracle: DuckDB recursive CTE computing the same
    min-reachable-id fixpoint."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = D.embedding_near_dups(emb, block_col="label", threshold=0.3)
    cc = D.connected_components(pairs, src="a", dst="b")
    return cc.select(F.col("id").alias("vec_id"), "component")


def q_dedup_drop_list(spark, sf_dir):
    """The actionable dedup artifact: every doc in a near-dup cluster
    EXCEPT its representative (cluster-min id) — what a 100 TB
    curation pass actually deletes. Representative choice is the CC
    fixpoint itself, so the drop list is deterministic."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = D.embedding_near_dups(emb, block_col="label", threshold=0.3)
    cc = D.connected_components(pairs, src="a", dst="b")
    return cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("vec_id"), F.col("component").alias("keep_vec_id")
    )


def q_dedup_substring_spans(spark, sf_dir):
    """Exact substring-span dedup (Lee-et-al regime, bounded to
    k-token windows): the merged repeated passages across the corpus
    — the dedup family that excises boilerplate PASSAGES instead of
    dropping whole documents. hash60 gram hashes so the DuckDB
    oracle replays window hashing, the corpus-wide >=2 count, and
    the per-doc interval merge bit-identically."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents")
    return D.duplicate_spans(docs, k=12, min_count=2, hash_fn=hash60)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs sharing ≥1 distinct 8-gram
    with a 'benchmark' set. The benchmark is synthesized from the
    corpus itself (every 97th doc contributes tokens 5-24 as one
    eval item) so contamination is planted and the result non-empty
    at every SF. The engine joins on xxhash64(gram) — the 100 TB
    shape — while the oracle joins raw gram strings; outputs are
    per-doc counts, identical short of 64-bit collisions."""
    docs = _t(spark, sf_dir, "documents")
    toks = T.tokens_all("text")
    bench = docs.filter((F.col("doc_id") % 97 == 0) & (F.size(toks) >= 24)).select(
        F.array_join(F.slice(toks, 5, 20), " ").alias("text")
    )
    return D.decontaminate(docs, bench, n=8, min_overlap=1)


def q_text_repetition(spark, sf_dir):
    """Per-doc repeated word-3-gram fraction (boilerplate/spam
    signal). rep_ratio = 1 - distinct/total grams — exact integer
    sizes, one fp divide, bit-identical on both sides."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(T.repetition_ratio("text", n=3), 4).alias("rep_ratio")
    )


def q_text_top_ngrams(spark, sf_dir):
    """Corpus-wide 20 most frequent word 3-grams (boilerplate
    discovery), ties broken by gram text. Executes as
    TakeOrderedAndProject — per-partition local top-k, no global
    sort."""
    docs = _t(spark, sf_dir, "documents")
    return T.top_ngrams(docs, n=3, k=20)


def q_pipeline_curation(spark, sf_dir):
    """End-to-end curation pass: language gate + quality gate +
    repetition gate + exact-dedup (min-id representative per
    identical text) — the composed filter chain of a pretraining
    data pipeline, all native expressions + one hash agg."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        T.token_count("text").alias("n_tokens"),
        T.quality_score("text").alias("quality"),
        F.round(T.repetition_ratio("text", n=3), 4).alias("rep_ratio"),
        T.lang_id("text").alias("lang_pred"),
    )
    kept = scored.filter(
        (F.col("lang_pred") == "en")
        & (F.col("quality") >= 0.7)
        & (F.col("rep_ratio") <= 0.6)
        & (F.col("n_tokens") >= 10)
    )
    return D.drop_exact_dups(kept, text_col="text", id_col="doc_id").select(
        "doc_id", "n_tokens", "quality", "rep_ratio"
    )


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k (exact ANN baseline)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return SIM.brute_force_topk(queries, emb, k=10)


def q_contrastive_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training (operators/
    similarity.hard_negatives): per sampled anchor, the 5 most
    cosine-similar vectors with a DIFFERENT label — near-miss
    negatives InfoNCE/triplet losses need where random negatives are
    trivially separable. Anchors = every 50th vec; label inequality
    folds in before the rank-k cutoff so ranks count eligible
    negatives only. DuckDB oracle replays the filtered ranked scan."""
    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
    )
    return SIM.hard_negatives(anchors, emb, k=5)


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN top-k. Signatures are fixed-point-quantized
    (lsh_signature_quantized) — bucket assignment is exact integer
    arithmetic, so the DuckDB oracle replays the full candidate set
    and re-rank bit-identically (recall<1 vs brute force by design;
    the recall gate lives in tests/test_pipeline_ops.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return SIM.lsh_topk(queries, emb, k=10, n_planes=6, n_tables=8, seed=42, dim=64)


def q_ann_pq_adc(spark, sf_dir):
    """Product-quantization ADC top-k (similarity.pq_train /
    pq_encode / pq_adc_topk): the vector-COMPRESSION tier of the ANN
    family — 64-dim vectors become m=4 sub-codes (one int64 distance
    table lookup each at query time; raw vectors never read when
    scoring), the property that lets a 100 TB embedding corpus's
    codes live in hot storage. Every code decision is exact integer
    work over fixed-point unit vectors (portable seeded init, one
    integer-L2 Lloyd round, floor-of-mean sub-centroids), so codes,
    ADC sums, ranks, and ties replay bit-identically in the oracle.
    Recall is re-rank's job (pq_topk_reranked, gated in
    tests/test_pq.py); this entry pins the deterministic ADC
    pipeline itself."""
    emb = _t(spark, sf_dir, "embeddings")
    cb = SIM.pq_train(emb, dim=64, m=4, n_codes=8, iters=1, seed=99)
    codes = SIM.pq_encode(emb, cb, dim=64, m=4, n_codes=8)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return SIM.pq_adc_topk(queries, codes, cb, dim=64, m=4, k=10)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-bucketed ANN top-k, production shape: the index is built
    ONCE per corpus (fixed-point quantizer — portable seeded init,
    integer-L2 Lloyd assignment, floor-of-mean centroids; per-round
    lineage truncation) and written partitioned by cell; the query
    probes nprobe cells through a partition-pruned scan + exact
    in-cell float-cosine re-rank. Every cell-membership decision is
    exact integer arithmetic, so the DuckDB oracle replays the
    whole index build AND probe bit-identically (recall<1 vs brute
    force by design — recall gate and pruned≡unpruned equivalence
    in tests/test_pipeline_ops.py)."""
    import hashlib
    import os
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    tag = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    store = os.path.join(tempfile.gettempdir(), f"ivf_store_q_c8_i1_s99_{tag}")
    cent_path = os.path.join(store, "_centroids")
    if not (os.path.exists(os.path.join(store, "_SUCCESS")) and os.path.exists(cent_path)):
        cents, assigned = SIM.ivf_index_quantized(emb, n_cells=8, iters=1, seed=99)
        SIM.write_ivf_store(assigned, store)  # overwrite: store dir first
        cents.write.mode("overwrite").parquet(cent_path)
    cents = spark.read.parquet(cent_path)
    return SIM.ivf_topk_pruned(spark, store, queries, cents, k=10, nprobe=4, quantized=True)


def q_pipeline_image_caption(spark, sf_dir):
    """Image+caption pair curation — the multimodal composition of
    the pipeline gates over the input-hint table shape: caption
    token band + stopword gate (captions must read like language),
    extreme-aspect drop (w > 4h or h > 4w ruins every resize
    target), aspect-ratio bucket assignment, then the per-bucket
    training-mix report. Geometry comes from (w, h) METADATA only —
    planted via the portable hash60 family so the DuckDB oracle
    derives identical pairs; integer SUM/COUNT keeps the averages
    bit-exact."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.multimodal import aspect_bucket

    docs = _t(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id",
        (F.lit(256) + F.pmod(hash60("doc_id"), F.lit(1024))).cast("int").alias("w"),
        (F.lit(256) + F.pmod(hash60("doc_id", 1), F.lit(1024))).cast("int").alias("h"),
        T.token_count("text").alias("n_cap"),
        T.stopword_ratio("text").alias("swr"),
    )
    gated = pairs.filter(
        (F.col("n_cap") >= 5) & (F.col("n_cap") <= 4096)
        & (F.col("swr") >= 0.01)
        & (F.col("w") <= 4 * F.col("h")) & (F.col("h") <= 4 * F.col("w"))
    )
    return (
        aspect_bucket(gated)
        .groupBy("bucket_id", "target_w", "target_h")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("n_cap").alias("total_caption_tokens"),
            F.round(F.sum("n_cap") / F.count(F.lit(1)), 4).alias("avg_caption_tokens"),
        )
    )


def q_image_aspect_bucket(spark, sf_dir):
    """Aspect-ratio bucketing over image (w, h) METADATA — the
    training-batch geometry step (BASELINE.json input_hint columns
    w:int32/h:int32). No image table ships with the driver set, so
    the metadata is planted deterministically from doc ids via the
    portable hash60 family — both engines derive identical (w, h),
    and the bucket argmin itself is deterministic scalar arithmetic,
    so the assignment is DuckDB-oracled row-by-row."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.multimodal import aspect_bucket

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    imgs = docs.select(
        "doc_id",
        (F.lit(256) + F.pmod(hash60("doc_id"), F.lit(1024))).cast("int").alias("w"),
        (F.lit(256) + F.pmod(hash60("doc_id", 1), F.lit(1024))).cast("int").alias("h"),
    )
    return aspect_bucket(imgs)


def q_clip_align_gate(spark, sf_dir):
    """CLIP-score style image/caption alignment gate at tau=0.30 —
    the LAION-style curation step for the input-hint table shape.
    No embedding model ships in the container, so dim-8 INTEGER
    embeddings are planted per doc via the portable hash60 family:
    every 4th doc's caption embedding is its image embedding with
    one component nudged (aligned, cosine ~1), the rest draw
    independent components (cosine centered on 0, so the tau=0.30
    test does real discrimination — some unaligned pairs legitimately
    pass). The gate itself is cross-multiplied integer arithmetic
    (dot^2 * 10^4 >= tau_pct^2 * |a|^2 * |b|^2), so the DuckDB oracle
    derives the identical booleans row-by-row."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.multimodal import clip_alignment_gate

    dim = 8
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def comp(s):
        return (F.pmod(hash60("doc_id", s), F.lit(15)) - 7).cast("long")

    aligned = F.pmod(hash60("doc_id", 99), F.lit(4)) == 0
    img = [comp(s) for s in range(dim)]
    cap = [
        F.when(aligned, img[s] + F.lit(1 if s == 0 else 0)).otherwise(comp(100 + s))
        for s in range(dim)
    ]
    pairs = docs.select(
        "doc_id", F.array(*img).alias("img_emb"), F.array(*cap).alias("cap_emb")
    )
    return clip_alignment_gate(pairs, tau_pct=30).select(
        "doc_id", "dot", "n_img", "n_cap", "align_keep"
    )


def q_caption_dedup_best(spark, sf_dir):
    """Caption dedup keeping the BEST image (LAION rule): many images
    share one caption; keep the highest-resolution one, not the
    min-id one. Captions are planted into 37 collision groups and
    (w, h) via the portable hash60 family, so the DuckDB oracle
    derives the identical (area DESC, id ASC) survivor per group —
    window group-limit shape, one shuffle."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    pairs = docs.select(
        "doc_id",
        F.concat(F.lit("caption "), (F.col("doc_id") % 37).cast("string")).alias("caption"),
        (F.lit(256) + F.pmod(hash60("doc_id"), F.lit(1024))).cast("int").alias("w"),
        (F.lit(256) + F.pmod(hash60("doc_id", 1), F.lit(1024))).cast("int").alias("h"),
    ).withColumn("area", (F.col("w") * F.col("h")).cast("long"))
    return D.drop_dups_keep_best(pairs, key_col="caption", score_col="area")


def q_crossmodal_recall(spark, sf_dir):
    """Cross-modal retrieval evaluation — recall@5 of image→caption
    search, the quality gate a CLIP-style embedding space is judged
    by. Caption embeddings (corpus) are planted per doc via hash60;
    every 50th doc is a query whose IMAGE embedding is its caption
    embedding nudged in one component, so its true caption should
    rank near the top (a SAMPLED query set — the eval needs a
    representative sample, not every doc; brute-force cost is
    queries x corpus). Composes the already-oracled brute-force
    top-k (broadcast queries, one dot per pair) with a hit test
    (q_id == vec_id in the top-5) and one aggregate row:
    (k, n_queries, n_hits, recall_at_k)."""
    from dblp_crawler_spark.functions.hashing import hash60

    dim = 8
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def comp(s):
        return (F.pmod(hash60("doc_id", s), F.lit(15)) - 7).cast("double")

    cap = docs.select(
        F.col("doc_id").alias("vec_id"),
        F.array(*[comp(s) for s in range(dim)]).alias("embedding"),
    )
    img = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array(*[comp(s) + F.lit(1.0 if s == 0 else 0.0) for s in range(dim)]).alias("q_vec"),
    )
    topk = SIM.brute_force_topk(img, cap, k=5)
    agg = topk.agg(
        F.countDistinct("q_id").alias("n_queries"),
        F.sum((F.col("q_id") == F.col("vec_id")).cast("int")).alias("n_hits"),
        F.round(
            F.sum((F.col("q_id") == F.col("vec_id")).cast("int"))
            / F.countDistinct("q_id"), 4
        ).alias("recall_at_k"),
    )
    return agg.select(F.lit(5).alias("k"), "*")


def q_text_token_count(spark, sf_dir):
    """avg computed as SUM/COUNT (not AVG): token counts are exact
    integers, so one fp divide is bitwise identical on both the Spark
    and DuckDB sides — AVG's summation order is not."""
    docs = _t(spark, sf_dir, "documents")
    n = T.token_count("text")
    return docs.groupBy("source").agg(
        F.sum(n).alias("total_tokens"),
        F.round(F.sum(n) / F.count(F.lit(1)), 4).alias("avg_tokens"),
    )


def q_text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(T.quality_score("text")), 4).alias("avg_quality"),
        F.round(F.avg(T.punct_ratio("text")), 4).alias("avg_punct"),
    )


def q_pipeline_source_cap(spark, sf_dir):
    """Per-domain quota: top-25 docs per source by (quality DESC,
    doc_id ASC) — window group limit, one shuffle keyed on source."""
    docs = _t(spark, sf_dir, "documents")
    return T.per_source_cap(docs, n=25)


def q_pipeline_pack_shards(spark, sf_dir):
    """Token-budget sequence packing into ~2000-token shards —
    distributed exclusive prefix sum (range partition + per-
    partition running sums + broadcast partition totals)."""
    docs = _t(spark, sf_dir, "documents")
    return T.pack_shards(docs, shard_tokens=2000)


def q_text_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(T.lang_id("text").alias("lang_pred")).agg(F.count("*").alias("n"))


# planted Gopher-rule violations (the driver's synthetic text is
# uniformly clean): symbols onto every 7th doc, numeric word soup
# onto every 3rd, bullet lines onto every 5th — same expression on
# both engines, so the oracle pins the exact verdicts.
_GOPHER_SYM = " #### ... ... ..."
_GOPHER_SW = " and that would be fine to have with it"
_GOPHER_NUM = " 11 22 33 44 55 66 77 88 99 00 12 34 56 78"
_GOPHER_BUL = ("\n- aa bb\n- cc dd\n- ee ff\n- gg hh\n- ii jj"
               "\n- kk ll\n- mm nn\n- oo pp\n- qq rr\n- ss tt")
# the same literal as a DuckDB escape-string (generated from the
# constant so the two engines can never drift)
_GOPHER_BUL_SQL = "e'" + _GOPHER_BUL.replace("\n", "\\n") + "'"


def q_gopher_quality_rules(spark, sf_dir):
    """Gopher rule-set gate (Rae et al. 2021 §A1.1) over planted
    violations: per-source pass counts for all seven rules plus the
    composite keep. Every rule is an integer cross-multiplied
    comparison (no float ratios), so verdicts are engine-portable;
    pure per-row projection + one hash agg."""
    docs = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(_GOPHER_SW)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit(_GOPHER_SYM)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit(_GOPHER_NUM)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit(_GOPHER_BUL)).otherwise(F.lit("")),
    )
    g = T.gopher_rules(planted)
    d = docs.select("source", g.alias("g"))
    rules = ["word_count", "mean_word_len", "symbol_ratio", "bullet_lines",
             "ellipsis_lines", "alpha_words", "stopwords"]
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        *[F.sum(F.col(f"g.{r}").cast("long")).alias(f"pass_{r}") for r in rules],
        F.sum(F.col("g.keep").cast("long")).alias("n_keep"),
    )


def q_recrawl_schedule(spark, sf_dir):
    """Adaptive recrawl queue: treat events as the fetch log (url
    from user_id, content fingerprint from event_type), estimate each
    url's change rate, and rank by expected staleness
    n_changes * age / span — the measured-cadence generalization of
    the reference's fixed per-class TTLs. One url-keyed shuffle
    (window + agg share it), top-k as TakeOrderedAndProject; the only
    float is the final single division of exact integer micros."""
    from dblp_crawler_spark.operators import recrawl as RC

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.concat(F.lit("https://dblp.org/pid/p"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts"),
        F.col("event_type").alias("fingerprint"),
    )
    pr = RC.recrawl_priorities(log)
    return (
        pr.filter(F.col("priority").isNotNull())
        .select(
            "url", "n_fetches", "n_changes",
            F.unix_micros(F.col("last_ts").cast("timestamp")).alias("last_us"), "priority",
        )
        .orderBy(F.desc("priority"), "url")
        .limit(50)
    )


def q_pii_redaction(spark, sf_dir):
    """PII scrub with a planted payload: the driver's synthetic text
    contains no PII, so every 7th doc gets a deterministic suffix
    carrying one email, one IPv4, and one phone number (the same
    expression on both engines). The entry reports per-kind match
    counts AND md5(redacted_text) — the oracle therefore pins the
    exact redacted bytes, not just that something was replaced. Pure
    regexp projection, no shuffle."""
    from dblp_crawler_spark.operators import redact as R

    docs = _t(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 250).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 11).cast("string"),
            F.lit(" or +1 555-000-1234."),
        ),
    ).otherwise(F.col("text"))
    p = docs.select("doc_id", planted.alias("text"))
    counts = R.pii_counts("text")
    return p.select(
        "doc_id",
        *[c.cast("long").alias(n) for n, c in counts.items()],
        F.md5(R.redact_pii("text").cast("binary")).alias("redacted_md5"),
    )


def q_tfidf_top_terms(spark, sf_dir):
    """Per-doc top-3 salient terms by (tf DESC, df ASC, term ASC)
    with smoothed tf-idf values — explode → two keyed hash-aggs →
    window group limit. Ranking key is all-integer so the selected
    rows are engine-independent; the float score is a value column
    rounded to 6."""
    docs = _t(spark, sf_dir, "documents")
    return T.tfidf_top_terms(docs, k=3)


def q_sketch_quantiles(spark, sf_dir):
    """Mergeable log2-histogram quantile sketch (operators/sketch.py
    hist_*): per-source p50/p90/p99 UPPER bounds with a guaranteed
    factor-2 envelope. The entry exercises the CRDT contract the way
    a real pipeline would: two sketches built on disjoint halves of
    the corpus (doc_id parity) are hist_merge'd — bucket-wise count
    addition — and must answer identically to a single-pass build.
    Buckets via the exact binary-string-length log2 (no float log);
    all-integer output."""
    from dblp_crawler_spark.operators.sketch import hist_build, hist_merge, hist_quantile

    docs = _t(spark, sf_dir, "documents")
    even = hist_build(docs.filter(F.col("doc_id") % 2 == 0), "n_chars", ["source"])
    odd = hist_build(docs.filter(F.col("doc_id") % 2 == 1), "n_chars", ["source"])
    return hist_quantile(hist_merge(even, odd), ["source"])


def q_length_quantiles(spark, sf_dir):
    """Exact per-source doc-length quantiles (operators/quantiles.py):
    rank-exact p50/p90/p99 of n_chars — value at sorted rank
    ceil(q·n) with integer DIV rank arithmetic, so every engine that
    can sort agrees bit-for-bit (no interpolation). One group-keyed
    shuffle shared by both window specs + a same-key collapse agg."""
    from dblp_crawler_spark.operators.quantiles import exact_group_quantiles

    docs = _t(spark, sf_dir, "documents")
    return exact_group_quantiles(docs, "n_chars", "source")


# Shared between q_content_sniff and its oracle: planted payload
# classes and their magic-byte prefixes (hex). 'bin' has no known
# magic → sniffs as octet-stream.
_SNIFF_CLASSES = ["png", "jpeg", "gif", "webp", "wav", "mp4", "pdf", "bin"]
_SNIFF_MAGICS = {
    "png": "89504E470D0A1A0A",
    "jpeg": "FFD8FFE0",
    "gif": "474946383961",
    "webp": "52494646AABBCCDD57454250",  # RIFF + size + 'WEBP'
    "wav": "52494646AABBCCDD57415645",   # RIFF + size + 'WAVE'
    "mp4": "0000001866747970",           # box size + 'ftyp'
    "pdf": "25504446",
    "bin": "00FF00FF",
}


def q_content_sniff(spark, sf_dir):
    """Magic-byte content-type sniffing + declared-vs-actual audit
    (operators/sniff.py): payloads are planted as real magic prefixes
    (incl. the RIFF two-window webp/wav split and mp4's offset-4 ftyp
    box) + md5-derived tails, with every 7th row's bytes SHIFTED one
    class off its declared fmt — the spoofed-Content-Type case a
    crawler must catch before decode. One hex projection of the first
    16 bytes, a when-chain, zero UDFs; report is the
    (declared, sniffed) confusion table."""
    from dblp_crawler_spark.operators.sniff import content_type_mismatch

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n_cls = len(_SNIFF_CLASSES)
    idx = F.col("doc_id") % n_cls
    shifted = (idx + F.when(F.col("doc_id") % 7 == 0, 1).otherwise(0)) % n_cls
    declared = F.element_at(F.array(*[F.lit(c) for c in _SNIFF_CLASSES]),
                            (idx + 1).cast("int"))
    magic = F.element_at(
        F.array(*[F.lit(_SNIFF_MAGICS[c]) for c in _SNIFF_CLASSES]),
        (shifted + 1).cast("int"),
    )
    payload = F.unhex(F.concat(magic, F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12)))
    imgs = docs.select(
        F.col("doc_id"), declared.alias("fmt"), payload.alias("bytes")
    )
    audit = content_type_mismatch(imgs, declared_col="fmt", bytes_col="bytes")
    return audit.groupBy(F.col("fmt").alias("declared"), "sniffed").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("mismatch").cast("int")).alias("n_mismatch"),
    )


def q_inverted_index(spark, sf_dir):
    """Capped inverted index (operators/invindex.py): per term the
    top-3 postings by (tf DESC, doc_id ASC) plus the EXACT pre-cap
    document frequency, hapax-pruned at min_df=5 — two keyed hash
    aggs + a term-keyed WindowGroupLimit. All-integer ranking keys →
    engine-portable row selection."""
    from dblp_crawler_spark.operators.invindex import build_inverted_index

    docs = _t(spark, sf_dir, "documents")
    return build_inverted_index(docs, k=3, min_df=5)


def q_index_delta_update(spark, sf_dir):
    """Incremental index maintenance (invindex.update_inverted_index):
    state = uncapped postings of the base corpus (every 17th doc held
    out), one wave adds the held-out docs and removes every 13th —
    the serving delta re-ranks ONLY touched terms, O(touched
    postings) not O(index). The DuckDB oracle performs a FULL REBUILD
    over the post-wave corpus restricted to the touched-term set —
    incremental == rebuild IS the correctness statement."""
    from dblp_crawler_spark.operators.invindex import postings, update_inverted_index

    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 17 != 0)
    added = docs.filter(F.col("doc_id") % 17 == 0)
    removed = base.filter(F.col("doc_id") % 13 == 0).select("doc_id")
    state = postings(base)
    _, delta = update_inverted_index(state, added, removed, k=3, min_df=5)
    return delta


def q_index_search_and(spark, sf_dir):
    """Conjunctive boolean search over the postings: top-10 docs
    containing ALL of {spark, join, window}, ranked by summed term
    frequency then doc_id — broadcast query join prunes the postings
    before any shuffle; global top-k plans as
    TakeOrderedAndProject."""
    from dblp_crawler_spark.operators.invindex import search_and

    docs = _t(spark, sf_dir, "documents")
    return search_and(docs, ["spark", "join", "window"], k=10)


def q_index_search_bm25(spark, sf_dir):
    """Fixed-point BM25 ranked retrieval (OR semantics): top-10 docs
    for {spark, join, window} scored by integer-exact BM25 —
    bit_length IDF x scaled-rational tf-norm (k1=3/2, b=3/4,
    avgdl = T div N), summed as int64 so ranking ties are
    engine-portable. Query broadcast prunes tokens BEFORE the tf
    aggregation; top-k plans as TakeOrderedAndProject."""
    from dblp_crawler_spark.operators.invindex import search_bm25

    docs = _t(spark, sf_dir, "documents")
    return search_bm25(docs, ["spark", "join", "window"], k=10)


def q_hash_split(spark, sf_dir):
    """Deterministic 10% val split via the first 4 hex chars of
    md5(doc_id): membership depends only on the id, so growing the
    corpus never reassigns a doc between train and val. Pure
    projection (no shuffle, no rand seed to disagree about)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.hash_split(val_pct=10).alias("split"))


def q_split_leakage_free(spark, sf_dir):
    """Content-keyed train/val split (textstats.leakage_free_split):
    the split key is md5 of NORMALIZED text (lower + whitespace
    collapse + trim), not the id, so every copy of a text lands on
    one side — planted reformatted duplicates (uppercase, doubled
    spaces, shifted ids, every 11th doc) MUST co-locate with their
    originals where id-keyed hash_split would scatter them across
    the eval boundary. Pure projection, no shuffle; DuckDB replays
    the normalization + fixed-width-hex threshold exactly."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.upper(F.replace(F.col("text"), F.lit(" "), F.lit("  "))).alias("text"),
    )
    return T.leakage_free_split(docs.unionByName(copies), val_pct=10)


def q_fetch_backoff(spark, sf_dir):
    """Exponential-backoff retry schedule (operators/scheduler.
    fetch_backoff) over the events fetch log (url from user_id,
    ok = event_type != 'error'): per URL the trailing
    consecutive-failure streak gates next_eligible = last_ts +
    min(cap, base*2^(s-1)), integer micros end to end — what is
    ALLOWED to be retried, next to recrawl_schedule's what is WORTH
    refetching. One url-keyed exchange shared by window and agg;
    DuckDB replays epoch_us, the streak window, and the shifted
    power-of-two delay exactly."""
    from dblp_crawler_spark.operators.scheduler import fetch_backoff

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.concat(F.lit("https://dblp.org/pid/p"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts"),
        (F.col("event_type") != "error").alias("ok"),
    )
    return fetch_backoff(log)


def q_dsir_importance(spark, sf_dir):
    """DSIR data-selection importance weights (textstats.
    dsir_importance, Xie et al. NeurIPS'23): per raw doc, how much
    more likely its hashed bigrams are under a TARGET slice than
    under the raw corpus — the resampling weight that tilts a 100 TB
    crawl toward a domain. Integer-exact log-ratio surrogate
    (bits(c+1) via length(bin()), totals-normalized), hashed into
    2^14 buckets so both count tables are bounded broadcast dims at
    any corpus size. Target planted as the doc_id % 13 slice (a real
    run feeds a benchmark/curated table — same plan). The oracle
    replays gram extraction, buckets, counts, and the bits algebra."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.filter(F.col("doc_id") % 13 == 0)
    return T.dsir_importance(docs, target, n=2, n_buckets=1 << 14, seed=11)


def q_adaptive_crawl_delay(spark, sf_dir):
    """AIMD per-host politeness from observed behavior (scheduler.
    adaptive_crawl_delay): delay = clamp(max(base, 2·p95-latency)
    << min(fail_streak, 6)) — a slow host is throttled proportional
    to its rank-exact p95 service time (never interpolated, so any
    engine agrees), a failing host backs off multiplicatively on the
    trailing consecutive-failure streak (order-free count after the
    last success). The adaptive tier above robots crawl-delay, which
    most hosts don't set; output plugs into politeness_pop's
    host_budgets. Hosts from the events log (user_id % 25), latency
    = floor(value·100) — deterministic in IEEE double on both
    engines. ONE host-keyed exchange shared by rank window, host
    windows, and the collapse agg."""
    from dblp_crawler_spark.operators.scheduler import adaptive_crawl_delay

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.format_string("h%d.org", F.pmod("user_id", F.lit(25))).alias("host"),
        F.floor(F.col("value") * 100).cast("long").alias("latency_ms"),
        (F.col("event_type") != "error").alias("ok"),
        F.col("ts"),
    )
    return adaptive_crawl_delay(log)


def q_alias_collapse(spark, sf_dir):
    """Duplicate-content URL-alias collapse (operators/recrawl.
    canonical_election): every 4th doc is planted to SERVE ANOTHER
    DOC'S TEXT from a different host (the mirror case URL
    canonicalization can't catch — only content fingerprints can);
    pages group by fingerprint, the lexicographically smallest URL
    is elected canonical, and the per-host alias-rate rollup is the
    trap/mirror signal the scheduler penalizes. NULL fingerprints
    (every 23rd fetch failed) are excluded — no content, no
    election. DuckDB replays the self-join plant and both
    aggregations exactly."""
    from dblp_crawler_spark.operators.recrawl import canonical_election

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    eff = (
        F.col("doc_id")
        - F.when(F.col("doc_id") % 4 == 1, 1).otherwise(0)
    ).alias("eff")
    base = docs.select(F.col("doc_id").alias("eff_id"),
                       F.md5(F.col("text").cast("binary")).alias("fp0"))
    hh = (F.col("doc_id") % 40).cast("string")
    fetches = (
        docs.select("doc_id", eff)
        .join(base, F.col("eff") == F.col("eff_id"))
        .select(
            F.concat(F.lit("http://h"), hh, F.lit(".org/page/"),
                     F.col("doc_id").cast("string")).alias("url"),
            F.when(F.col("doc_id") % 23 == 0, F.lit(None).cast("string"))
            .otherwise(F.col("fp0")).alias("fingerprint"),
            F.concat(F.lit("h"), hh, F.lit(".org")).alias("host"),
        )
    )
    _, report = canonical_election(fetches)
    return report


def q_fairness_gini(spark, sf_dir):
    """Allocation-fairness audit (operators/budget.allocation_gini):
    exact rational Gini of per-host byte allocation (host = doc_id
    mod 37 — a non-divisor so group sizes AND text lengths vary) —
    (gini_num, gini_den) are exact int64, the rounded double is the
    only float, and the global-rank window runs over the 37-row
    per-host aggregate, never raw data. DuckDB replays ranks and the
    rational exactly."""
    from dblp_crawler_spark.operators.budget import allocation_gini

    docs = _t(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 37).alias("host"), F.length("text").alias("n_bytes")
    )
    return allocation_gini(docs, "host", "n_bytes")


def q_snapshot_diff(spark, sf_dir):
    """Crawl-snapshot delta (operators/recrawl.snapshot_diff): two
    synthesized (url, md5-fingerprint) snapshots — every 19th doc
    absent from OLD (added), every 13th absent from NEW (removed),
    every 7th refingerprinted (changed), every 23rd NULL-fingerprinted
    on both sides (failed fetches — null-safe compare keeps them
    'unchanged') — classified in ONE full-outer key-partitioned
    join. DuckDB replays with FULL OUTER JOIN + IS DISTINCT FROM."""
    from dblp_crawler_spark.operators.recrawl import snapshot_diff

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    url = F.concat(
        F.lit("http://h"), (F.col("doc_id") % 40).cast("string"),
        F.lit(".org/page/"), F.col("doc_id").cast("string"),
    )
    fp_old = F.when(F.col("doc_id") % 23 == 0, F.lit(None).cast("string")).otherwise(
        F.md5(F.col("text").cast("binary"))
    )
    fp_new = (
        F.when(F.col("doc_id") % 23 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 7 == 0, F.md5(F.concat(F.col("text"), F.lit("!")).cast("binary")))
        .otherwise(F.md5(F.col("text").cast("binary")))
    )
    old = docs.filter(F.col("doc_id") % 19 != 0).select(url.alias("url"), fp_old.alias("fingerprint"))
    new = docs.filter(F.col("doc_id") % 13 != 0).select(url.alias("url"), fp_new.alias("fingerprint"))
    return snapshot_diff(old, new)


def q_classifier_calibration(spark, sf_dir):
    """Full precision/recall/F1 threshold sweep in one pass
    (textstats.classifier_calibration): planted 0/1 labels (every
    3rd doc) with a label-correlated portable-hash score — the
    histogram-first shape where the corpus is binned once (map-side
    partials, ≤20 rows shuffle) and the sweep is a window over the
    tiny histogram, never a per-threshold rescan. Counts are exact
    cumulative integers; only the final P/R/F1 divisions are floats.
    DuckDB replays bins, cumulative window, and divisions exactly."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    lab = (F.col("doc_id") % 3 == 0).cast("int")
    scored = docs.select(
        (((hash60("doc_id", 7) % 1000) / F.lit(1000.0) + lab) / F.lit(2)).alias("score"),
        lab.alias("label"),
    )
    return T.classifier_calibration(scored, n_bins=20)


def q_cdc_chunking(spark, sf_dir):
    """Content-defined chunking (textstats.cdc_chunks) on the
    portable hash family: boundaries where the local 2-gram hash60
    ≡ 0 (mod 16), so an edit moves only the chunks it touches —
    chunk-level dedup survives insertions that shift every window of
    fixed-stride chunking. Flat per-doc expression work (pair-gram
    zip, position filter, span zip, one explode); DuckDB replays
    tokenization, boundary hash, and span slicing exactly."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents")
    return T.cdc_chunks(docs, div=16, hash_fn=hash60)


def q_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training (operators/bpe.py): 6
    merge rounds over the corpus word-frequency table — the
    vocabulary-building step before token counting/packing mean
    anything. One corpus pass builds the word table; every round is
    a pair-explode + hash agg over that SMALL table, a LIMIT-1
    driver action, and an exact greedy left-to-right merge fold (no
    UDF), lineage checkpointed per round. Deterministic (count DESC,
    pair ASC) tie-break makes the learned merge table bit-identical
    cross-engine; the oracle unrolls all 6 rounds with list_reduce
    replaying the same greedy fold."""
    from dblp_crawler_spark.operators.bpe import bpe_train

    docs = _t(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=6)


def q_bpe_encode(spark, sf_dir):
    """Exact BPE token count per doc with the 6-merge table learned
    by bpe_train (operators/bpe.bpe_encode_counts): each DISTINCT
    word is encoded once via rank-ordered greedy folds, then per-doc
    counts are one explode + broadcast join + sum — the real
    tokenizer-budget number the regex approximation estimates. The
    oracle re-derives the same merge chain in SQL and replays the
    same folds over the word table."""
    from dblp_crawler_spark.operators.bpe import bpe_encode_counts, bpe_train

    docs = _t(spark, sf_dir, "documents")
    return bpe_encode_counts(docs, bpe_train(docs, n_merges=6))


def q_table_profile(spark, sf_dir):
    """One-pass ANALYZE-style column profile (textstats.
    profile_table) of the TPC-H orders table: per column — total
    rows, nulls, exact distinct count — the null-rate-spike /
    cardinality-collapse corruption tells a pipeline checks before
    training on a table. ONE aggregation job (multi-distinct Expand;
    approx_count_distinct is the documented 100 TB path). min/max
    are computed but projected out here: float/timestamp string
    rendering is engine-specific (pinned in unit tests instead)."""
    orders = _t(spark, sf_dir, "orders")
    return T.profile_table(orders).select("column", "n", "n_null", "n_distinct")


def q_corpus_drift(spark, sf_dir):
    """Per-source token-distribution drift vs baseline src0
    (textstats.corpus_drift): EXACT integer L1 — scaled by Na*Nb the
    per-term differences are |ca*nb - cb*na|, and missing-term mass
    folds into totals algebra so ONLY the shared-term join runs;
    zero-overlap sources still report the maximum drift 2.0 via the
    totals-anchored left join. One token agg + one term-keyed join
    against broadcast baseline counts + one collapse; the single
    division at the end is the only float. DuckDB replays the same
    algebra (SUMs cast from HUGEINT)."""
    docs = _t(spark, sf_dir, "documents")
    return T.corpus_drift(docs, baseline="src0")


def q_corpus_mix(spark, sf_dir):
    """Corpus composition rollup per (source, predicted lang):
    doc count, token sum, mean quality — the report a curation run
    ends with. One map-side-partial hash-agg over one projection."""
    docs = _t(spark, sf_dir, "documents")
    return T.corpus_mix_report(docs)


def q_doc_chunk_overlap(spark, sf_dir):
    """Fixed-token-window chunking with overlap (window 32, stride
    16) — documents → training-sample context windows. Map-only
    projection: sequence of starts → explode → slice; no shuffle, no
    UDF. DuckDB replays it with generate_series + list_slice."""
    docs = _t(spark, sf_dir, "documents")
    return T.chunk_tokens(docs, window=32, stride=16)


def q_mixture_sample(spark, sf_dir):
    """Temperature-flattening mixture resample (alpha = 1/2) over a
    PLANTED skewed source map (the driver's synthetic `source` column
    is perfectly uniform, which would make every keep-rate 1.0 and
    exercise nothing): bucket doc_id%16 → one 'big' source (8/16 of
    docs), one 'mid' (4/16), four 'tail' sources (1/16 each), so the
    entry demonstrates real downsampling — tail kept whole, mid at
    sqrt(1/4)=0.5, big at sqrt(1/8)≈0.354. The keep decision is
    exact integer arithmetic on the portable 30-bit hash uniform
    (u²·n_s < n_min·2^60), so DuckDB derives the identical kept set;
    the report is per-source (n_docs, n_kept, keep_rate)."""
    docs = _t(spark, sf_dir, "documents")
    b = F.col("doc_id") % 16
    skewed = docs.select(
        "doc_id",
        F.when(b < 8, F.lit("big"))
        .when(b < 12, F.lit("mid"))
        .otherwise(F.concat(F.lit("tail"), b.cast("string")))
        .alias("source"),
    )
    kept = T.mixture_flatten(skewed).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept")
    )
    total = skewed.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return total.join(kept, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.round(F.coalesce("n_kept", F.lit(0)) / F.col("n_docs"), 4).alias("keep_rate"),
    )


def q_corpus_shuffle(spark, sf_dir):
    """Seeded deterministic training-order shuffle: global rank by
    (hash60(id, seed), id) through the distributed two-pass prefix
    sum — no single-partition window; the oracle is one
    ROW_NUMBER() over the same portable key."""
    docs = _t(spark, sf_dir, "documents")
    return T.seeded_shuffle(docs, seed=17)


def q_mixture_interleave(spark, sf_dir):
    """Weighted-fair mixture training order (textstats.
    mixture_interleave): virtual-time fair queueing over per-source
    seeded-shuffle ranks — every PREFIX of the epoch carries each
    source in proportion to its weight (within one quantum), the
    property mixture training needs that a plain weighted shuffle
    only gives in expectation. All-int64 (k·2^20 DIV w), re-runs and
    other engines derive the identical order; src0 weighted 4×,
    src1 2×, rest 1. The oracle replays within-source rank, virtual
    finish, and the (f, source, k) total order."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return T.mixture_interleave(docs, {"src0": 4, "src1": 2}, seed=17)


def q_warc_cdx_layout(spark, sf_dir):
    """Web-archive writer layout (operators/archive.py): SURT keys,
    deterministic WARC shard placement at shard = byte-prefix DIV
    target (the parallel, engine-portable form of a rolling writer),
    per-shard byte offsets, and the CDX rows — all computed BEFORE a
    byte is written, from exact serialized record lengths, via the
    crawl's two-pass distributed prefix sum (no single-partition
    window). Synthetic fetch records derive from documents with
    port/query URL variety; 64 KiB shards keep the fixture
    multi-shard. The oracle replays SURT, the rendered record bytes,
    the exclusive prefix, and the DIV placement."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators import archive as AR

    docs = _t(spark, sf_dir, "documents")
    recs = docs.select(
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".example.org"),
            F.when(F.col("doc_id") % 11 == 0, F.lit(":8443")).otherwise(F.lit("")),
            F.lit("/docs/"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("?a=2&b=1")).otherwise(F.lit("")),
        ).alias("url"),
        (F.lit(1700000000).cast("long") + F.col("doc_id") * 37).alias("ts"),
        F.lit("text/plain").alias("mime"),
        hash60("text").alias("digest"),
        F.col("text").alias("payload"),
    )
    return AR.warc_layout(recs, target_bytes=1 << 16)


def q_warc_revisit_dedup(spark, sf_dir):
    """Digest-deduplicated archive placement (archive.
    warc_revisit_layout): per content digest the earliest capture
    (min (ts, url)) stays a full response record, later captures
    become zero-payload revisit stubs pointing at it — the WARC 1.1
    identical-payload-digest profile that keeps recrawl-heavy
    archives from storing unchanged pages twice. Duplicates planted
    by serving every group of 4 docs the group leader's text (a
    self-join the oracle replays); one digest-keyed window elects
    originals, then the same DIV-target placement as
    warc_cdx_layout."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators import archive as AR

    docs = _t(spark, sf_dir, "documents")
    leaders = docs.select(F.col("doc_id").alias("gid"), F.col("text").alias("payload"))
    recs = (
        docs.select(
            "doc_id", "source",
            (F.col("doc_id") - F.col("doc_id") % 4).alias("gid"),
        )
        .join(leaders, "gid")
        .select(
            F.concat(
                F.lit("https://www."), F.col("source"), F.lit(".example.org/docs/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            (F.lit(1700000000).cast("long") + F.col("doc_id") * 37).alias("ts"),
            F.lit("text/plain").alias("mime"),
            hash60("payload").alias("digest"),
            "payload",
        )
    )
    return AR.warc_revisit_layout(recs, target_bytes=1 << 16)


def q_dataset_fingerprint(spark, sf_dir):
    """Order-invariant multiset content fingerprint (operators/
    audit.py): per source — n_rows, bit-XOR of 60-bit row hashes,
    and three 20-bit-nibble additive sums (multiplicity-sensitive
    where XOR cancels on even duplicates; int64-exact to ~8.8e12
    rows). One map-side-partial aggregation; fingerprints of shards
    merge by (+, ^, +), so replica audits compare O(1) summaries
    instead of shuffling 100 TB. The oracle runs the SAME audit in
    DuckDB — the cross-engine comparison this operator exists for."""
    from dblp_crawler_spark.operators.audit import table_fingerprint

    docs = _t(spark, sf_dir, "documents")
    return table_fingerprint(docs, group_cols=["source"])


# shared EXIF fixture hex (entry + oracle build the SAME payloads):
# JPEG = SOI + APP0(JFIF) + APP1(Exif, little-endian TIFF: IFD0 at 8,
# 2 entries — Make(0x010F) first, then Orientation(0x0112) SHORT);
# TIFF = standalone big-endian with the same two entries.
_EXIF_APP0 = "FFE00010" + "4A46494600" + "00" * 9
_EXIF_JPEG_PREFIX = (
    "FFD8" + _EXIF_APP0 + "FFE1002E" + "457869660000"
    + "49492A00" + "08000000" + "0200"
    + "0F010200" + "04000000" + "41424300"
    + "12010300" + "01000000"
)
_EXIF_TIFF_PREFIX = (
    "4D4D002A" + "00000008" + "0002"
    + "010F0002" + "00000004" + "41424300"
    + "01120003" + "00000001"
)
_EXIF_SUFFIX = "0000" + "00000000"  # value pad + next-IFD offset
_EXIF_PNG = "89504E470D0A1A0A" + "0000000D49484452" + "0000004000000040" + "0806"


def q_exif_orientation(spark, sf_dir):
    """Decode-free EXIF orientation (operators/sniff.
    exif_orientation): the header field resize/phash stages must read
    before touching pixels — orientations 5-8 transpose the image.
    JPEG APP1 segment walk to the Exif signature then the TIFF IFD
    walk (byte-order mark, IFD offset, 12-byte entries, tag 0x0112),
    endianness-aware, all staged pure expressions over ONE 256-byte
    hex projection — no UDF, blobs never shuffle. Payloads planted
    by id: JPEG/Exif-II, standalone TIFF-MM (orientation behind a
    Make entry in both — the walk must skip entries), and PNG (no
    EXIF → NULL). The oracle replays construction and parse from the
    same hex constants and staged reads."""
    from dblp_crawler_spark.operators.sniff import exif_orientation

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    o = (F.col("doc_id") % 8 + 1).cast("int")
    hexstr = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(_EXIF_JPEG_PREFIX),
                        F.format_string("%02X00", o), F.lit(_EXIF_SUFFIX)))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit(_EXIF_TIFF_PREFIX),
                       F.format_string("00%02X", o), F.lit(_EXIF_SUFFIX)))
        .otherwise(F.lit(_EXIF_PNG))
    )
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return exif_orientation(imgs).select(
        "doc_id", "fmt", "orientation", "swap_dims"
    )


def q_frontier_aging(spark, sf_dir):
    """Starvation-free aged pop order (operators/scheduler.
    aging_order): eff = priority + min(age, cap)·2^46 — the CCF
    class is 2^48 per level, so a bottom-class URL starved ~13 waves
    outranks a fresh top-class one; a static queue under sustained
    high-class pressure never schedules the tail. Rank via the
    two-pass distributed prefix sum (no single-partition window);
    all int64, ties on url, so any engine replays the exact order."""
    from dblp_crawler_spark.functions.priority import priority_col
    from dblp_crawler_spark.operators.scheduler import aging_order

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    ccf = F.element_at(
        F.array(F.lit("A"), F.lit("B"), F.lit("C"), F.lit("N")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    frontier = docs.select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 13).cast("string"),
                 F.lit(".org/p/"), F.col("doc_id").cast("string")).alias("url"),
        priority_col(ccf, F.lit(1990) + F.col("doc_id") % 30,
                     F.col("doc_id") % 5),
        (F.col("doc_id") % 17).alias("enqueue_wave"),
    )
    return aging_order(frontier, current_wave=20)


def q_jpeg_quality(spark, sf_dir):
    """Decode-free JPEG quality estimate (operators/sniff.
    jpeg_quality): invert libjpeg's quality→DQT mapping from the
    first quantization table — scale = 100·sum(table) DIV sum(base),
    Q = 5000 DIV scale (scale≥100) else (200−scale) DIV 2 — the
    recompression-junk signal curation thresholds on, readable
    without a decoder. Payloads planted from the EXACT libjpeg
    formula at Q = 5 + (doc_id%19)·5 (built as an expression fold
    over the Annex-K base table), with 16-bit-precision tables and
    PNGs mixed in (both → NULL). Walks and folds are staged pure
    expressions; the oracle replays construction (list_reduce concat)
    and parse (null-propagating list_reduce sum) bit-identically."""
    from dblp_crawler_spark.operators.sniff import DQT_BASE, jpeg_quality

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    q = (F.col("doc_id") % 19 * 5 + 5).cast("long")
    s = F.when(q < 50, F.expr("CAST(5000 DIV (doc_id % 19 * 5 + 5) AS BIGINT)")) \
         .otherwise(F.lit(200) - 2 * q)
    base_arr = F.array(*[F.lit(v) for v in DQT_BASE])
    tbl_hex = F.aggregate(
        F.sequence(F.lit(0), F.lit(63)),
        F.lit(""),
        lambda acc, i: F.concat(
            acc,
            F.format_string(
                "%02X",
                F.least(
                    F.lit(255).cast("long"),
                    F.greatest(
                        F.lit(1).cast("long"),
                        ((F.element_at(base_arr, (i + 1).cast("int")).cast("long") * s
                          + F.lit(50)) / F.lit(100)).cast("long"),
                    ),
                ).cast("int"),
            ),
        ),
    )
    pq = F.when(F.col("doc_id") % 7 == 0, F.lit("10")).otherwise(F.lit("00"))
    hexstr = F.when(
        F.col("doc_id") % 5 == 4, F.lit(_EXIF_PNG)
    ).otherwise(
        F.concat(F.lit("FFD8" + _EXIF_APP0 + "FFDB0043"), pq, tbl_hex)
    )
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return jpeg_quality(imgs).select("doc_id", "fmt", "dqt_sum", "approx_quality")


def q_url_template_cap(spark, sf_dir):
    """Per-template URL fan-out budget (frontier.template_cap over
    urlnorm.url_template): collapse URLs to their generative
    template (digit runs → {N}, 8+-hex runs → {H}, query values
    dropped) and admit at most 20 per template by deterministic
    hash rank — the aggregate trap defense per-URL heuristics can't
    see (a calendar endpoint mints unbounded individually-innocent
    URLs from ONE template). The hot template is the skew case, so
    ranking is the politeness pop's salted two-level top-k; the
    oracle replays the provably-equivalent single window. Planted:
    an explosive calendar template (~250 URLs, capped), small
    per-host page templates (under cap), and hex-id + query-param
    variants."""
    from dblp_crawler_spark.operators.frontier import template_cap

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select(
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("https://cal.example.org/archive/"),
                     (F.lit(2000) + F.col("doc_id") % 20).cast("string"),
                     F.lit("/"), (F.col("doc_id") % 12 + 1).cast("string")),
        ).when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.lit("https://img.example.org/obj/"),
                     F.md5(F.col("doc_id").cast("string")),
                     F.lit("?size=big&v="), F.col("doc_id").cast("string")),
        ).otherwise(
            F.concat(F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
                     F.lit(".org/page/"), F.col("doc_id").cast("string")),
        ).alias("url")
    ).distinct()
    return template_cap(urls, max_per_template=20)


def q_minhash_delta_dedup(spark, sf_dir):
    """Incremental against-corpus near-dup (dedup.minhash_delta):
    dedup a NEW wave against an already-indexed corpus in O(wave) —
    the corpus is touched only through its persisted index (16-lane
    hash60 signatures + 8 band rows per doc; texts never re-read).
    Candidates from the wave-bands ⨝ state-bands equi-join; verify
    by signature lane agreement (≥12/16 ≈ Jaccard 0.75). Planted:
    every 8th doc is NEW and carries the text of the OLD doc id+1 —
    an exact dup the delta must find with 16/16 lanes. Fully
    oracled: DuckDB replays shingling, all 16 min-lanes, banding,
    the new×old probe, and the lane count."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.dedup import (
        minhash_bands,
        minhash_delta,
        minhash_signature,
    )

    docs = _t(spark, sf_dir, "documents")
    leaders = docs.select(F.col("doc_id").alias("lid"), F.col("text").alias("ltext"))
    rec = (
        docs.join(leaders, F.col("lid") == F.col("doc_id") + 1, "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 8 == 0) & F.col("ltext").isNotNull(),
                F.col("ltext"),
            ).otherwise(F.col("text")).alias("text"),
        )
    )
    old = rec.filter(F.col("doc_id") % 4 != 0)
    new = rec.filter(F.col("doc_id") % 4 == 0)
    sigs = minhash_signature(old, num_hashes=16, hash_fn=hash60)
    band_state = minhash_bands(sigs, bands=8, hash_fn=hash60)
    matches, _, _ = minhash_delta(
        new, sigs, band_state, num_hashes=16, bands=8,
        min_agree_lanes=12, hash_fn=hash60,
    )
    return matches


def q_charset_detect(spark, sf_dir):
    """Charset resolution before decode (operators/sniff.
    charset_decl): BOM > in-document declaration > default — the
    WHATWG sniffing order, with the UTF-32LE/UTF-16LE prefix trap
    (FFFE0000 must test before FFFE) handled by BOM_TABLE ordering.
    Planted: all five BOMs' representatives, <meta charset> in both
    quote styles, http-equiv content-type, XML declarations, a
    BOM+meta conflict (BOM must win), and undeclared docs (default).
    Pure projection; oracle replays the same table-generated CASE
    and RE2-safe regexes."""
    from dblp_crawler_spark.operators.sniff import charset_decl

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m = F.col("doc_id") % 6
    bom_hex = (
        F.when(m == 0, F.lit("EFBBBF48"))
        .when(m == 1, F.lit("FFFE0000"))
        .when(m == 2, F.lit("FFFE4800"))
        .otherwise(F.lit("48544D4C"))
    )
    html = (
        F.when(m == 0, F.concat(F.lit('<meta charset="KOI8-R">'), F.col("text")))
        .when(m == 3, F.concat(F.lit('<html><head><meta charset=ISO-8859-1></head>'), F.col("text")))
        .when(m == 4, F.concat(
            F.lit("<meta http-equiv='Content-Type' content='text/html; charset=Windows-1251'>"),
            F.col("text")))
        .when(m == 5, F.concat(F.lit("<?xml version='1.0' encoding='UTF-8'?><root>"), F.col("text")))
        .otherwise(F.col("text"))
    )
    df = docs.select("doc_id", F.unhex(bom_hex).alias("bytes"), html.alias("html"))
    return charset_decl(df).select("doc_id", "bom", "meta", "charset")


def q_politeness_timeline(spark, sf_dir):
    """Exact fetch start/finish times for a scheduled wave under
    per-host politeness delays (scheduler.politeness_timeline): the
    sequential recurrence start_i = max(ready_i, start_{i-1}+delay)
    — what naive simulators run as a driver loop — solved in ONE
    host-keyed window via the prefix-max closed form
    start_i = delay·k + runmax(ready_j − delay·k_j). All int64
    micros; rank and running max share a single exchange
    (plan-tested). The wave-planning answer (per-host drain time,
    wave tail) before a byte is fetched."""
    from dblp_crawler_spark.operators.scheduler import politeness_timeline

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    batch = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string")).alias("host"),
        F.concat(F.lit("https://h"), (F.col("doc_id") % 9).cast("string"),
                 F.lit(".org/p/"), F.col("doc_id").cast("string")).alias("url"),
        (F.lit(1700000000000000).cast("long")
         + (F.col("doc_id") * 37 % 50) * 1000000).alias("ready_us"),
    )
    return politeness_timeline(batch, delay_us=2500000)


def q_politeness_timeline_parallel(spark, sf_dir):
    """politeness_timeline generalized to 2 parallel connections per
    host (scheduler.politeness_timeline_parallel) — the HTTP/1.1
    polite-crawler regime. Deterministic round-robin lanes (fetch k
    → lane k mod 2), each lane enforcing the per-connection delay
    via the same prefix-max closed form keyed by (host, lane);
    nconn=1 degenerates to the serial operator (pinned in tests).
    Same planted wave as politeness_timeline so the two schedules
    are directly comparable."""
    from dblp_crawler_spark.operators.scheduler import (
        politeness_timeline_parallel,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    batch = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string")).alias("host"),
        F.concat(F.lit("https://h"), (F.col("doc_id") % 9).cast("string"),
                 F.lit(".org/p/"), F.col("doc_id").cast("string")).alias("url"),
        (F.lit(1700000000000000).cast("long")
         + (F.col("doc_id") * 37 % 50) * 1000000).alias("ready_us"),
    )
    return politeness_timeline_parallel(batch, nconn=2, delay_us=2500000)


def q_script_profile(spark, sf_dir):
    """Per-doc Unicode script mix (textstats.script_profile): the
    multilingual-curation signal lang-ID alone misses — mixed-script
    confusable spam, wrong-script content, script-based corpus
    routing. Codepoint counts per script via length-difference
    regexes (Java \\p{IsX} == RE2 \\p{X}, verified count-identical),
    n_other for Common-script chars, dominant by max count with
    SCRIPT_TABLE tie-break. Planted: Cyrillic/Han/Arabic/Greek
    suffixes and pure-Arabic rows over the Latin corpus."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m = F.col("doc_id") % 5
    t = (
        F.when(m == 1, F.concat(F.col("text"), F.lit(" Привет мир")))
        .when(m == 2, F.concat(F.col("text"), F.lit(" 汉字文本与 данные")))
        .when(m == 3, F.lit("مرحبا بالعالم"))
        .when(m == 4, F.concat(F.lit("Ελληνικά "), F.col("text")))
        .otherwise(F.col("text"))
    )
    return T.script_profile(docs.select("doc_id", t.alias("text")))


def q_robots_availability(spark, sf_dir):
    """Per-host robots.txt ACCESS policy (scheduler.
    robots_availability), RFC 9309 §2.3.1 — the status tier above
    rule evaluation: 2xx → use_rules, 4xx (file absent) → allow_all,
    5xx/unreachable → disallow_all, relaxing to allow_all once the
    trailing unreachable streak exceeds 30 days. Getting 4xx-vs-5xx
    backwards is the classic crawler bug this tri-state prevents.
    Synthetic per-host fetch logs (3-day attempt cadence) plant all
    five behaviors incl. the stale-streak relaxation; one host-keyed
    exchange; the oracle replays windows and CASE."""
    from dblp_crawler_spark.operators.scheduler import robots_availability

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    cls = F.col("doc_id") % 30 % 5
    k = F.expr("doc_id DIV 30")
    status = (
        F.when(cls == 0, F.lit(200))
        .when(cls == 1, F.when(k < 8, 200).otherwise(404))
        .when(cls == 2, F.when(k < 14, 200).otherwise(503))
        .when(cls == 3, F.lit(503))
        .otherwise(F.when(k % 2 == 0, 200).otherwise(500))
    )
    log = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 30).cast("string")).alias("host"),
        (F.lit(1700000000000000).cast("long")
         + k * F.lit(3 * 86400 * 1000000).cast("long")).alias("ts_us"),
        status.cast("int").alias("status"),
    )
    return robots_availability(log)


def q_registrable_domain(spark, sf_dir):
    """Registrable-domain extraction under a public-suffix dim
    (frontier.registrable_domain): the SITE-level politeness key —
    per-host budgets give a wildcard-subdomain spam farm unlimited
    budget, naive last-2-labels merges every *.co.uk site into one.
    Longest-suffix match: explode each host's last 1..4 proper
    suffixes, broadcast-join the PSL dim, collapse by max matched
    length, fall back to the implicit last-2 rule; a host that IS a
    public suffix returns itself. Planted: co.uk/com.au/ac.uk
    multi-label sites, plain .org fallbacks, and single-label
    hosts."""
    from dblp_crawler_spark.operators.frontier import registrable_domain

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 5
    d = F.col("doc_id").cast("string")
    host = (
        F.when(m == 0, F.concat(F.lit("www.site"), d, F.lit(".co.uk")))
        .when(m == 1, F.concat(F.lit("a.b.site"), d, F.lit(".com.au")))
        .when(m == 2, F.concat(F.lit("site"), d, F.lit(".example.org")))
        .when(m == 3, F.concat(F.lit("deep.x.site"), d, F.lit(".ac.uk")))
        .otherwise(F.concat(F.lit("host"), d))
    )
    return registrable_domain(docs.select(host.alias("host")))


def q_index_search_phrase(spark, sf_dir):
    """Exact consecutive-phrase retrieval (invindex.search_phrase):
    the positional tier above conjunctive AND — query term i voting
    for anchor pos−i turns a phrase occurrence into a (doc, anchor)
    group of size |q|, ONE aggregation instead of a |q|-way
    positional self-join; duplicate phrase words need no special
    case. Broadcast query dim, exact counts, TakeOrderedAndProject
    top-k, doc-id ties."""
    from dblp_crawler_spark.operators.invindex import search_phrase

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return search_phrase(docs, ["key", "order"], k=20)


def q_jpeg_structure(spark, sf_dir):
    """Decode-free JPEG structure (sniff.jpeg_structure): the SOF
    marker type (FFC2 = progressive — breaks streaming decoders and
    some loaders) and the first component's sampling byte (0x22 →
    4:2:0, 0x21 → 4:2:2, 0x11 → 4:4:4 — the quality tier CDNs
    silently downgrade), plus component count (1 = grayscale). Same
    bounded-fold walk family as dims/EXIF/DQT, one 256-byte hex
    window. Planted: baseline 4:2:0, progressive 4:4:4, multi-hop
    4:2:2, progressive grayscale, and PNGs (NULLs)."""
    from dblp_crawler_spark.operators.sniff import jpeg_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 5
    h4 = F.format_string("%04X", (F.col("doc_id") % 900 + 100).cast("int"))
    w4 = F.format_string("%04X", ((F.col("doc_id") * 7) % 900 + 100).cast("int"))

    def sof3(marker, hv):
        return F.concat(F.lit(marker + "0011" + "08"), h4, w4,
                        F.lit("03" + "01" + hv + "00" + "021101" + "031101"))

    def sofg(marker):
        return F.concat(F.lit(marker + "000B" + "08"), h4, w4,
                        F.lit("01" + "011100"))

    hexstr = (
        F.when(m == 0, F.concat(F.lit("FFD8" + _EXIF_APP0), sof3("FFC0", "22")))
        .when(m == 1, F.concat(F.lit("FFD8" + _EXIF_APP0), sof3("FFC2", "11")))
        .when(m == 2, F.concat(F.lit("FFD8" + _EXIF_APP0 + _EXIF_APP0), sof3("FFC0", "21")))
        .when(m == 3, F.concat(F.lit("FFD8" + _EXIF_APP0), sofg("FFC2")))
        .otherwise(F.lit(_EXIF_PNG))
    )
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return jpeg_structure(imgs).select(
        "doc_id", "fmt", "progressive", "n_components", "subsampling"
    )


def q_image_bomb_gate(spark, sf_dir):
    """Decompression-bomb gate (sniff.image_bomb_gate): compare
    header-declared dimensions against payload size BEFORE any
    decoder runs — a tiny payload claiming enormous pixels is the
    bomb signature, and this comparison is the only zero-decode
    defense. Integer cross-multiplied ratio (never a float divide);
    unknown dims are NOT safe. Planted: honest small PNGs, a
    67MP+ oversized bomb, a ratio-only bomb (9 MP in 33 bytes —
    under the pixel cap, over the ratio), and unparseable bytes."""
    from dblp_crawler_spark.operators.sniff import image_bomb_gate

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 4

    def png(w_expr, h_expr):
        return F.concat(
            F.lit("89504E470D0A1A0A" + "0000000D49484452"),
            w_expr, h_expr, F.lit("0806000000"),
        )

    w_small = F.format_string("%08X", (F.col("doc_id") % 60 + 20).cast("int"))
    hexstr = (
        F.when(m == 0, png(w_small, F.lit("00000032")))
        .when(m == 1, png(F.lit("00007530"), F.lit("00007530")))   # 30000²
        .when(m == 2, png(F.lit("00000BB8"), F.lit("00000BB8")))   # 3000²
        .otherwise(F.lit("DEADBEEF00112233"))
    )
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return image_bomb_gate(imgs).select(
        "doc_id", "fmt", "width", "height", "pixels", "payload_bytes",
        "oversized", "bomb_ratio", "safe",
    )


def q_sitemap_scheduling_hints(spark, sf_dir):
    """Sitemap scheduling hints (webparse.sitemap_entries_full):
    changefreq + priority — the publisher-declared recrawl priors
    that seed scheduling before any observed change history exists.
    changefreq validated against the spec enum (junk → NULL),
    priority try-cast + range-clamped with the spec's 0.5 default,
    and the integer nominal interval mapping ('never' → NULL: fall
    back to observed change rates). Planted XML cycles valid/invalid
    enums and in/out-of-range/junk/missing priorities."""
    from dblp_crawler_spark.sources.webparse import sitemap_entries_full

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    cf = F.try_element_at(
        F.array(*[F.lit(x) for x in
                  ("daily", "weekly", "SOMETIMES", "monthly", "never", "")]),
        (F.col("doc_id") % 6 + 1).cast("int"),
    )
    pr = F.try_element_at(
        F.array(*[F.lit(x) for x in ("0.8", "1.0", "2.5", "", "0.1", "abc")]),
        (F.col("doc_id") % 6 + 1).cast("int"),
    )
    d = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit("<urlset><url><loc>https://h"), (F.col("doc_id") % 10).cast("string"),
        F.lit(".org/p/"), d, F.lit("</loc>"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("<lastmod>2024-05-0"),
                        (F.col("doc_id") % 9 + 1).cast("string"),
                        F.lit("</lastmod>"))).otherwise(F.lit("")),
        F.when(cf != "", F.concat(F.lit("<changefreq>"), cf,
                                  F.lit("</changefreq>"))).otherwise(F.lit("")),
        F.when(pr != "", F.concat(F.lit("<priority>"), pr,
                                  F.lit("</priority>"))).otherwise(F.lit("")),
        F.lit("</url></urlset>"),
    )
    pages = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string")).alias("host"),
        xml.alias("sitemap_xml"),
    )
    return sitemap_entries_full(pages, keep=["host"])


def q_url_param_significance(spark, sf_dir):
    """Learned query-param canonicalization
    (urlnorm.url_param_significance): tracking params mint unbounded
    distinct URLs for one document; static strip-lists cover the
    famous prefixes, but the general answer is EVIDENCE from the
    fetch log — a param whose value varied while everything else
    (and the content hash) stayed fixed is insignificant, and one
    counterexample vetoes stripping (a pagination/id param can never
    be stripped by accident). Planted: utm varies freely with hashes
    keyed only on (site,page,id) — strippable; id flips the hash in
    every group — vetoed."""
    from dblp_crawler_spark.functions.urlnorm import url_param_significance

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    fetches = docs.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1))).alias("iv")
    ).select(
        F.concat(F.lit("s"), (d % 4).cast("string"), F.lit(".example"))
        .alias("host"),
        F.concat(
            F.lit("https://s"), (d % 4).cast("string"), F.lit(".example/p"),
            F.floor(d / 8).cast("string"), F.lit("?id="),
            F.col("iv").cast("string"), F.lit("&utm="), (d % 5).cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), (d % 4).cast("string"), F.lit("-"),
                 F.floor(d / 8).cast("string"), F.lit("-"),
                 F.col("iv").cast("string")).alias("content_hash"),
    )
    return url_param_significance(fetches)


#: planted X-Robots-Tag header blocks: unscoped pair, 'none', scoped
#: to us, scoped to another bot (ignored), unavailable_after (a
#: directive, not a scope), accumulating case-insensitive headers,
#: no directive at all, and a token-boundary trap.
_XRT_CASES = [
    "HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex, nofollow\r\nContent-Type: image/jpeg",
    "X-Robots-Tag: none",
    "X-Robots-Tag: spark-frontier: noimageindex",
    "X-Robots-Tag: googlebot: noindex",
    "X-Robots-Tag: unavailable_after: 25 Jun 2026 15:00:00 GMT, noarchive",
    "x-robots-tag: noindex\r\nX-ROBOTS-TAG: noarchive",
    "Content-Type: text/html",
    "X-Robots-Tag: noindexing",
]


def q_x_robots_tag(spark, sf_dir):
    """X-Robots-Tag response-header directives
    (webparse.x_robots_tag): the header-level twin of <meta robots> —
    and for an IMAGE crawl the only twin that exists, since a JPEG
    has no meta tag; noimageindex/noindex for binary payloads live
    ONLY here. Lines scoped to another bot are ignored, lines scoped
    to us apply with the scope stripped, unavailable_after is a
    directive not a scope (all pinned); multiple headers accumulate;
    token boundaries reject 'noindexing'."""
    from dblp_crawler_spark.sources.webparse import x_robots_tag

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_XRT_CASES)
    hdr = F.lit(_XRT_CASES[-1])
    for i, hx in enumerate(_XRT_CASES[:-1]):
        hdr = F.when(m == i, F.lit(hx)).otherwise(hdr)
    pages = docs.select(
        F.concat(F.lit("https://x.example/"), F.col("doc_id").cast("string"))
        .alias("url"),
        hdr.alias("headers"),
    )
    return x_robots_tag(pages)


#: planted Retry-After response shapes: delta-seconds, date-minus-
#: Date difference, a past date (clamps to 0), date without a Date
#: header (NULL — no difference exists), malformed, absent on a 503,
#: parsed on a 301 (not rate-limited), and a clean 200.
_RA_CASES = [
    (429, "Retry-After: 120"),
    (503, "Date: Tue, 10 Jun 2025 04:00:00 GMT\r\n"
          "Retry-After: Tue, 10 Jun 2025 04:05:00 GMT"),
    (503, "Date: Tue, 10 Jun 2025 04:00:00 GMT\r\n"
          "Retry-After: Tue, 10 Jun 2025 03:00:00 GMT"),
    (429, "Retry-After: Tue, 10 Jun 2025 04:05:00 GMT"),
    (429, "Retry-After: soon"),
    (503, "Content-Type: text/html"),
    (301, "Retry-After: 30"),
    (200, "Content-Type: image/png"),
]


def q_retry_after(spark, sf_dir):
    """RFC 9110 Retry-After (freshness.retry_after): 429/503 mean the
    server NAMED its backoff price, which a polite crawler honors
    before its own AIMD opinion. Delta-seconds exactly; the HTTP-date
    form as max(0, Retry-After − Date) — difference-only arithmetic
    so timezones cancel (the cache_policy discipline); malformed or
    Date-less date forms NULL-absorb (fall back to own policy, a bad
    origin can never fail a wave). Per-host integration is one
    rollup feeding the politeness delay column."""
    from dblp_crawler_spark.operators.freshness import retry_after

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_RA_CASES)
    st = F.lit(_RA_CASES[-1][0])
    hdr = F.lit(_RA_CASES[-1][1])
    for i, (s, hx) in enumerate(_RA_CASES[:-1]):
        st = F.when(m == i, F.lit(s)).otherwise(st)
        hdr = F.when(m == i, F.lit(hx)).otherwise(hdr)
    resp = docs.select(
        F.concat(F.lit("https://r.example/"), F.col("doc_id").cast("string"))
        .alias("url"),
        st.alias("status"), hdr.alias("headers"),
    )
    return retry_after(resp)


#: planted header-policy responses: cacheable 200, no-store and
#: noarchive (both archive vetoes), image noindex (header-only
#: channel), priced and unpriced rate limits, Retry-After on a 200
#: (not rate-limited), and no-cache + 'none' combined.
_HP_CASES = [
    (200, "Cache-Control: max-age=600"),
    (200, "Cache-Control: no-store"),
    (200, "X-Robots-Tag: noarchive"),
    (200, "Content-Type: image/jpeg\r\nX-Robots-Tag: noimageindex"),
    (429, "Retry-After: 120"),
    (503, "Content-Type: text/html"),
    (200, "Retry-After: 60"),
    (200, "Cache-Control: no-cache, max-age=30\r\nX-Robots-Tag: none"),
]


def q_pipeline_header_policy(spark, sf_dir):
    """Composed header verdict (freshness.header_policy): everything
    a fetch pipeline decides from raw response headers in ONE
    projection — RFC 9111 freshness, RFC 9110 rate-limit backoff,
    and X-Robots-Tag directives (the only robots channel a binary
    image payload has) — built from the SAME column expressions as
    the three stand-alone oracled operators (shared *_cols helpers),
    with the DuckDB replay chaining their replays, so the composition
    is verified against its parts."""
    from dblp_crawler_spark.operators.freshness import header_policy

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_HP_CASES)
    st = F.lit(_HP_CASES[-1][0])
    hdr = F.lit(_HP_CASES[-1][1])
    for i, (s, hx) in enumerate(_HP_CASES[:-1]):
        st = F.when(m == i, F.lit(s)).otherwise(st)
        hdr = F.when(m == i, F.lit(hx)).otherwise(hdr)
    resp = docs.select(
        F.concat(F.lit("https://hp.example/"), F.col("doc_id").cast("string"))
        .alias("url"),
        st.alias("status"), hdr.alias("headers"),
    )
    return header_policy(resp)


def q_hreflang_reciprocity(spark, sf_dir):
    """Translation-graph validation (webparse.hreflang_reciprocity):
    search engines ignore non-reciprocal hreflang pairs, and a
    one-way declaration is exactly the spam shape where a scraped
    copy claims to be a translation of a page that never heard of it.
    Three-state: true on a back edge (a self-declaration is its own —
    the spec REQUIRES the self row), false when the target was
    crawled but declares nothing back, NULL when the target is not
    yet a source (unverifiable, not broken). Two equi-joins."""
    from dblp_crawler_spark.sources.webparse import hreflang_reciprocity

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    g = F.floor(F.col("doc_id") / 5).cast("string")
    m = F.col("doc_id") % 5
    u = lambda sfx: F.concat(F.lit("https://h.example/u"), g, F.lit(sfx))  # noqa: E731
    url = (F.when(m == 0, u(".en")).when(m == 1, u(".de"))
           .when(m == 2, u(".en")).when(m == 3, u(".fr"))
           .otherwise(u(".fr")))
    lang = (F.when(m == 0, "de").when(m == 1, "en").when(m == 2, "it")
            .when(m == 3, "de").otherwise("fr"))
    alt = (F.when(m == 0, u(".de")).when(m == 1, u(".en"))
           .when(m == 2, u(".it")).when(m == 3, u(".de"))
           .otherwise(u(".fr")))
    alts = docs.select(url.alias("url"), lang.alias("hreflang"),
                       alt.alias("alt_url"))
    return hreflang_reciprocity(alts)


#: 4 scenarios × 4 parts per url: complete split, duplicated-part gap
#: (byte 500-749 never arrives), overlapping-but-complete, and a
#: late-start + over-declared tail (clamped; gap at byte 0).
_CR_PARTS = [
    (0, 249), (250, 499), (500, 749), (750, 999),        # complete
    (0, 249), (250, 499), (250, 499), (750, 999),        # gap
    (0, 399), (200, 599), (400, 799), (600, 999),        # overlap
    (100, 499), (500, 1099), (500, 749), (750, 999),     # late + clamp
]


def q_range_reassembly(spark, sf_dir):
    """Content-Range reassembly audit (freshness.range_reassembly):
    large media arrives as 206 parts and the pipeline must PROVE it
    holds every byte before reassembly — a missing middle chunk is a
    silently-corrupt image. Interval union with ONE per-url window
    (running max of prior clamped ends; overlaps never double-count),
    gap detection, and ends clamped to total−1 so an over-declaring
    server can't fake completeness. Parser + rollup verified as one
    chain."""
    from dblp_crawler_spark.operators.freshness import (
        content_range_parts,
        range_reassembly,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    idx = (F.floor(d / 4) % 4) * 4 + d % 4
    s = F.lit(_CR_PARTS[-1][0])
    e = F.lit(_CR_PARTS[-1][1])
    for i, (ps, pe) in enumerate(_CR_PARTS[:-1]):
        s = F.when(idx == i, F.lit(ps)).otherwise(s)
        e = F.when(idx == i, F.lit(pe)).otherwise(e)
    resp = docs.select(
        F.concat(F.lit("https://m.example/f"),
                 F.floor(d / 4).cast("string")).alias("url"),
        F.concat(F.lit("Content-Range: bytes "), s.cast("string"),
                 F.lit("-"), e.cast("string"), F.lit("/1000"))
        .alias("headers"),
    )
    return range_reassembly(content_range_parts(resp))


#: planted validator headers: strong ETag, Last-Modified only, both
#: (If-None-Match first), neither, and a weak ETag with trailing
#: whitespace (trimmed; W/ prefix and quotes echoed verbatim).
_RV_CASES = [
    'ETag: "abc123"\r\nContent-Type: text/html',
    "Last-Modified: Tue, 10 Jun 2025 04:00:00 GMT",
    'Last-Modified: Tue, 10 Jun 2025 04:00:00 GMT\r\nETag: W/"weak-1"',
    "Content-Type: image/png",
    'ETag: W/"w2"  \r\nX: y',
]


def q_revalidation_headers(spark, sf_dir):
    """Conditional-GET validators (freshness.revalidation_headers):
    the revalidate tier of fetch_plan needs the stored ETag /
    Last-Modified to ask '304?' instead of refetching bytes — and the
    spec's rule is ECHO VERBATIM (If-Modified-Since must be
    byte-identical to the stored Last-Modified; an ETag keeps its W/
    prefix and quotes), so extraction is string-exact, never a parse.
    Both validators present → both conditions sent (origins must
    prefer If-None-Match); none → NULL, the tier degrades to a plain
    fetch."""
    from dblp_crawler_spark.operators.freshness import revalidation_headers

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_RV_CASES)
    hdr = F.lit(_RV_CASES[-1])
    for i, hx in enumerate(_RV_CASES[:-1]):
        hdr = F.when(m == i, F.lit(hx)).otherwise(hdr)
    resp = docs.select(
        F.concat(F.lit("https://v.example/"), F.col("doc_id").cast("string"))
        .alias("url"),
        hdr.alias("headers"),
    )
    return revalidation_headers(resp)


def q_strip_boilerplate(spark, sf_dir):
    """Host-frequency boilerplate removal (webparse.
    strip_boilerplate): nav bars, cookie banners and footers repeat
    on every page of a host — invisible to per-page heuristics, the
    signal is cross-page frequency (distinct-page counted, so a page
    repeating its OWN line is repetition, not boilerplate). Planted:
    per-host nav+footer lines over unique bodies (stripped), and
    one-page-per-host solo rows (below min_pages — no evidence, no
    removal)."""
    from dblp_crawler_spark.sources.webparse import strip_boilerplate

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    m6 = d % 6
    host = F.when(m6 == 5, F.concat(F.lit("solo"), d.cast("string"))) \
            .otherwise(F.concat(F.lit("b"), m6.cast("string"), F.lit(".example")))
    nav = F.concat(F.lit("Home | About | b"), m6.cast("string"))
    foot = F.concat(F.lit("(c) 2026 host b"), m6.cast("string"))
    text = F.concat(
        nav, F.lit("\nbody "), d.cast("string"), F.lit(" alpha\n\nbody "),
        d.cast("string"), F.lit(" beta\n"), foot,
    )
    pages = docs.select(
        host.alias("host"),
        F.concat(F.lit("/p"), d.cast("string")).alias("url"),
        text.alias("text"),
    )
    return strip_boilerplate(pages)


_HSC_JPEG_OK = "FFD8FFE000104A46494600010100000100010000" + "FFD9"
_HSC_JPEG_CUT = "FFD8FFE000104A46494600010100000100010000"
_HSC_GIF_OK = "474946383961" + "1000" + "1000" + "00" * 6 + "3B"
_HSC_BMP = "424D" + "00" * 20


def _hsc_frames(spark, sf_dir):
    """The planted (probes, pages, payloads) triple shared by
    q_pipeline_host_scorecard and q_pipeline_reputation_budget."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    m8 = d % 8
    host = F.concat(F.lit("c"), m8.cast("string"))
    blk = F.floor(d / 8) % 2 == 0

    probes = docs.select(
        "doc_id",
        F.explode(F.array(F.lit("crawler"), F.lit("browser"))).alias("ua_class"),
    )
    div = m8.isin(0, 1)
    probes = probes.filter(
        ~((m8 == 6) & (F.col("ua_class") == "browser"))
    ).select(
        host.alias("host"),
        F.concat(F.lit("/u"), d.cast("string")).alias("url"),
        "ua_class",
        F.when(div, F.concat(F.lit("h"), d.cast("string"), F.lit("-"),
                             F.col("ua_class")))
        .otherwise(F.concat(F.lit("h"), d.cast("string"))).alias("content_hash"),
    )
    pages = docs.select(
        host.alias("host"),
        F.concat(F.lit("/u"), d.cast("string")).alias("url"),
        F.when(m8.isin(0, 2) & blk,
               F.concat(F.lit("TPL"), m8.cast("string")))
        .otherwise(F.concat(F.lit("u"), d.cast("string")))
        .alias("content_hash"),
    )
    pay_hex = (
        F.when((m8 == 3) & blk, F.lit(_HSC_JPEG_CUT))
        .when(m8 == 3, F.lit(_HSC_JPEG_OK))
        .when(m8 == 4, F.lit(_HSC_BMP))
        .otherwise(F.lit(_HSC_GIF_OK))
    )
    payloads = docs.select(host.alias("host"),
                           F.unhex(pay_hex).alias("bytes"))
    return probes, pages, payloads


def q_pipeline_host_scorecard(spark, sf_dir):
    """Composed host reputation (hostdup.host_scorecard): the rollup
    a frontier consults before granting budget — UA cloaking, soft-404
    templates, and payload truncation folded into ONE transparent
    integer score per host, each signal an already-oracled operator
    and the DuckDB replay chaining the same fragments. Planted: c0
    cloaks AND serves a half-share soft-404 template (flagged), c1
    cloaks only (400 < 500, watched but not flagged), c2 soft-404s,
    c3 truncates half its payloads, c4 serves only no-trailer-
    convention bmps (no evidence is NOT truncation), the rest clean."""
    from dblp_crawler_spark.operators.hostdup import host_scorecard

    probes, pages, payloads = _hsc_frames(spark, sf_dir)
    return host_scorecard(probes, pages, payloads)


def q_pipeline_reputation_budget(spark, sf_dir):
    """Reputation-weighted budget (host_scorecard →
    budget.host_budget_alloc): the frontier-loop closure — pathology
    evidence becomes fetch slots. Flagged hosts get weight 0 (no
    budget at all), watched hosts weight 1000−score, clean hosts
    1000; the largest-remainder apportionment then splits 1000 slots
    EXACTLY (sum == budget, remainder ties by host asc). Both stages
    are already-oracled operators; the replay chains the scorecard
    fragments into the same integer apportionment."""
    from dblp_crawler_spark.operators.budget import host_budget_alloc
    from dblp_crawler_spark.operators.hostdup import host_scorecard

    probes, pages, payloads = _hsc_frames(spark, sf_dir)
    sc = host_scorecard(probes, pages, payloads)
    weights = sc.select(
        "host",
        F.when(F.col("flagged"), F.lit(0).cast("long"))
        .otherwise(F.lit(1000) - F.col("score")).alias("weight"),
    )
    return host_budget_alloc(weights, budget=1000)


def q_interleaved_segments(spark, sf_dir):
    """Interleaved multimodal samples (webparse.
    interleaved_segments): pretraining wants the PAGE as a sequence —
    text block, image, text block (the MMC4/OBELICS shape) — because
    grounding is learned from adjacency, so ORDER is the payload.
    Sentinel capture-replace (no lookahead — RE2; the tag keeps its
    spelling), one explode, two ordered slots per piece; srcless
    imgs split but emit nothing, empty inter-image text emits
    nothing, entities decode through the shared html_to_text chain.
    Planted pages vary image count and casing by doc."""
    from dblp_crawler_spark.sources.webparse import interleaved_segments

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><p>intro &amp; doc "), d,
        F.lit('</p><IMG src="https://i.ex/'), d, F.lit('-1.jpg">'),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit('<img src="https://i.ex/'), d,
                        F.lit("-2.png\"/>"))).otherwise(F.lit("<p>mid</p>")),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit('<img data-x="no src">')).otherwise(F.lit("")),
        F.lit("<p>tail "), d, F.lit("</p></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://i.ex/p"), d).alias("url"),
        html.alias("html"),
    )
    return interleaved_segments(pages)


#: planted percent-encoding shapes (joined with a per-doc path)
_PCT_CASES = [
    "/%7euser/%41%42?x=%2Fpath%3a1",   # decode unreserved, keep reserved
    "/plain",
    "/bad%zz%4",                       # malformed triplets untouched
    "/pct%2525",                       # %25 never double-decodes
    "/mixed%2d%2E%5f%7E",              # - . _ ~ all decode
]


def q_percent_normalize(spark, sf_dir):
    """RFC 3986 §6.2.2 percent-encoding normalization
    (urlnorm.percent_normalize): %7Euser and ~user are THE SAME
    resource — a frontier that doesn't normalize stores and fetches
    both spellings. Unreserved octets decode (ALPHA/DIGIT/-._~),
    every surviving triplet uppercases (%3a→%3A), reserved octets
    NEVER decode (%2F is not /; %25 never double-decodes), malformed
    triplets pass untouched — all pinned. The decode table renders
    BOTH the Spark when-chain and the SQL CASE, so the engines
    cannot drift."""
    from dblp_crawler_spark.functions.urlnorm import percent_normalize

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_PCT_CASES)
    tail = F.lit(_PCT_CASES[-1])
    for i, c in enumerate(_PCT_CASES[:-1]):
        tail = F.when(m == i, F.lit(c)).otherwise(tail)
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("https://p"), (F.col("doc_id") % 4).cast("string"),
                 F.lit(".example"), tail).alias("url"),
    )
    return urls.select("doc_id", "url",
                       percent_normalize("url").alias("normalized"))


def q_sitemap_scope_check(spark, sf_dir):
    """Sitemap scope validation (webparse.sitemap_scope_check): the
    protocol's injection defense — a sitemap may only DESCRIBE URLs
    on its own host at or below its own directory, otherwise any
    site could inject arbitrary-host URLs into a frontier through
    its own sitemap. Planted: in-scope entries (same dir, below dir,
    case-folded host), an above-dir entry, and a cross-host
    injection attempt."""
    from dblp_crawler_spark.sources.webparse import sitemap_scope_check

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    sm = F.concat(F.lit("https://s"), (d % 4).cast("string"),
                  F.lit(".example/news/sitemap.xml"))
    m5 = d % 5
    url = (
        F.when(m5 == 0, F.concat(F.lit("https://s"), (d % 4).cast("string"),
                                 F.lit(".example/news/p"), d.cast("string")))
        .when(m5 == 1, F.concat(F.lit("https://s"), (d % 4).cast("string"),
                                F.lit(".example/news/sub/p"), d.cast("string")))
        .when(m5 == 2, F.concat(F.lit("https://S"), (d % 4).cast("string"),
                                F.lit(".EXAMPLE/news/p"), d.cast("string")))
        .when(m5 == 3, F.concat(F.lit("https://s"), (d % 4).cast("string"),
                                F.lit(".example/blog/p"), d.cast("string")))
        .otherwise(F.concat(F.lit("https://evil.example/news/p"),
                            d.cast("string")))
    )
    entries = docs.select("doc_id", sm.alias("sitemap_url"), url.alias("url"))
    return sitemap_scope_check(entries)


def q_cloaking_detect(spark, sf_dir):
    """UA-conditional cloaking (hostdup.cloaking_detect): SEO spam
    shows bots keyword farms, bot-walls show bots interstitials —
    poison invisible to every per-page check because the corpus only
    holds the crawler's copy. Paired probes (same URL fetched under
    both UA classes) with differing content hashes are divergence
    evidence; a host cloaks at ≥30% divergence over ≥3 pairs (exact
    integer cross-multiply). Planted: two always-divergent hosts, a
    quarter-divergent host (250‰ < 300‰ — stays clean), a
    crawler-only host (unpaired probes never count), and honest
    hosts."""
    from dblp_crawler_spark.operators.hostdup import cloaking_detect

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    fetches = docs.select(
        "doc_id",
        F.explode(F.array(F.lit("crawler"), F.lit("browser"))).alias("ua_class"),
    )
    m8 = d % 8
    div = m8.isin(0, 1) | ((m8 == 7) & (F.floor(d / 8) % 4 == 0))
    fetches = fetches.filter(
        ~((m8 == 6) & (F.col("ua_class") == "browser"))
    ).select(
        F.concat(F.lit("c"), m8.cast("string")).alias("host"),
        F.concat(F.lit("/u"), d.cast("string")).alias("url"),
        "ua_class",
        F.when(div, F.concat(F.lit("h"), d.cast("string"), F.lit("-"),
                             F.col("ua_class")))
        .otherwise(F.concat(F.lit("h"), d.cast("string"))).alias("content_hash"),
    )
    return cloaking_detect(fetches)


def q_feed_entries(spark, sf_dir):
    """RSS/Atom feed discovery (webparse.feed_entries): the PUSH
    channel next to sitemaps' pull tier — news/blog hosts surface new
    URLs in feeds minutes after publish, with a per-entry date that
    seeds recrawl freshness exactly like sitemap lastmod. Planted XML
    cycles an RSS feed (valid RFC 1123 pubDate + a linkless item that
    drops), an RSS item with a junk month (published NULL, row kept),
    an Atom feed (ISO updated; first link href wins), and a page
    carrying BOTH forms (emits both kinds)."""
    from dblp_crawler_spark.sources.webparse import feed_entries

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id").cast("string")
    h = (F.col("doc_id") % 7).cast("string")
    day = (F.col("doc_id") % 27 + 1).cast("string")
    aday = F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
    rss_item = F.concat(
        F.lit("<item><link>https://f"), h, F.lit(".example/p/"), d,
        F.lit("</link><pubDate>Tue, "), day,
        F.lit(" Jun 2025 04:00:00 GMT</pubDate></item>"),
        F.lit("<item><title>nolink</title></item>"),
    )
    rss_junk = F.concat(
        F.lit("<item><link>https://f"), h, F.lit(".example/j/"), d,
        F.lit("</link><pubDate>Tue, 5 Foo 2025 04:00:00 GMT</pubDate></item>"),
    )
    atom_entry = F.concat(
        F.lit('<entry><link rel="self" href="https://f'), h,
        F.lit(".example/a/"), d, F.lit('"/><updated>2025-11-'), aday,
        F.lit("T00:00:00Z</updated></entry>"),
    )
    m = F.col("doc_id") % 4
    xml = (
        F.when(m == 0, F.concat(F.lit("<rss><channel>"), rss_item,
                                F.lit("</channel></rss>")))
        .when(m == 1, F.concat(F.lit("<rss><channel>"), rss_junk,
                               F.lit("</channel></rss>")))
        .when(m == 2, F.concat(F.lit("<feed>"), atom_entry, F.lit("</feed>")))
        .otherwise(F.concat(F.lit("<rss><channel>"), rss_item,
                            F.lit("</channel></rss><feed>"), atom_entry,
                            F.lit("</feed>")))
    )
    pages = docs.select("doc_id", xml.alias("feed_xml"))
    return feed_entries(pages, keep=["doc_id"])


def q_ann_binary_hamming(spark, sf_dir):
    """Binary sign-quantized ANN (similarity.binary_hamming_topk):
    the memory-minimum retrieval tier next to PQ — 64-dim float32
    vectors (256 B) collapse to 8 B sign codes (bit i = v[i] > 0,
    packed 32 bits/word), hamming on codes is the Charikar angular
    surrogate, and the brute scan reads 32× fewer bytes. Exact
    integer distances, deterministic ties, self-matches excluded;
    the oracle replays packing, the xor/bit_count fold, and the
    per-query rank."""
    from dblp_crawler_spark.operators.similarity import binary_hamming_topk

    vecs = _t(spark, sf_dir, "embeddings")
    return binary_hamming_topk(vecs, F.col("vec_id") % 50 == 0, k=10)


def q_png_structure(spark, sf_dir):
    """PNG structure from fixed IHDR offsets (sniff.png_structure):
    bit depth (16-bit masters vs web 8-bit), color type (palette
    images route through a PLTE decode path; 4/6 carry alpha), and
    Adam7 interlacing — the PNG sibling of jpeg_structure. Planted:
    rgba-8, palette-8, gray-16 interlaced, rgb-8, and JPEG rows
    (NULLs)."""
    from dblp_crawler_spark.operators.sniff import png_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    pre = "89504E470D0A1A0A" + "0000000D49484452" + "0000004000000040"
    m = F.col("doc_id") % 5
    hexstr = (
        F.when(m == 0, F.lit(pre + "0806" + "0000" + "00"))   # rgba 8
        .when(m == 1, F.lit(pre + "0803" + "0000" + "00"))    # palette 8
        .when(m == 2, F.lit(pre + "1000" + "0000" + "01"))    # gray 16, Adam7
        .when(m == 3, F.lit(pre + "0802" + "0000" + "00"))    # rgb 8
        .otherwise(F.lit("FFD8" + _EXIF_APP0))                # jpeg → NULLs
    )
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return png_structure(imgs).select(
        "doc_id", "fmt", "bit_depth", "color_type", "interlaced", "has_alpha"
    )


_WEBP_RIFF = "52494646" + "24000000" + "57454250"
_WEBP_CASES = [
    # lossy 320x240 with the 2 scaling bits set (mask test)
    _WEBP_RIFF + "56503820" + "10000000" + "000000" + "9D012A" + "4041F000",
    # lossless 100x50 + alpha bit (bits = 99 | 49<<14 | 1<<28)
    _WEBP_RIFF + "5650384C" + "0D000000" + "2F" + "63400C10",
    # extended animated + alpha, canvas 1024x768
    _WEBP_RIFF + "56503858" + "0A000000" + "12" + "000000" + "FF0300FF0200",
    # extended still, no alpha, 64x32
    _WEBP_RIFF + "56503858" + "0A000000" + "00" + "000000" + "3F00001F0000",
    # truncated before the flags byte → NULL structure
    _WEBP_RIFF + "56503858" + "0A000000",
]


def q_webp_structure(spark, sf_dir):
    """WebP container structure (sniff.webp_structure): variant
    routing (lossy 'VP8 ' / lossless 'VP8L' / extended 'VP8X'), dims
    (14-bit masked lossy, LE32 bit-packed lossless, LE24 canvas
    extended), alpha and animation flags — the decode-free header
    tier for the dominant modern web image format, sibling of
    jpeg_structure/png_structure. Planted: all three variants incl.
    a scaled lossy and an animated VP8X, a truncated VP8X, and a PNG
    row (NULLs)."""
    from dblp_crawler_spark.operators.sniff import webp_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 6
    hexstr = F.lit("89504E470D0A1A0A" + "0000000D49484452")
    for i, hx in enumerate(_WEBP_CASES):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return webp_structure(imgs).select(
        "doc_id", "fmt", "variant", "width", "height", "has_alpha",
        "is_animated"
    )


_GIF_HDR89 = "474946383961" + "0A000A00" + "A1" + "02" + "00"
_GIF_GCT4 = "FF0000" + "00FF00" + "0000FF" + "FFFFFF"
_GIF_SIG = "21FF0B" + "4E45545343415045322E30"
_GIF_CASES = [
    _GIF_HDR89 + _GIF_GCT4 + "2C00000000" + "3B",            # static 89a
    _GIF_HDR89 + _GIF_GCT4 + _GIF_SIG + "030100000000" + "3B",  # animated
    "474946383761" + "05000500" + "00" + "00" + "00",        # 87a no GCT
    # misaligned NETSCAPE bytes inside a 16-entry GCT (hint stays F)
    "474946383961" + "0A000A00" + "83" + "05" + "00"
    + "4" + _GIF_SIG + "0" + "00" * 33,
    "474946383961",                                          # truncated
]


def q_gif_structure(spark, sf_dir):
    """GIF header structure (sniff.gif_structure): version, global
    color table flag + 2^(N+1) palette size, background index, and a
    byte-aligned NETSCAPE2.0 animation hint (looping animated GIFs
    carry the application extension before the first frame; the
    aligned-containment regex refuses palette bytes that spell the
    signature across a byte boundary — planted). Sibling of the
    jpeg/png/webp structure tiers."""
    from dblp_crawler_spark.operators.sniff import gif_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 6
    hexstr = F.lit("89504E470D0A1A0A" + "0000000D49484452")
    for i, hx in enumerate(_GIF_CASES):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return gif_structure(imgs).select(
        "doc_id", "fmt", "version", "has_gct", "palette_size", "bg_index",
        "is_animated_hint"
    )


def _dto_fixture_hex(dt: str, le: bool = True) -> str:
    """JPEG + APP1/Exif carrying DateTimeOriginal `dt` behind the
    IFD0 → Exif-sub-IFD pointer chain (both endiannesses)."""
    def ent(tag, typ, cnt, val8):
        if le:
            return (f"{tag & 255:02X}{tag >> 8:02X}" + f"{typ:02X}00"
                    + f"{cnt:02X}000000" + val8)
        return f"{tag:04X}" + f"00{typ:02X}" + f"{cnt:08X}" + val8

    def val4(v):
        if le:
            return f"{v & 255:02X}{(v >> 8) & 255:02X}{(v >> 16) & 255:02X}00"
        return f"{v:08X}"

    sub_off = 8 + 2 + 2 * 12 + 4
    str_off = sub_off + 2 + 12 + 4
    ifd0 = (("0200" if le else "0002")
            + ent(0x0112, 3, 1, "01000000" if le else "00010000")
            + ent(0x8769, 4, 1, val4(sub_off)) + "00000000")
    sub = (("0100" if le else "0001")
           + ent(0x9003, 2, 20, val4(str_off)) + "00000000")
    payload = (dt.encode() + b"\x00").hex().upper()
    tiff = (("49492A00" + "08000000") if le else ("4D4D002A" + "00000008")) \
        + ifd0 + sub + payload
    seg_len = 2 + 6 + len(tiff) // 2
    app0 = "FFE00010" + "4A46494600" + "00" * 9
    return "FFD8" + app0 + "FFE1" + f"{seg_len:04X}" + "457869660000" + tiff


_DTO_CASES = [
    _dto_fixture_hex("2019:03:02 08:15:00"),
    _dto_fixture_hex("2024:11:30 23:59:59", le=False),
    _dto_fixture_hex("2021:06:15 12:00:0X"),   # corrupt → NULL
    "89504E470D0A1A0A" + "0000000D49484452",   # png → NULL
]


def q_exif_datetime(spark, sf_dir):
    """EXIF DateTimeOriginal (sniff.exif_datetime): the capture-time
    provenance signal, read through the two-level IFD0 → Exif-sub-IFD
    walk (tag 0x8769 pointer, then tag 0x9003's offset-addressed
    20-byte ASCII value), hex-signature-validated before decode so
    corrupt offsets NULL out. Planted: both endiannesses, a corrupt
    timestamp, and a PNG row."""
    from dblp_crawler_spark.operators.sniff import exif_datetime

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 4
    hexstr = F.lit(_DTO_CASES[-1])
    for i, hx in enumerate(_DTO_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return exif_datetime(imgs).select(
        "doc_id", "fmt", "datetime_original", "capture_year"
    )


def q_soft404_detect(spark, sf_dir):
    """Soft-404 template detection (hostdup.soft404_detect): hosts
    answering missing URLs with HTTP 200 and one shared error page
    are invisible to per-URL checks — the signal is a content hash
    dominating the host's pages (share ≥ 40%, support ≥ 5). Planted:
    hosts 3 and 7 serve a template on half their pages (flagged);
    every other host is all-unique (clean). Exact integer
    cross-product threshold, one (host, hash) rollup."""
    from dblp_crawler_spark.operators.hostdup import soft404_detect

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string"))
    tpl = F.col("doc_id") % 10
    hsh = F.when(
        tpl.isin(3, 7) & ((F.col("doc_id") % 20) < 10),
        F.concat(F.lit("tpl"), tpl.cast("string")),
    ).otherwise(F.concat(F.lit("c"), F.col("doc_id").cast("string")))
    pages = docs.select(
        F.concat(F.lit("https://"), host, F.lit("/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        host.alias("host"), hsh.alias("content_hash"),
    )
    return soft404_detect(pages).select(
        "url", "host", "content_hash", "template_n", "host_n", "is_soft404"
    )


def q_mirror_hosts(spark, sf_dir):
    """Mirror-host detection (hostdup.mirror_host_pairs): two hosts
    serving the same content set waste one host's whole fetch budget
    — found from seen-set data via a content-hash-blocked host-pair
    join (never all-pairs; hashes on >16 hosts are boilerplate and
    dropped before the join). Planted: hosts h1/h11 share one 7-hash
    cycle (containment 1.0), everything else unique."""
    from dblp_crawler_spark.operators.hostdup import mirror_host_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"))
    hsh = F.when(
        (F.col("doc_id") % 20).isin(1, 11),
        F.concat(F.lit("m"), (F.col("doc_id") % 7).cast("string")),
    ).otherwise(F.concat(F.lit("c"), F.col("doc_id").cast("string")))
    pages = docs.select(host.alias("host"), hsh.alias("content_hash"))
    return mirror_host_pairs(pages)


def q_isobmff_structure(spark, sf_dir):
    """ISO-BMFF container structure (sniff.isobmff_structure): the
    major brand routes a payload the magic sniff can only call 'mp4'
    to an image (avif/heic) vs video pipeline; AVIF/HEIC dims come
    from the aligned 'ispe' box, video duration from the
    version-aware 'mvhd' box (exact integer duration div timescale).
    Planted: avif + heic stills, v0 and v1 movie headers, a
    zero-timescale guard, and a PNG row."""
    from dblp_crawler_spark.operators.sniff import isobmff_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 6
    hexstr = F.lit("89504E470D0A1A0A" + "0000000D49484452")
    for i, hx in enumerate(_ISOBMFF_CASES):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return isobmff_structure(imgs).select(
        "doc_id", "fmt", "brand", "width", "height", "duration_sec"
    )


def _bmff_box(fourcc_hex: str, payload_hex: str) -> str:
    size = 8 + len(payload_hex) // 2
    return f"{size:08X}" + fourcc_hex + payload_hex


def _bmff_ftyp(brand_hex: str) -> str:
    return _bmff_box("66747970", brand_hex + "00000000" + brand_hex)


_ISPE_640 = _bmff_box("69737065", "00000000" + "00000280" + "000001E0")
_ISOBMFF_CASES = [
    _bmff_ftyp("61766966") + _ISPE_640,                        # avif 640x480
    _bmff_ftyp("68656963") + _ISPE_640,                        # heic
    _bmff_ftyp("6D703432") + _bmff_box(                        # mp4 v0, 30 s
        "6D766864", "00000000" + "00000000" + "00000000"
        + "000003E8" + "00007530"),
    _bmff_ftyp("69736F6D") + _bmff_box(                        # mp4 v1, 12 s
        "6D766864", "01000000" + "00" * 16
        + "000003E8" + "0000000000002EE0"),
    _bmff_ftyp("6D703431") + _bmff_box(                        # ts=0 guard
        "6D766864", "00000000" + "00000000" + "00000000"
        + "00000000" + "00007530"),
]


def q_url_resolve(spark, sf_dir):
    """Relative-href resolution (urlnorm.resolve_url): the parse-time
    step canonical_url defers to — absolute pass-through, scheme
    filtering (javascript:/mailto: → NULL), protocol-/root-relative,
    query-only, and RFC 3986 dot-segment removal with above-root
    clamping, query part untouched. Cycled over nine href shapes per
    doc."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    base = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                    F.lit(".org/a/b/page"), sid, F.lit(".html"))
    m = F.col("doc_id") % 9
    href = (
        F.when(m == 0, F.concat(F.lit("x"), sid, F.lit(".html")))
        .when(m == 1, F.concat(F.lit("../up"), sid, F.lit(".html")))
        .when(m == 2, F.concat(F.lit("../../../root"), sid, F.lit(".html")))
        .when(m == 3, F.concat(F.lit("/abs/"), sid))
        .when(m == 4, F.concat(F.lit("//cdn.org/i"), sid, F.lit(".png")))
        .when(m == 5, F.concat(F.lit("?q="), sid))
        .when(m == 6, F.lit("javascript:void(0)"))
        .when(m == 7, F.concat(F.lit("a/./b/../c"), sid, F.lit(".html#f")))
        .otherwise(F.lit("#frag"))
    )
    return docs.select(
        "doc_id", base.alias("base"), href.alias("href"),
        resolve_url(base, href).alias("resolved"),
    )


_OUTLINK_HTML_SPARK = None  # built inline below; oracle mirrors it


def q_extract_outlinks(spark, sf_dir):
    """HTML outlink extraction (webparse.extract_outlinks): the
    generic-HTML frontier expansion source — every <a href> (quoted
    or bare) resolved against the page URL, non-fetchable schemes
    and self-fragments dropped, edges deduped. The reference expands
    only through dblp's XML API; anchors are how a web-scale
    frontier grows."""
    from dblp_crawler_spark.sources.webparse import extract_outlinks

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org/dir/p"), sid, F.lit(".html"))
    html = F.concat(
        F.lit('<a href="n'), sid, F.lit('.html">a</a>'),
        F.lit("<a href='/abs/"), (F.col("doc_id") % 7).cast("string"),
        F.lit("'>b</a>"),
        F.lit("<a href=../up"), (F.col("doc_id") % 5).cast("string"),
        F.lit(">c</a>"),
        F.lit('<a href="javascript:void(0)">d</a>'),
        F.lit('<a href="#x">e</a>'),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return extract_outlinks(pages)


def q_extract_images(spark, sf_dir):
    """<img>/srcset extraction (webparse.extract_images): the
    image+caption PAIR source of this graft cell — alt text is the
    caption the curation gates consume; srcset's widest candidate
    (highest w, then x, then first) wins over src; data: URIs drop."""
    from dblp_crawler_spark.sources.webparse import extract_images

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org/g/p"), sid, F.lit(".html"))
    html = F.concat(
        F.lit('<img srcset="s'), sid, F.lit(".jpg 320w, l"), sid,
        F.lit('.jpg 1280w" src="f'), sid, F.lit('.jpg" alt="cap '),
        (F.col("doc_id") % 5).cast("string"), F.lit('">'),
        F.lit('<img src="/i/'), sid, F.lit('.png">'),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit('<img srcset="lo.png 1x, hi.png 2x" alt=bare>'))
        .otherwise(F.lit("")),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return extract_images(pages)


_DU_PNG_HEX = ("89504E470D0A1A0A" + "0000000D49484452"
               + "00000028" + "0000001E" + "0802000000")


def q_figure_captions(spark, sf_dir):
    """<figure>/<figcaption> extraction (webparse.figure_captions):
    the figcaption is an EDITORIAL caption written for the reader —
    typically the highest-quality text a page offers about its
    image, above alt text (accessibility fallback) and og tags (one
    per page). First <img> per figure, markup stripped from the
    caption, figures without a figcaption kept with NULL caption
    (absence is evidence), img-less figures dropped."""
    from dblp_crawler_spark.sources.webparse import figure_captions

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org/g/p"), sid, F.lit(".html"))
    html = F.concat(
        F.lit('<figure><img src="/i/f'), sid,
        F.lit('.jpg" alt="alt"><figcaption>Figure '), sid,
        F.lit(": a <b>bold</b>\n  claim</figcaption></figure>"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit('<figure><img src="bare'), sid,
                        F.lit('.png"></figure>')))
        .otherwise(F.lit("")),
        F.lit("<figure><figcaption>orphan</figcaption></figure>"),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return figure_captions(pages)


def q_data_uri_images(spark, sf_dir):
    """Inline data:-URI image mining (webparse.data_uri_images):
    images embedded in the HTML never hit the fetch pipeline — no
    URL to schedule, no store row — so they are invisible unless
    mined from the page itself; the decoded payload runs the SAME
    sniff + header-dims tiers as fetched bytes (a data:image/gif URI
    lying about its PNG payload is caught exactly like a lying
    Content-Type). Planted: a true PNG, a declared-gif/actual-PNG
    liar, and a plain-URL tag that drops."""
    from dblp_crawler_spark.sources.webparse import data_uri_images

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org/d/p"), sid)
    b64 = F.base64(F.unhex(F.lit(_DU_PNG_HEX)))
    html = F.concat(
        F.lit('<img src="data:image/png;base64,'), b64, F.lit('">'),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit('<img src="data:image/gif;base64,'), b64,
                        F.lit('">')))
        .otherwise(F.lit("")),
        F.lit('<img src="https://cdn.ex.org/r'), sid, F.lit('.jpg">'),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return data_uri_images(pages)


def q_lazyload_images(spark, sf_dir):
    """Lazy-load salvage (webparse.lazyload_images): the modern
    below-the-fold idiom keeps a placeholder in src while data-src /
    data-srcset carries the real asset — a src-only harvester misses
    most of a long page's images. Planted: data-src salvage,
    data-srcset fallback (first candidate), loading=lazy with a
    data: placeholder and nothing to salvage, and an eager tag."""
    from dblp_crawler_spark.sources.webparse import lazyload_images

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org/l/p"), sid)
    m = F.col("doc_id") % 4
    html = F.concat(
        F.lit('<img src="ph.gif" data-src="/real'), sid, F.lit('.jpg">'),
        F.when(m == 0, F.lit('<img loading="lazy" '
                             'src="data:image/gif;base64,R0lGODlhAQABAA==">'))
        .when(m == 1, F.concat(F.lit('<img data-srcset="/s'), sid,
                               F.lit('.jpg 320w, /l'), sid,
                               F.lit('.jpg 1280w" src="ph.gif">')))
        .when(m == 2, F.concat(F.lit('<img src="/eager'), sid,
                               F.lit('.png" loading="eager">')))
        .otherwise(F.lit("")),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return lazyload_images(pages)


def q_caption_election(spark, sf_dir):
    """Cross-channel caption election (webparse.caption_election):
    a page captions the same image through several channels at once
    — figcaption (editorial, per-image), og:image:alt (editorial,
    page-level), img alt (accessibility fallback) — and the miner
    must pick ONE text per image by channel strength. Composed from
    three already-oracled extractors in ONE plan (union + one
    window); the replay chains the same fragments. Planted per page:
    an image with all three channels (figcaption wins), one with
    og+alt (og wins), one alt-only, and one caption-less (absent
    from the election)."""
    from dblp_crawler_spark.sources.webparse import caption_election

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org/c/p"), sid)
    html = F.concat(
        F.lit('<meta property="og:image" content="/i/two'), sid,
        F.lit('.jpg"><meta property="og:image:alt" content="og cap '), sid,
        F.lit('">'),
        F.lit('<figure><img src="/i/one'), sid,
        F.lit('.jpg"><figcaption>fig cap '), sid,
        F.lit("</figcaption></figure>"),
        F.lit('<img src="/i/one'), sid, F.lit('.jpg" alt="alt one '), sid,
        F.lit('">'),
        F.lit('<img src="/i/two'), sid, F.lit('.jpg" alt="alt two '), sid,
        F.lit('">'),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit('<img src="/i/three'), sid,
                        F.lit('.jpg" alt="alt three '), sid, F.lit('">')))
        .otherwise(F.lit("")),
        F.lit('<img src="/i/four'), sid, F.lit('.jpg">'),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return caption_election(pages)


_PNG_DIM_HDR = "89504E470D0A1A0A" + "0000000D49484452"
_ROLE_HEADERS = [
    _PNG_DIM_HDR + "00000400" + "00000300" + "0802000000",  # 1024x768 content
    _PNG_DIM_HDR + "000002D8" + "0000005A" + "0802000000",  # 728x90 banner
    _PNG_DIM_HDR + "00000040" + "00000040" + "0802000000",  # 64x64 icon
    _PNG_DIM_HDR + "000000A0" + "00000078" + "0802000000",  # 160x120 thumb
]
_PIXEL_HDR = _PNG_DIM_HDR + "00000001" + "00000001" + "0802000000"


def q_image_role(spark, sf_dir):
    """Image role routing (sniff.image_role_classify over
    sniff.image_dims): tracking pixels, icons, banners, and
    thumbnails pollute CLIP-style pairs yet sail through byte gates
    — pure integer geometry over header dims (cross-multiplied
    aspect tests), NULL dims routed to NULL, never silently
    'content'. Planted: all five roles plus a junk payload."""
    from dblp_crawler_spark.operators.sniff import (
        image_dims,
        image_role_classify,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 6
    hexstr = F.lit("FFD8FF")                     # truncated jpeg → NULL dims
    for i, hx in enumerate(_ROLE_HEADERS):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    hexstr = F.when(m == 4, F.lit(_PIXEL_HDR)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return image_role_classify(image_dims(imgs)).select(
        "doc_id", "fmt", "width", "height", "role"
    )


def q_pdf_structure(spark, sf_dir):
    """PDF routing tier (sniff.pdf_structure): version from the
    fixed '%PDF-M.N' header, byte-aligned /Linearized and /Encrypt
    dictionary hints (the linearization dict must sit in the first
    1 KiB per spec; the encrypt ref normally lives in the trailer —
    a documented hint, not an oracle of encryption)."""
    from dblp_crawler_spark.operators.sniff import pdf_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    v17 = "255044462D312E370A"
    lin = v17.replace("312E37", "312E34") + \
        "3C3C202F4C696E6561726973"  # '<< /Linearis' — NOT the key
    lin_real = v17.replace("312E37", "312E34") + "3C3C202F4C696E6561726" \
        "97A65642031203E3E"
    enc = v17.replace("312E37", "312E36") + "2F456E63727970742035"
    m = F.col("doc_id") % 5
    hexstr = (
        F.when(m == 0, F.lit(v17))
        .when(m == 1, F.lit(lin_real))
        .when(m == 2, F.lit(enc))
        .when(m == 3, F.lit(lin))
        .otherwise(F.lit("89504E470D0A1A0A" + "0000000D49484452"))
    )
    pdfs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return pdf_structure(pdfs).select(
        "doc_id", "fmt", "pdf_version", "linearized_hint", "encrypted_hint"
    )


def q_gzip_structure(spark, sf_dir):
    """gzip member header (sniff.gzip_structure): MTIME provenance
    (0 = no timestamp → NULL per RFC 1952), FNAME extracted only
    when declared AND no variable-length FEXTRA shifts the offset,
    printable-validated before decode."""
    from dblp_crawler_spark.operators.sniff import gzip_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    named = ("1F8B0808" + "00CA9A65" + "0003"
             + "64756D702E7761726300" + "AB")    # 'dump.warc\0'
    unnamed = "1F8B0800" + "0094358D" + "0003" + "AB"
    zero_mt = "1F8B0808" + "00000000" + "0003" + "612E74787400"
    fextra = "1F8B080C" + "00A30959" + "0003" + "0200XXXX".replace("X", "0")
    m = F.col("doc_id") % 5
    hexstr = (
        F.when(m == 0, F.lit(named))
        .when(m == 1, F.lit(unnamed))
        .when(m == 2, F.lit(zero_mt))
        .when(m == 3, F.lit(fextra))
        .otherwise(F.lit("89504E470D0A1A0A"))
    )
    blobs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return gzip_structure(blobs).select(
        "doc_id", "fmt", "mtime", "has_fname", "fname"
    )


_WAV_CASES = [
    # CD PCM stereo, data declares 352800 B at 176400 B/s → 2000 ms
    "524946462400000057415645666D7420100000000100020044AC000010B10200"
    "040010006461746120620500",
    # IEEE float mono 48k behind a LIST chunk the walk must hop
    "5249464630000000574156454C49535404000000AAAAAAAA666D742010000000"
    "0300010080BB000000EE0200040020006461746100770100",
    # mulaw 8k mono behind an ODD-sized JUNK chunk (pad rule)
    "5249464630000000574156454A554E4B03000000BBBBBB00666D742010000000"
    "07000100401F0000401F0000010008006461746139300000",
    # data chunk with no fmt chunk: size kept, codec/duration NULL
    "524946460C000000574156456461746100100000",
]

_MP3_CASES = [
    # v2.3 empty tag; MPEG1 L3 128 kbps 44100 stereo
    "49443303000000000000FFFB90000000000000000000",
    # v2.4 129-byte zero tag; MPEG2 L3 48 kbps 22050 mono
    "4944330400000000010100" + "00" * 128 + "FFF362C000000000",
    # v2.4 with footer flag: frame sits 10 bytes later
    "49443304001000000014" + "00" * 30 + "FFFBA04000000000",
    # MPEG2.5 L3 64 kbps 11025 joint stereo
    "49443303000000000000FFE2824000000000",
    # valid tag, garbage where the frame should be
    "494433030000000000040000000041424344",
]


def q_wav_structure(spark, sf_dir):
    """WAV container structure (sniff.wav_structure): RIFF chunk walk
    to the `fmt `/`data` chunks — codec contract (PCM / IEEE float /
    telephony companding), channels, rate, bit width, and an EXACT
    integer duration from the declared data size (bytes × 1000 div
    byte rate) without reading one sample; LIST/JUNK chunks hop with
    RIFF's odd-size pad rule. The audio sibling of png_structure.
    Planted: CD PCM, float-behind-LIST, mulaw-behind-odd-JUNK,
    fmt-less, and a JPEG row (NULLs)."""
    from dblp_crawler_spark.operators.sniff import wav_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 5
    hexstr = F.lit("FFD8FFE00000000000000000")
    for i, hx in enumerate(_WAV_CASES):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    blobs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return wav_structure(blobs).select(
        "doc_id", "fmt", "codec", "channels", "sample_rate",
        "bits_per_sample", "data_bytes", "duration_ms"
    )


def q_mp3_structure(spark, sf_dir):
    """MP3 structure (sniff.mp3_structure): ID3v2 syncsafe tag size
    (how much metadata — often embedded cover art — precedes the
    audio) + the first MPEG frame header's version/layer/bitrate/
    sample-rate/channel-mode, sync-validated before any field is
    read. Costs a transcription pass and routes mono telephony away
    from music-tier storage, all decode-free. Planted: MPEG1 128k
    stereo, MPEG2 48k mono behind a 129-byte tag, a footered v2.4
    tag, MPEG2.5 joint stereo, a no-sync row, and a PNG row."""
    from dblp_crawler_spark.operators.sniff import mp3_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 6
    hexstr = F.lit("89504E470D0A1A0A0000000000000000")
    for i, hx in enumerate(_MP3_CASES):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    blobs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return mp3_structure(blobs).select(
        "doc_id", "fmt", "id3_major", "tag_bytes", "mpeg_version",
        "layer", "bitrate_kbps", "sample_rate", "channel_mode"
    )


def _tar_fixture_hex(members) -> str:
    """Deterministic ustar bytes (mtime/uid/gid pinned to 0) → hex;
    used by BOTH the Spark entry and its oracle so the planted
    archive is byte-identical. Built with the stdlib writer so the
    fixture is a REAL tar, not a hand-rolled approximation."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for name, size in members:
            ti = tarfile.TarInfo(name)
            ti.size = size
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(b"Q" * size))
    return buf.getvalue().hex().upper()


_TAR_PAIR_HEX = _tar_fixture_hex([("img.jpg", 700), ("img.txt", 13)])
_TAR_SINGLE_HEX = _tar_fixture_hex([("page.html", 515)])


def q_tar_structure(spark, sf_dir):
    """ustar member walk (sniff.tar_structure): tar is the RELEASE
    container of multimodal training data (WebDataset packs
    sample.jpg/sample.txt pairs into plain tar shards), and the
    member table (name, octal size, typeflag, data offset) is
    readable with bounded header arithmetic — the audit a shard
    consumer runs to random-access samples. Planted: a real
    two-member pair shard and a single-member archive written by the
    stdlib tar writer, plus PNG rows that contribute no rows."""
    from dblp_crawler_spark.operators.sniff import tar_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 3
    hexstr = (
        F.when(m == 0, F.lit(_TAR_PAIR_HEX))
        .when(m == 1, F.lit(_TAR_SINGLE_HEX))
        .otherwise(F.lit("89504E470D0A1A0A"))
    )
    blobs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return tar_structure(blobs)


def q_webdataset_manifest(spark, sf_dir):
    """WebDataset shard layout (archive.webdataset_manifest): the
    write-side inverse of tar_structure — exact ustar member
    arithmetic (512-byte headers, data padded to 512) through the
    distributed exclusive prefix-sum and DIV-target shard placement
    (the warc_cdx_layout discipline), samples placed WHOLE with .jpg
    before .txt. The manifest is computable before a byte is
    written; tests pin it against Python's own tar writer
    byte-for-byte. Planted: per-doc payload lengths cycling over 7
    sizes so shards split mid-stream."""
    from dblp_crawler_spark.operators.archive import webdataset_manifest

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = (F.lit(100) + (F.col("doc_id") % 7) * F.lit(137)).cast("int")
    pairs = docs.select(
        F.format_string("img%07d", F.col("doc_id")).alias("image_id"),
        F.repeat(F.lit("X"), n).alias("bytes"),
        F.concat(F.lit("caption "), F.col("doc_id").cast("string")
                 ).alias("caption"),
    )
    return webdataset_manifest(pairs, target_bytes=1 << 20)


_ZSTD_CASES = [
    "28B52FFD" + "00" + "58" + "AA" * 4,          # plain, window log 21
    "28B52FFD" + "20" + "C8" + "AA" * 4,          # single-segment, size 200
    "28B52FFD" + "45" + "00" + "07" + "0201" + "AA" * 2,  # dict 7, fcs+256
    "28B52FFD" + "80" + "10" + "70110100" + "AA" * 2,     # 4-byte fcs 70000
]

_PQ_CASES = [
    "50415231" + "BB" * 84 + "28000000" + "50415231",   # complete
    "50415231" + "BB" * 40,                              # torn tail
    "50415231" + "BB" * 8 + "FF000000" + "50415231",     # footer > file
]


def q_zstd_structure(spark, sf_dir):
    """zstd frame header (sniff.zstd_structure): the compression of
    modern data releases (.tar.zst shards, zstd WARCs) declares, in
    its first <=18 bytes, the DECOMPRESSED content size (costing),
    the dictionary id (a shared-dictionary frame is undecodable
    without its dictionary — a real archive failure mode), the
    window log (decoder memory budget), and the checksum flag.
    Planted: all four fcs widths incl. the 2-byte +256 bias and a
    dictionary frame; PNG rows NULL."""
    from dblp_crawler_spark.operators.sniff import zstd_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 5
    hexstr = F.lit("89504E470D0A1A0A00000000")
    for i, hx in enumerate(_ZSTD_CASES):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    blobs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return zstd_structure(blobs).select(
        "doc_id", "fmt", "single_segment", "has_checksum", "window_log",
        "dict_id", "content_size"
    )


def q_parquet_structure(spark, sf_dir):
    """Parquet file audit (sniff.parquet_structure): the lakehouse's
    own format audited decode-free — PAR1 at both ends (a missing
    tail magic is a torn object-store upload) and the LE32 footer
    length at end-8; footer size vs file size makes the small-file/
    metadata-bloat problem visible in one projection. Reads the head
    and the LAST 8 bytes only."""
    from dblp_crawler_spark.operators.sniff import parquet_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 4
    hexstr = F.lit("89504E470D0A1A0A00000000")
    for i, hx in enumerate(_PQ_CASES):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    blobs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return parquet_structure(blobs).select(
        "doc_id", "fmt", "file_bytes", "tail_magic_ok", "footer_bytes",
        "complete"
    )


def _id3_fixture_hex() -> tuple[str, str]:
    """Deterministic ID3v2.3 and v2.4 tag hex (title/artist text
    frames + one binary APIC the walk must hop), shared by the Spark
    entry and its oracle."""
    def ss4(n):
        return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                      (n >> 7) & 0x7F, n & 0x7F]).hex().upper()

    def frame(fid, payload_hex, v24):
        size = len(payload_hex) // 2
        sz = ss4(size) if v24 else f"{size:08X}"
        return fid.encode().hex().upper() + sz + "0000" + payload_hex

    def txt(s, enc="00"):
        return enc + s.encode().hex().upper()

    f23 = (frame("TIT2", txt("Track Title") + "00", False)
           + frame("APIC", "AA" * 5, False)
           + frame("TPE1", txt("Some Artist"), False))
    v23 = "4944330300" + "00" + ss4(len(f23) // 2) + f23 + "00" * 6
    f24 = (frame("TIT2", txt("Episode Título", enc="03"), True)
           + frame("TALB", txt("Show", enc="03"), True))
    v24 = "4944330400" + "00" + ss4(len(f24) // 2) + f24 + "00" * 6
    return v23, v24


_ID3_V23_HEX, _ID3_V24_HEX = _id3_fixture_hex()


def q_id3_text_frames(spark, sf_dir):
    """ID3v2 text frames (sniff.id3_text_frames): the caption
    channel for AUDIO — TIT2/TPE1/TALB are editorial text already
    attached to the payload, no ASR needed (the audio analog of img
    alt). Frame sizes are BE32 in v2.3 but SYNCSAFE in v2.4 (the
    classic cross-version bug — planted both); latin-1 and UTF-8
    payloads decode behind printable / structural-UTF-8 validation,
    UTF-16 NULL-absorbs; binary APIC frames hop without emitting."""
    from dblp_crawler_spark.operators.sniff import id3_text_frames

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 3
    hexstr = (
        F.when(m == 0, F.lit(_ID3_V23_HEX))
        .when(m == 1, F.lit(_ID3_V24_HEX))
        .otherwise(F.lit("89504E470D0A1A0A"))
    )
    blobs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return id3_text_frames(blobs)


def _zip_fixture_hex() -> tuple[str, str]:
    """Deterministic zip archives via the stdlib writer (date_time
    pinned): a real two-entry archive and one whose COMMENT contains
    a fake EOCD signature (the candidate-validation trap)."""
    import io
    import zipfile

    def make(comment: bytes | None):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
            for name, data in (("a.txt", b"hello world"),
                               ("sub/b.bin", b"\x00" * 64)):
                zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                z.writestr(zi, data)
            if comment is not None:
                z.comment = comment
        return buf.getvalue().hex().upper()

    return make(None), make(b"PK\x05\x06 fake sig in comment")


_ZIP_REAL_HEX, _ZIP_TRICKY_HEX = _zip_fixture_hex()


def q_zip_structure(spark, sf_dir):
    """ZIP EOCD audit (sniff.zip_structure): the other dataset
    container's table of contents lives at the END — entry count and
    central-directory extent from the tail only, with Info-ZIP's
    candidate validation (a signature counts only if its
    comment-length field closes the file exactly), so a fake
    PK\\x05\\x06 planted inside the archive comment cannot win.
    Planted: a real stdlib-written archive, the fake-signature
    comment trap, a truncated archive (no EOCD), and PNG rows."""
    from dblp_crawler_spark.operators.sniff import zip_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 4
    hexstr = (
        F.when(m == 0, F.lit(_ZIP_REAL_HEX))
        .when(m == 1, F.lit(_ZIP_TRICKY_HEX))
        .when(m == 2, F.lit(_ZIP_REAL_HEX[: len(_ZIP_REAL_HEX) // 2 // 2 * 2]))
        .otherwise(F.lit("89504E470D0A1A0A"))
    )
    blobs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return zip_structure(blobs).select(
        "doc_id", "fmt", "file_bytes", "has_eocd", "n_entries",
        "cd_offset", "cd_bytes", "complete"
    )


def q_html_tables(spark, sf_dir):
    """Table extraction (webparse.html_tables): <table> grids are
    training data in their own right — table-QA corpora mine (row,
    col, cell) triples, and flattening a table into running text
    destroys exactly what makes it valuable. Cell markup stripped,
    entities decoded (amp last, so double-escapes decode one level),
    header rows flagged; three nested explodes, no shuffle."""
    from dblp_crawler_spark.sources.webparse import html_tables

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org/t/p"), sid)
    html = F.concat(
        F.lit("<table><tr><th>Key</th><th>Val &amp; unit</th></tr>"
              "<tr><td><b>row"), sid, F.lit("</b></td><td>"),
        (F.col("doc_id") % 97).cast("string"),
        F.lit(" &lt; 100</td></tr></table>"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("<table><tr><td>extra "), sid,
                        F.lit("</td></tr></table>")))
        .otherwise(F.lit("")),
    )
    return html_tables(docs.select(url.alias("url"), html.alias("html")))


def q_code_blocks(spark, sf_dir):
    """Code-block mining (webparse.code_blocks): <pre><code> is the
    code-LLM channel — the language-<x> class convention carries the
    label, entities decode, and NEWLINES ARE PRESERVED (whitespace
    is syntax, unlike every prose extractor). Inline <code> outside
    <pre> never matches. Planted: labeled python, an unlabeled
    block, and pages with no blocks."""
    from dblp_crawler_spark.sources.webparse import code_blocks

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org/c/p"), sid)
    m = F.col("doc_id") % 3
    html = (
        F.when(m == 0, F.concat(
            F.lit('<pre><code class="language-python">def f'), sid,
            F.lit("(x):\n    return x &lt; "), sid,
            F.lit("</code></pre><p><code>inline</code></p>")))
        .when(m == 1, F.concat(
            F.lit("<pre><code>SELECT "), sid,
            F.lit(" FROM t &amp;&amp; go</code></pre>")))
        .otherwise(F.lit("<p>no code here</p>"))
    )
    return code_blocks(docs.select(url.alias("url"), html.alias("html")))


def q_table_markdown(spark, sf_dir):
    """Table→markdown linearization (webparse.table_markdown over
    html_tables): the form a table actually enters an LLM corpus in
    — structure preserved as | bars + the header separator row, pipe
    characters escaped, ragged rows tolerated with n_cols reporting
    the max. Two ordered aggregations (array_sort over collected
    structs — deterministic on any partitioning, no window); the
    replay chains html_tables_sql into string_agg ORDER BY at both
    levels."""
    from dblp_crawler_spark.sources.webparse import table_markdown

    return table_markdown(q_html_tables(spark, sf_dir))


def q_feed_enclosures(spark, sf_dir):
    """Podcast enclosure discovery (webparse.feed_enclosures): the
    audio axis's declared-inventory channel, completing the symmetry
    (images: sitemap_images; video: sitemap_videos + HLS; audio: RSS
    <enclosure>). URL + MIME + DECLARED byte length (fetch budgeting
    before scheduling; a later Content-Length disagreement feeds
    truncation evidence) + itunes:duration in any of its SS / MM:SS
    / HH:MM:SS spellings parsed to exact seconds. Planted: audio and
    video enclosures with free attribute order, enclosure-less
    items, and a link-less orphan that remains schedulable."""
    from dblp_crawler_spark.sources.webparse import feed_enclosures

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    dur = (
        F.when(m == 0, F.concat(F.lit("<itunes:duration>1:0"),
                                (F.col("doc_id") % 6).cast("string"),
                                F.lit(":03</itunes:duration>")))
        .when(m == 1, F.concat(F.lit("<itunes:duration>"),
                               ((F.col("doc_id") % 50) + 10).cast("string"),
                               F.lit(":30</itunes:duration>")))
        .otherwise(F.lit(""))
    )
    enc = F.when(
        m == 2,
        F.concat(F.lit('<enclosure type="video/mp4" url="https://cdn'),
                 (F.col("doc_id") % 5).cast("string"),
                 F.lit(".ex/v"), sid, F.lit('.mp4"/>')),
    ).otherwise(
        F.concat(F.lit('<enclosure url="https://cdn'),
                 (F.col("doc_id") % 5).cast("string"),
                 F.lit(".ex/e"), sid, F.lit('.mp3" length="'),
                 ((F.col("doc_id") % 900) * 1000 + 50000).cast("string"),
                 F.lit('" type="audio/mpeg"/>')),
    )
    xml = F.concat(
        F.lit("<rss><channel><item><link>https://pod"),
        (F.col("doc_id") % 10).cast("string"), F.lit(".ex/ep"), sid,
        F.lit("</link>"), enc, dur, F.lit("</item>"),
        F.lit("<item><link>https://pod.ex/none</link></item>"),
        F.lit("</channel></rss>"),
    )
    pages = docs.select(
        F.concat(F.lit("pod"), (F.col("doc_id") % 10).cast("string"),
                 F.lit(".ex")).alias("host"),
        xml.alias("feed_xml"))
    return feed_enclosures(pages)


def _release_pages(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org/r/p"), sid)
    html = F.concat(
        F.lit('<figure><img src="/i/a'), sid,
        F.lit('.jpg"><figcaption>shared cap '),
        (F.col("doc_id") % 23).cast("string"),
        F.lit("</figcaption></figure>"),
        F.lit('<img src="/i/a'), sid, F.lit('.jpg" alt="alt '), sid,
        F.lit('">'),
        F.lit('<img src="/i/b'), sid, F.lit('.jpg" alt="banner alt '), sid,
        F.lit('">'),
    )
    return docs.select("doc_id", url.alias("url"), html.alias("html"))


_REL_PNG_PRE = "89504E470D0A1A0A" + "0000000D49484452"


def q_pipeline_caption_release(spark, sf_dir):
    """The image+caption RELEASE pipeline as ONE oracled plan — the
    integration statement tying this session's tiers together:
    caption_election (figcaption beats alt) → equi-join the fetched
    byte store on img_url → image_dims + image_role_classify
    (banners rejected by pure geometry) → drop_dups_keep_best on the
    caption key (LAION rule: captions collide across pages — planted
    into 23 groups — and the largest-area image survives) →
    webdataset_manifest (exact ustar arithmetic, samples whole).
    Every stage is an existing oracled operator and the DuckDB
    replay chains the same fragments end-to-end. Planted: every
    fifth content image missing from the store (fetch gap), every
    page also declaring a 728x90 banner that must not survive the
    role gate."""
    from dblp_crawler_spark.operators.archive import webdataset_manifest
    from dblp_crawler_spark.operators.dedup import drop_dups_keep_best
    from dblp_crawler_spark.operators.sniff import (
        image_dims,
        image_role_classify,
    )
    from dblp_crawler_spark.sources.webparse import caption_election

    pages = _release_pages(spark, sf_dir)
    # EAGER localCheckpoint at the slim waypoint: the election
    # output is ~2 rows/doc but its PLAN carries the huge
    # URL-resolution expressions, and in one fused DAG the AQE
    # re-planning cost of those trees at every stage boundary
    # dominates (profiled: each downstream stage is sub-second once
    # the lineage is cut; entry wall-time 17.6 s fused → ~12 s with
    # the two eager waypoints, interleaved same-session). Same
    # discipline as global_sequence/pack_shards, promoted to eager
    # because the waypoint is consumed immediately.
    elected = caption_election(pages.select("url", "html")).localCheckpoint()

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    host = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                    F.lit(".org"))
    w_hex = F.lpad(F.conv(
        ((F.col("doc_id") % 7) * 100 + 200).cast("string"), 10, 16), 8, "0")
    a_hex = F.concat(F.lit(_REL_PNG_PRE), F.upper(w_hex),
                     F.lit("00000258" + "0802000000"))
    b_hex = F.lit(_REL_PNG_PRE + "000002D8" + "0000005A" + "0802000000")
    store = (
        docs.where(F.col("doc_id") % 5 != 0).select(
            F.concat(host, F.lit("/i/a"), sid, F.lit(".jpg")).alias("img_url"),
            F.unhex(a_hex).alias("bytes"))
        .unionByName(docs.select(
            F.concat(host, F.lit("/i/b"), sid, F.lit(".jpg")).alias("img_url"),
            F.unhex(b_hex).alias("bytes")))
    )
    joined = elected.join(store, "img_url")
    dims = image_role_classify(image_dims(joined))
    gated = dims.where(
        (F.col("role") == "content") & F.col("caption").isNotNull()
    ).withColumns(
        {
            "image_id": F.regexp_extract("img_url", r"/i/([ab]\d+)\.jpg", 1),
            "area": (F.col("width").cast("long") * F.col("height")),
        }
    )
    best = drop_dups_keep_best(gated, key_col="caption", score_col="area",
                               id_col="image_id").localCheckpoint()
    return webdataset_manifest(
        best.select("image_id", "bytes", "caption"), target_bytes=1 << 14
    )


def q_pipeline_audio_admission(spark, sf_dir):
    """Composed audio admission (sniff.audio_admission): the audio
    analog of pipeline_payload_admission — sniff → wav/mp3 header
    tiers → codec, sample-rate (ASR floor 16 kHz), duration-band
    and bitrate gates in cheapest-rejection order, ONE projection
    per tier. The replay joins the same wav/mp3 fragments and
    applies the identical verdict precedence. Planted: admit rows,
    telephony-companding rejects, a too-short clip, a fmt-less
    RIFF, a free-format-bitrate mp3, and non-audio payloads."""
    from dblp_crawler_spark.operators.sniff import audio_admission

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    all_cases = _WAV_CASES + _MP3_CASES + ["89504E470D0A1A0A"]
    m = F.col("doc_id") % len(all_cases)
    hexstr = F.lit("FFD8FFE000000000")
    for i, hx in enumerate(all_cases):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    blobs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return audio_admission(blobs).select("doc_id", "fmt", "verdict", "admit")


def q_pipeline_image_harvest(spark, sf_dir):
    """Composed image+caption harvest in ONE plan — the integration
    statement for this graft cell's axis B: HTML pages →
    extract_images (srcset widest-candidate election, alt = caption)
    → equi-join the fetched-bytes store on img_url → image_dims
    (decode-free) → image_role_classify → admit only role='content'
    WITH a caption. Every stage is an existing oracled operator; the
    DuckDB replay chains the same fragments, so the pipeline is
    verified as one unit. Page HTML and image blobs never shuffle
    together — only the slim (url, img_url, alt) rows meet the
    store."""
    from dblp_crawler_spark.operators.sniff import (
        image_dims,
        image_role_classify,
    )
    from dblp_crawler_spark.sources.webparse import extract_images

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    host = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                    F.lit(".org"))
    url = F.concat(host, F.lit("/g/p"), sid, F.lit(".html"))
    html = F.concat(
        F.lit('<img srcset="s'), sid, F.lit(".jpg 320w, l"), sid,
        F.lit('.jpg 1280w" src="f'), sid, F.lit('.jpg" alt="cap '),
        (F.col("doc_id") % 5).cast("string"), F.lit('">'),
        F.lit('<img src="/i/'), sid, F.lit('.png">'),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    # lazy localCheckpoint: slim rows, huge plan — see
    # q_pipeline_caption_release for the measured rationale
    harvested = extract_images(pages).localCheckpoint(eager=False)

    m = F.col("doc_id") % 4
    hero_hex = F.lit(_ROLE_HEADERS[0])
    for i, hx in enumerate(_ROLE_HEADERS[1:], start=1):
        hero_hex = F.when(m == i, F.lit(hx)).otherwise(hero_hex)
    store = docs.select(
        F.concat(host, F.lit("/g/l"), sid, F.lit(".jpg")).alias("img_url"),
        F.unhex(hero_hex).alias("bytes"),
    ).unionAll(
        docs.select(
            F.concat(host, F.lit("/i/"), sid, F.lit(".png")).alias("img_url"),
            F.unhex(F.lit(_PIXEL_HDR)).alias("bytes"),
        )
    )
    fetched = harvested.join(store, "img_url")
    sized = image_role_classify(image_dims(fetched))
    return (
        sized.where((F.col("role") == "content") & F.col("alt").isNotNull())
        .select("url", "img_url", "alt", "width", "height", "role")
    )


def q_host_language_profile(spark, sf_dir):
    """Per-host language mix (hostdup.host_language_profile over the
    oracled lang_id classifier): dominant language + share and
    Shannon entropy per host — a host mixing many languages across
    thin pages is the scraped-content-farm shape, and a
    claimed-locale host dominated by another language routes to the
    wrong corpus. One (host, lang) rollup; deterministic dominance
    tie-break (count desc, lang asc)."""
    from dblp_crawler_spark.operators.hostdup import host_language_profile

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 8).cast("string")).alias("host"),
        T.lang_id("text").alias("lang"),
    )
    return host_language_profile(pages)


def q_hreflang_alternates(spark, sf_dir):
    """Publisher-declared translation graph
    (webparse.hreflang_alternates): <link hreflang> pairs, attribute
    order free, values quoted or bare, hreflang lowercased,
    x-default kept literal, hrefs resolved against the page.
    Multilingual curation keys on it twice: translations must NOT
    near-dedup into one row, and alternates of admitted pages are
    free frontier candidates for the other language pipelines."""
    from dblp_crawler_spark.sources.webparse import hreflang_alternates

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org/en/p"), sid, F.lit(".html"))
    html = F.concat(
        F.lit('<link rel="alternate" hreflang="en" href="/en/p'), sid,
        F.lit('.html">'),
        F.lit("<link href='/de/p"), sid,
        F.lit(".html' hreflang='DE' rel='alternate'>"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("<link hreflang=fr href=../fr/p"), sid,
                        F.lit(".html>"))).otherwise(F.lit("")),
        F.lit('<link rel="stylesheet" href="/css/m.css">'),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return hreflang_alternates(pages)


def q_pipeline_frontier_plan(spark, sf_dir):
    """Composed crawl-side admission-to-schedule pipeline in ONE plan
    — the axis-A integration statement mirroring
    pipeline_image_harvest: candidate URLs → RFC 9309 robots_decide
    (longest-match precedence incl. an Allow override UNDER a
    Disallow prefix — planted) → spider-trap admission gate → exact
    per-host politeness_timeline (the prefix-max closed form of the
    sequential fetch recurrence). Every stage is an existing oracled
    operator; the replay chains the same fragments, verifying the
    composition as one unit. Output: the wave's exact fetch
    schedule."""
    from dblp_crawler_spark.functions.urlnorm import url_trap_flags
    from dblp_crawler_spark.operators.scheduler import (
        politeness_timeline,
        robots_decide,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string"),
                    F.lit(".org"))
    m = F.col("doc_id") % 4
    path = (
        F.when(m == 0, F.concat(F.lit("/p/"), sid))
        .when(m == 1, F.concat(F.lit("/private/sec"), sid))
        .when(m == 2, F.concat(F.lit("/private/pub"), sid))
        .otherwise(F.concat(F.lit("/a/b/a/b/a/b/"), sid))
    )
    cand = docs.select(
        F.concat(F.lit("https://"), host, path).alias("url"),
        host.alias("host"),
        ((F.col("doc_id") % 5) * 100000).cast("long").alias("ready_us"),
    )
    hosts = cand.select("host").distinct()
    rules = hosts.select(
        "host", F.lit("disallow").alias("rule"), F.lit("/private").alias("pattern")
    ).unionAll(
        hosts.select("host", F.lit("allow").alias("rule"),
                     F.lit("/private/pub").alias("pattern"))
    )
    dec = robots_decide(cand.select("url"), rules)
    adm = (
        cand.join(dec, "url")
        .where(F.col("allowed") & ~url_trap_flags("url")["is_trap"])
        .select("host", "url", "ready_us")
    )
    return politeness_timeline(adm, delay_us=250000).select(
        "host", "url", "k", "start_us", "finish_us"
    )


def q_caption_locale_gate(spark, sf_dir):
    """Crossmodal locale-consistency gate: the URL's declared locale
    (url_locale_hint — the publisher's routing decision) against the
    caption's detected language (lang_id) — a /de/ page whose
    captions read as another language is a mistranslated or scraped
    pair a per-signal gate cannot see. Composes two oracled
    classifiers; mismatch only when BOTH signals are confident
    (hint present, detection not 'unk')."""
    docs = _t(spark, sf_dir, "documents")
    from dblp_crawler_spark.functions.urlnorm import url_locale_hint

    m = F.col("doc_id") % 3
    lang_seg = (
        F.when(m == 0, F.lit("/en")).when(m == 1, F.lit("/de"))
        .otherwise(F.lit(""))
    )
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".org"), lang_seg, F.lit("/img/"),
                   F.col("doc_id").cast("string"), F.lit(".html"))
    caption = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("图片说明 "), F.col("text").substr(1, 40)),
    ).otherwise(F.col("text").substr(1, 120))
    staged = docs.select(
        "doc_id", url.alias("page_url"), caption.alias("caption"),
    ).withColumns(
        {
            "lang_hint": url_locale_hint("page_url")["lang_hint"],
            "caption_lang": T.lang_id("caption"),
        }
    )
    return staged.withColumn(
        "locale_mismatch",
        F.col("lang_hint").isNotNull() & (F.col("caption_lang") != "unk")
        & (F.col("lang_hint") != F.col("caption_lang")),
    ).select("doc_id", "lang_hint", "caption_lang", "locale_mismatch")


def q_zorder_key(spark, sf_dir):
    """Z-order (Morton) interleave key (functions/zorder.morton_key):
    the Delta/Iceberg ZORDER BY technique as a pure engine-portable
    expression — bits of two 31-bit-clamped columns interleave via
    five magic-number doubling steps, so a layout sorted on the key
    clusters into 2-D tiles and zone maps prune on EITHER column.
    Over events (user_id × epoch-day); NULL inputs → NULL key."""
    from dblp_crawler_spark.functions.zorder import morton_key

    ev = _t(spark, sf_dir, "events")
    day = (F.unix_timestamp("ts") / 86400).cast("long")
    return ev.select(
        "event_id", "user_id",
        day.alias("day"),
        morton_key(F.col("user_id"), day).alias("zkey"),
    )


def q_zorder_file_stats(spark, sf_dir):
    """Simulated zone maps of a z-ordered 16-file layout
    (zorder_file_stats): rows sort by the Morton key, split into
    equal-rank slices, each reporting min/max of both columns —
    exactly what a reader's pruning sees; the pruning win over a
    linear sort is pinned in tests/test_zorder.py. Window over the
    global key order is the simulation shape; production writes use
    repartitionByRange(key)."""
    from dblp_crawler_spark.functions.zorder import zorder_file_stats

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 512).alias("a"),
        (F.col("event_id") % 512).alias("b"),
    )
    return zorder_file_stats(ev, "a", "b", n_files=16)


def q_url_locale_hint(spark, sf_dir):
    """URL locale hints (urlnorm.url_locale_hint): ccTLD (country,
    kept separate from language), leading /xx/ or /xx-yy/ path
    locale, and lang=/locale=/hl= query params — the routing signal
    a multilingual crawl uses before fetching a byte. lang_hint
    precedence: path (the publisher's routing decision) beats query
    (often user state) — planted on a URL carrying both. Pure
    projection; RE2-safe patterns shared with the replay."""
    from dblp_crawler_spark.functions.urlnorm import url_locale_hint

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 5
    d = F.col("doc_id").cast("string")
    url = (
        F.when(m == 0, F.concat(F.lit("https://shop.example.de/de/p/"), d))
        .when(m == 1, F.concat(F.lit("https://example.com/pt-BR/x"), d))
        .when(m == 2, F.concat(F.lit("https://example.org/page"), d, F.lit("?hl=fr")))
        .when(m == 3, F.concat(F.lit("https://news.example.fr/en/a"), d, F.lit("?lang=es")))
        .otherwise(F.concat(F.lit("https://example.com/p/"), d))
    )
    h = url_locale_hint(url)
    return docs.select(
        "doc_id",
        h["cc_tld"].alias("cc_tld"),
        h["path_lang"].alias("path_lang"),
        h["path_region"].alias("path_region"),
        h["query_lang"].alias("query_lang"),
        h["lang_hint"].alias("lang_hint"),
    )


def q_embedding_quality(spark, sf_dir):
    """Embedding validation gate (similarity.embedding_quality): the
    corrupt-vector detector that must run BEFORE any ANN/cluster op —
    a NaN poisons every distance it touches, a zero vector makes
    cosine undefined, wrong-length or exploded-magnitude vectors are
    upstream bugs that silently skew neighborhoods. Planted: NaN
    injections, zero vectors, 32-dim truncations, 10^6-scaled
    blowups, and clean rows. One pure-expression pass."""
    from dblp_crawler_spark.operators.similarity import embedding_quality

    vecs = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    m = F.col("vec_id") % 6
    emb = (
        F.when(m == 1, F.transform(
            "embedding",
            lambda x, i: F.when(i == 3, F.lit(float("nan"))).otherwise(x)))
        .when(m == 2, F.transform("embedding", lambda x: F.lit(0.0)))
        .when(m == 3, F.slice("embedding", 1, 32))
        .when(m == 4, F.transform("embedding", lambda x: x * 1000000.0))
        .otherwise(F.col("embedding"))
    )
    return embedding_quality(
        vecs.select("vec_id", emb.alias("embedding")), dim=64
    )


def q_pipeline_warc_to_corpus(spark, sf_dir):
    """The composed archive→corpus pipeline, end to end in one plan:
    WARC segments (synthesized with torn writes and cross-page
    duplicate bodies) → warc_records parse with the truncation audit
    → drop torn records → html_to_text boilerplate strip → length
    gate → exact content dedup keeping the min-uri representative.
    Every stage is an existing oracled operator; this entry proves
    they COMPOSE — the DuckDB replay chains the same five SQL
    fragments, so the whole pipeline is verified as one unit, not
    just piecewise."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.sources.webparse import html_to_text, warc_records

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    leaders = docs.select(F.col("doc_id").alias("lid"), F.col("text").alias("ltext"))
    d = docs.select("doc_id").join(
        leaders, F.col("lid") == F.col("doc_id") - F.col("doc_id") % 4
    )
    raw = (
        F.when(F.col("doc_id") % 7 == 3, F.substring("ltext", 1, 10))
        .otherwise(F.substring("ltext", 1, 120))
    )
    html = F.concat(
        F.lit("<html><head><script>var x = 1;</script></head>"
              "<body><h1>Corpus &amp; page</h1><!-- b --><p>"),
        raw, F.lit("&nbsp;&lt;end&gt;</p></body></html>"),
    )
    hh = (F.col("doc_id") % 40).cast("string")
    cl = F.length(html) + F.when(F.col("doc_id") % 9 == 0, F.lit(5)).otherwise(F.lit(0))
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://h"),
        hh, F.lit(".org/page/"), F.col("doc_id").cast("string"),
        F.lit("\r\nContent-Length: "), cl.cast("string"),
        F.lit("\r\n\r\n"), html, F.lit("\r\n\r\n"),
    )
    segs = (
        d.select(F.concat(F.lit("h"), hh, F.lit(".org")).alias("host"), rec.alias("rec"))
        .groupBy("host")
        .agg(F.array_join(F.sort_array(F.collect_list("rec")), "").alias("warc"))
    )
    txt = (
        warc_records(segs)
        .filter((~F.col("truncated")) & (F.col("rec_type") == "response"))
        .select("uri", html_to_text("body").alias("text"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .filter(F.col("n_chars") >= 40)
    )
    return (
        txt.groupBy("text")
        .agg(F.min("uri").alias("uri"), F.min("n_chars").alias("n_chars"))
        .select("uri", hash60("text").alias("text_hash"), "n_chars")
    )


def q_lm_bits_score(spark, sf_dir):
    """Count-based bigram LM quality score (perplexity-filter
    surrogate): per-doc mean bit-length of its bigrams' corpus
    frequencies — an integer log2, so the score is exact in any
    engine until one final divide. hash60 gram hashes for the
    oracle replay."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents")
    return T.lm_bits_score(docs, n=2, hash_fn=hash60)


def q_text_classifier_gate(spark, sf_dir):
    """Hashed linear quality classifier (fastText-style) with
    portable integer pseudo-weights: per-token weight
    hash60(token,seed) mod 2001 − 1000, doc score = fold with
    multiplicity, accept iff score > 0. Integer-exact in both
    engines; report is per-source accept counts + exact total
    score + SUM/COUNT average."""
    docs = _t(spark, sf_dir, "documents")
    sc = docs.select("source", T.hashed_linear_score("text").alias("score"))
    return sc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("score") > 0).cast("int")).alias("n_accepted"),
        F.sum("score").alias("total_score"),
        F.round(F.sum("score") / F.count(F.lit(1)), 4).alias("avg_score"),
    )


def q_image_phash_components(spark, sf_dir):
    """Duplicate-image CLUSTERS: the phash hamming pair join feeding
    connected components — A~B, B~C collapse to one cluster even when
    hamming(A,C) > threshold. Planted portable-hash geometry makes
    transitivity real: every 8th image gets a twin at XOR 3 (hamming
    2) and every 16th ALSO a twin2 at XOR 60 (hamming 4 from base,
    but hamming 6 from twin — linked only THROUGH the base), so the
    3-node clusters exist only if the components step actually
    closes transitively. Oracle: the same pair SQL + the recursive
    min-reachable-id CTE."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.multimodal import phash_near_dup_images

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    iid = F.format_string("img_%06d", "doc_id")
    base = docs.select(iid.alias("image_id"), hash60(iid).alias("phash"))
    twin1 = docs.filter(F.col("doc_id") % 8 == 0).select(
        F.concat(iid, F.lit("_twin")).alias("image_id"),
        hash60(iid).bitwiseXOR(F.lit(3)).alias("phash"),
    )
    twin2 = docs.filter(F.col("doc_id") % 16 == 0).select(
        F.concat(iid, F.lit("_twin2")).alias("image_id"),
        hash60(iid).bitwiseXOR(F.lit(60)).alias("phash"),
    )
    pairs = phash_near_dup_images(
        base.unionByName(twin1).unionByName(twin2), max_hamming=4, prefix_bits=12
    )
    cc = D.connected_components(pairs, src="a", dst="b")
    return cc.select(F.col("id").alias("image_id"), F.col("component").alias("cluster_rep"))


def q_split_leakage_images(spark, sf_dir):
    """Near-dup leakage across image splits (dedup.
    cluster_split_leakage over phash components): a re-encoded image
    has a different id AND different bytes, so an id-keyed split
    scatters the copies across the train/eval boundary and only the
    near-dup CLUSTER knows they are one picture — the image twin of
    leakage_free_split's exact-text guarantee. Composes three oracled
    stages: the phash hamming pair join + connected components
    (q_image_phash_components' planted twins), the deterministic
    hash_split on image_id (which DOES scatter the twins — that is
    the point), and the leakage rollup with its min-split repair
    (eval only ever shrinks). Singletons are their own cluster and
    never leak."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.dedup import cluster_split_leakage
    from dblp_crawler_spark.operators.multimodal import phash_near_dup_images

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    iid = F.format_string("img_%06d", "doc_id")
    base = docs.select(iid.alias("image_id"), hash60(iid).alias("phash"))
    twin1 = docs.filter(F.col("doc_id") % 8 == 0).select(
        F.concat(iid, F.lit("_twin")).alias("image_id"),
        hash60(iid).bitwiseXOR(F.lit(3)).alias("phash"),
    )
    twin2 = docs.filter(F.col("doc_id") % 16 == 0).select(
        F.concat(iid, F.lit("_twin2")).alias("image_id"),
        hash60(iid).bitwiseXOR(F.lit(60)).alias("phash"),
    )
    imgs = base.unionByName(twin1).unionByName(twin2)
    pairs = phash_near_dup_images(imgs, max_hamming=4, prefix_bits=12)
    cc = D.connected_components(pairs, src="a", dst="b")
    members = (
        imgs.join(cc, imgs["image_id"] == cc["id"], "left")
        .select(
            "image_id",
            F.coalesce(F.col("component"), F.col("image_id")).alias("cluster"),
            T.hash_split(val_pct=10, id_col="image_id").alias("split"),
        )
    )
    return cluster_split_leakage(members, id_col="image_id")


def q_joint_dedup_clusters(spark, sf_dir):
    """Cross-modal duplicate clusters: phash-near-dup OR exact-
    caption edges, closed transitively (operators/multimodal.py
    joint_near_dup_clusters). Planted geometry forces cross-modal
    transitivity: every 8th image gets a phash twin with a FRESH
    caption (image-only edge) and every 12th a caption copy with a
    FAR phash (caption-only edge) — at doc_id % 24 the three rows
    cluster only because both edge types union before components."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.multimodal import joint_near_dup_clusters

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    iid = F.format_string("img_%06d", "doc_id")
    cap = F.concat(F.lit("cap "), F.col("doc_id").cast("string"))
    base = docs.select(iid.alias("image_id"), hash60(iid).alias("phash"), cap.alias("caption"))
    twin = docs.filter(F.col("doc_id") % 8 == 0).select(
        F.concat(iid, F.lit("_twin")).alias("image_id"),
        hash60(iid).bitwiseXOR(F.lit(3)).alias("phash"),
        F.concat(F.lit("cap t"), F.col("doc_id").cast("string")).alias("caption"),
    )
    capcopy = docs.filter(F.col("doc_id") % 12 == 0).select(
        F.concat(iid, F.lit("_cap")).alias("image_id"),
        hash60(iid, 5).alias("phash"),
        cap.alias("caption"),
    )
    cc = joint_near_dup_clusters(
        base.unionByName(twin).unionByName(capcopy), max_hamming=4, prefix_bits=12
    )
    return cc.select(F.col("id").alias("image_id"), F.col("component").alias("cluster_rep"))


# Shared between q_image_linear_gate and its oracle so the weight
# vector can never drift between the two engines.
_GATE_BITS = 16
_GATE_FMT_W = {"jpeg": -3, "png": 5, "webp": 1}
_GATE_BIAS = 2


def _gate_bit_weights() -> list[int]:
    """Deterministic mixed-sign integer weights over phash bits
    0..15 (LSB first): w_k = (7k mod 13) - 6 ∈ [-6, 6]."""
    return [((k * 7) % 13) - 6 for k in range(_GATE_BITS)]


def q_image_linear_gate(spark, sf_dir):
    """Decode-free linear image gate (multimodal.image_linear_gate):
    score = bias + Σ_k bit_k(phash)·w_k + fmt_weight(fmt), accept iff
    score > 0 — the image-side twin of the fastText-style text gate
    (a distilled NSFW/watermark/quality logistic head evaluated as a
    flat integer expression, no decode, no UDF). Planted phashes are
    portable hash60 values and fmt cycles jpeg/png/webp/gif (gif
    exercises the default-0 fmt-weight path); report is per-fmt
    accept counts + exact integer score stats."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.multimodal import image_linear_gate

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    iid = F.format_string("img_%06d", "doc_id")
    fmt = F.element_at(
        F.array(F.lit("jpeg"), F.lit("png"), F.lit("webp"), F.lit("gif")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    imgs = docs.select(iid.alias("image_id"), hash60(iid).alias("phash"), fmt.alias("fmt"))
    g = image_linear_gate(imgs, _gate_bit_weights(), _GATE_FMT_W, bias=_GATE_BIAS)
    return g.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.col("accept").cast("int")).alias("n_accepted"),
        F.sum("score").alias("total_score"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


def q_image_batch_assembly(spark, sf_dir):
    """Aspect-bucketed training-batch assembly (batch_size=8,
    drop_last): every batch holds 8 images of one resolution bucket,
    filled in id order; ragged bucket tails dropped. Geometry planted
    from the portable hash60 family (same (w, h) map as
    image_aspect_bucket); the per-bucket rank comes from the
    distributed prefix sum, which the oracle replays as a plain
    row_number — equality proves the two-pass rank IS the per-bucket
    ordinal."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.multimodal import assemble_batches

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    imgs = docs.select(
        "doc_id",
        (F.lit(256) + F.pmod(hash60("doc_id"), F.lit(1024))).cast("int").alias("w"),
        (F.lit(256) + F.pmod(hash60("doc_id", 1), F.lit(1024))).cast("int").alias("h"),
    )
    return assemble_batches(imgs, batch_size=8, id_col="doc_id")


def q_text_fingerprint(spark, sf_dir):
    """Rolling polynomial fingerprint on the portable hash family —
    the order-aware fold replays in DuckDB as a list_reduce, so the
    oracle checks every fingerprint bit-exactly. xxhash64 stays the
    library default (value-pinned in tests)."""
    from dblp_crawler_spark.functions.hashing import hash60

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint64("text", hash_fn=hash60).alias("fingerprint"))


def q_events_windowed_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return E.windowed_counts(ev, "hour")


def q_events_sessionization(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return E.session_stats(ev, gap_minutes=30)


def q_multimodal_features(spark, sf_dir):
    """Arrow-batched binary decode plumbing on synthesized images
    (no image table in the driver set — build a deterministic one
    from doc ids; rows-only check)."""
    from dblp_crawler_spark import codecs

    docs = _t(spark, sf_dir, "documents").limit(64).select("doc_id")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                iid = f"img_{int(d):06d}"
                px = codecs.synth_pixels(iid, 32, 32)
                ids.append(iid)
                blobs.append(codecs.encode_image(px, "png"))
            yield pd.DataFrame({"image_id": ids, "bytes": blobs})

    imgs = docs.mapInPandas(gen, "image_id string, bytes binary")
    from dblp_crawler_spark.operators.multimodal import extract_features

    return extract_features(imgs)


def q_image_phash_dedup(spark, sf_dir):
    """Image near-dup pairs on the STORED phash column (the
    input_hint table carries phash:int64, so duplicate detection
    never decodes a byte). The operator under test is the blocked
    hamming equi-join (prefix block → in-block xor/bit_count), so
    the phashes are planted via the portable hash60 family — 60-bit
    non-negative, identical in both engines, making the ENTIRE join
    DuckDB-replayable — with every 8th image given a twin whose two
    lowest bits are XOR-flipped (hamming exactly 2, same prefix
    block). phash-from-pixels itself stays value-pinned in
    tests/test_payload.py."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.multimodal import phash_near_dup_images

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    iid = F.format_string("img_%06d", "doc_id")
    base = docs.select(iid.alias("image_id"), hash60(iid).alias("phash"))
    twins = docs.filter(F.col("doc_id") % 8 == 0).select(
        F.concat(iid, F.lit("_twin")).alias("image_id"),
        hash60(iid).bitwiseXOR(F.lit(3)).alias("phash"),
    )
    return phash_near_dup_images(
        base.unionByName(twins), max_hamming=4, prefix_bits=12
    )


_PIGEON_HI = (1 << 50) | (1 << 55) | (1 << 58)  # 3 flips inside the top block
_PIGEON_LO = (1 << 5) | (1 << 20) | (1 << 35)   # 3 flips across 3 low blocks


def q_dedup_hamming_pigeonhole(spark, sf_dir):
    """Guaranteed-recall hamming near-dup (dedup.
    hamming_near_dups_exact): pigeonhole multi-block candidates —
    60 bits split into 4 blocks of 15; any pair at hamming ≤ 3
    agrees exactly on ≥ 1 block, so recall is 1.0 where the single
    prefix block provably misses pairs whose flips land in the
    prefix. Planted: every 8th image a twin XOR-flipped in 3 TOP
    bits (invisible to the prefix-block kernel — pinned in tests),
    every 16th a twin flipped across 3 LOW blocks (found via the
    agreeing top block). The oracle replays block spans, per-block
    equi-join, and the pair dedup."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.dedup import hamming_near_dups_exact

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    iid = F.format_string("img_%06d", "doc_id")
    base = docs.select(iid.alias("image_id"), hash60(iid).alias("phash"))
    t_hi = docs.filter(F.col("doc_id") % 8 == 0).select(
        F.concat(iid, F.lit("_hi")).alias("image_id"),
        hash60(iid).bitwiseXOR(F.lit(_PIGEON_HI)).alias("phash"),
    )
    t_lo = docs.filter(F.col("doc_id") % 16 == 0).select(
        F.concat(iid, F.lit("_lo")).alias("image_id"),
        hash60(iid).bitwiseXOR(F.lit(_PIGEON_LO)).alias("phash"),
    )
    return hamming_near_dups_exact(
        base.unionByName(t_hi).unionByName(t_lo),
        "phash", "image_id", max_hamming=3, width=60,
    )


def q_video_frame_sample(spark, sf_dir):
    """Video frame sampling: 1 row → every-Nth-frame rows with
    timestamps + per-frame phash (deterministic synthetic container;
    rows-only check — Arrow plumbing is the tested artifact)."""
    from dblp_crawler_spark import codecs
    from dblp_crawler_spark.operators.multimodal import sample_frames

    docs = _t(spark, sf_dir, "documents").limit(8).select("doc_id")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                vid = f"vid_{int(d):06d}"
                ids.append(vid)
                blobs.append(codecs.synth_video(vid, n_frames=12, w=32, h=24, fps=10))
            yield pd.DataFrame({"video_id": ids, "bytes": blobs})

    vids = docs.mapInPandas(gen, "video_id string, bytes binary")
    return sample_frames(vids, every_n=4)


def q_audio_features(spark, sf_dir):
    """Audio features over REAL PCM16 WAV decode (stdlib wave):
    duration/RMS/zero-crossing-rate/peak (rows-only check; analytic
    sine values pinned in tests)."""
    from dblp_crawler_spark import codecs
    from dblp_crawler_spark.operators.multimodal import audio_features

    docs = _t(spark, sf_dir, "documents").limit(16).select("doc_id")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                aid = f"aud_{int(d):06d}"
                ids.append(aid)
                blobs.append(codecs.synth_wav(aid, seconds=0.5, freq_hz=200.0 + (int(d) % 10) * 50))
            yield pd.DataFrame({"audio_id": ids, "bytes": blobs})

    auds = docs.mapInPandas(gen, "audio_id string, bytes binary")
    return audio_features(auds)


def q_ip_politeness(spark, sf_dir):
    """IP-level politeness collapse (scheduler.ip_politeness_pop):
    hosts sharing a server IP share ONE budget — per-host windows
    alone would hit a 10^4-vhost shared server with 10^4× the budget.
    50 synthetic hosts; the first 40 resolve onto 12 IPs (planted
    many-to-one), the last 10 are unresolved and degrade to private
    per-host keys. Broadcast dns stamp + the salted two-level top-k."""
    from dblp_crawler_spark.operators.scheduler import ip_politeness_pop

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    pending = docs.select(
        F.concat(F.lit("http://h"), (d % 50).cast("string"),
                 F.lit("/p"), d.cast("string")).alias("url"),
        F.concat(F.lit("h"), (d % 50).cast("string")).alias("host"),
        (d % 97).cast("long").alias("priority"),
    )
    dns = spark.range(40).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        F.concat(F.lit("ip"), (F.col("id") % 12).cast("string")).alias("ip"),
    )
    return ip_politeness_pop(pending, dns, budget=8)


def q_caption_quality(spark, sf_dir):
    """Alt-text junk gate (multimodal.caption_quality): camera
    filenames, pasted URLs, stock boilerplate, filler-only and
    keyword-stuffed captions are EXIF-speak, not descriptions — the
    cheapest of the three image+caption admission layers (before
    embedding_quality and clip_align_gate). One caption per junk
    class planted across the corpus; pure projection."""
    from dblp_crawler_spark.operators.multimodal import caption_quality

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m = F.col("doc_id") % 8
    d = F.col("doc_id").cast("string")
    cap = (
        F.when(m == 0, F.concat(F.lit("IMG_"), d))
        .when(m == 1, F.concat(F.lit("see https://ex.org/g"), d, F.lit(" for more")))
        .when(m == 2, F.lit("mountain lake shutterstock stock photo"))
        .when(m == 3, F.lit("image of a photo"))
        .when(m == 4, F.lit("dog dog dog dog puppy dog"))
        .when(m == 5, F.lit("ok"))
        .otherwise(F.substring("text", 1, 80))
    )
    pairs = docs.select(
        F.concat(F.lit("img_"), d).alias("image_id"), cap.alias("caption")
    )
    return caption_quality(pairs)


def q_pmi_collocations(spark, sf_dir):
    """Corpus collocation mining (textstats.pmi_collocations): top-k
    adjacent bigrams by PMI lift — the phrase detector (Church &
    Hanks; word2vec's phrase pass). A planted glued pair ("spark
    shuffle exchange" prefix on every 11th doc) must outrank the
    corpus's frequent-but-predictable function-word bigrams. Two
    hash aggs + broadcast vocabulary joins; top-k is
    TakeOrderedAndProject."""
    from dblp_crawler_spark.operators.textstats import pmi_collocations

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    t = F.when(
        F.col("doc_id") % 11 == 3,
        F.concat(F.lit("quantum entanglement beats noise. "), F.col("text")),
    ).otherwise(F.col("text"))
    return pmi_collocations(docs.select(t.alias("text")), k=15, min_count=4)


def q_stratified_sample(spark, sf_dir):
    """Deterministic k-per-stratum sample (textstats.
    stratified_sample): the eval-set draw — exact counts per lang,
    reproducible across engines because the order is the portable
    hash60(id, seed) family, not rand(). Salted two-level top-k per
    stratum (the politeness-pop shape) so the hot stratum never
    sorts in one task."""
    from dblp_crawler_spark.operators.textstats import stratified_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, k=7, stratum_col="lang", seed=3)


def q_code_detect(spark, sf_dir):
    """Code-vs-prose gate (textstats.code_prose_detect): symbol
    density + distinct code-keyword hits through a transparent
    linear score — the split that must precede tokenizer training.
    Every 6th doc gets planted source code appended; prose quoting
    a single keyword stays prose. Map-only projection."""
    from dblp_crawler_spark.operators.textstats import code_prose_detect

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id").cast("string")
    t = F.when(
        F.col("doc_id") % 6 == 2,
        F.concat(F.lit("def f_"), d,
                 F.lit("(x): return [i*i for i in range(x) if i % 2 == 0];")),
    ).otherwise(F.col("text"))
    return code_prose_detect(docs.select("doc_id", t.alias("text")))


# EXIF GPS fixture payloads (hex, shared with the oracle): a JPEG and
# a TIFF carrying the GPSInfo IFD pointer (tag 0x8825) as the second
# IFD entry behind a Make entry, a GPS-free JPEG, and a PNG.
_GPS_JPEG = (
    "FFD8" + "FFE000104A46494600010100000100010000"  # APP0
    + "FFE1002E" + "457869660000"
    + "49492A00" + "08000000" + "0200"
    + "0F010200" + "04000000" + "41424300"
    + "25880400" + "01000000" + "1A000000"
    + "00000000"
)
_GPS_TIFF = (
    "4D4D002A" + "00000008" + "0002"
    + "010F0002" + "00000004" + "41424300"
    + "88250004" + "00000001" + "0000001A"
    + "00000000"
)


def q_exif_gps(spark, sf_dir):
    """Decode-free EXIF GPS privacy flag (operators/sniff.
    exif_gps_flag): phone cameras geotag by default, so a scraped
    image corpus leaks shooting locations — the gate detects the
    GPSInfo IFD pointer (tag 0x8825) WITHOUT reading the coordinates
    it points to. Same staged walk as exif_orientation (JPEG APP1
    hop + endian-aware IFD scan). Planted: geotagged JPEG (Exif-II),
    geotagged TIFF (MM), GPS-free JPEG with EXIF, PNG (no EXIF)."""
    from dblp_crawler_spark.operators.sniff import exif_gps_flag

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 4
    hexstr = (
        F.when(m == 0, F.lit(_GPS_JPEG))
        .when(m == 1, F.lit(_GPS_TIFF))
        .when(m == 2, F.concat(F.lit(_EXIF_JPEG_PREFIX), F.lit("0100"),
                               F.lit(_EXIF_SUFFIX)))
        .otherwise(F.lit(_EXIF_PNG))
    )
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return exif_gps_flag(imgs).select("doc_id", "fmt", "has_gps")


def q_events_funnel(spark, sf_dir):
    """Ordered conversion funnel (streaming/events.funnel): per
    stage, users reaching view→click→purchase IN ORDER within 72h of
    their first view — the Amplitude/Mixpanel primitive. The per-user
    chain is stacked running-min windows over ONE (user, ts,
    event_id) sort; no self-joins, no per-user collect."""
    from dblp_crawler_spark.streaming.events import funnel

    return funnel(_t(spark, sf_dir, "events"))


def q_events_retention(spark, sf_dir):
    """Weekly retention cohorts (streaming/events.retention_cohorts):
    cohort = first-event date, retention at week k = active fraction
    k weeks later — day-exact arithmetic so no week-boundary
    convention can diverge cross-engine. One min-agg + one
    co-partitioned join + one distinct-count."""
    from dblp_crawler_spark.streaming.events import retention_cohorts

    return retention_cohorts(_t(spark, sf_dir, "events"))


def q_link_reciprocity(spark, sf_dir):
    """Reciprocal-link ratio (operators/hits.link_reciprocity): the
    link-farm signal — mutual-admiration rings trade links both ways,
    organic graphs don't. Synthetic host graph with planted
    reciprocal edges on every 4th row; one swapped self-equi-join
    over the distinct edge set."""
    from dblp_crawler_spark.operators.hits import link_reciprocity

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    base = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 23).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("doc_id") * 7 + 3) % 23).cast("string")).alias("dst"),
    )
    planted = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select(
            F.concat(F.lit("h"), ((F.col("doc_id") * 7 + 3) % 23).cast("string")).alias("src"),
            F.concat(F.lit("h"), (F.col("doc_id") % 23).cast("string")).alias("dst"),
        )
    )
    return link_reciprocity(base.unionByName(planted))


def q_sitemap_coverage(spark, sf_dir):
    """Per-host crawl-completeness audit (sources/webparse.
    sitemap_coverage): of the URLs a site declares in its sitemaps,
    how many were fetched (coverage) and how much fetch went to
    undeclared URL space (trap/duplicate burn). Declared and fetched
    sets planted with partial overlap plus undeclared extras; one
    full-outer equi-join + per-host conditional counts."""
    from dblp_crawler_spark.sources.webparse import sitemap_coverage

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string"))
    url = F.concat(F.lit("https://"), host, F.lit("/p/"),
                   F.col("doc_id").cast("string"))
    declared = docs.filter(F.col("doc_id") % 3 != 2).select(
        host.alias("host"), url.alias("url"))
    fetched_core = docs.filter((F.col("doc_id") % 2 == 0) | (F.col("doc_id") % 7 == 1)) \
                       .select(host.alias("host"), url.alias("url"))
    extras = docs.filter(F.col("doc_id") % 9 == 0).select(
        host.alias("host"),
        F.concat(url, F.lit("?session=1")).alias("url"))
    return sitemap_coverage(declared, fetched_core.unionByName(extras))


def q_zipf_slope(spark, sf_dir):
    """Zipf rank-frequency slope per source (textstats.zipf_slope):
    regress ln(freq) on ln(rank) over the top-100 terms — natural
    text sits near −1, template spam flattens. Exact-decimal
    regression sums (aggregation order cannot move the result); the
    rank window runs over the Heaps-law vocabulary aggregate, not
    the corpus."""
    from dblp_crawler_spark.operators.textstats import zipf_slope

    return zipf_slope(_t(spark, sf_dir, "documents").select("source", "text"))


#: SVG payload fixtures for q_svg_structure — double-quoted attrs
#: only (SVG is XML; also keeps the SQL literal escape trivial).
_SVG_CASES = [
    '<svg width="100" height="50" viewBox="0 0 100 50"><rect/></svg>',
    '<svg viewBox="0 0 10 10"><script>alert(1)</script></svg>',
    '<svg width="10" height="10"><rect onload="evil()"/></svg>',
    '<svg height="20pt" width="20pt"><foreignObject><a xlink:href='
    '"javascript:x"></a></foreignObject></svg>',
    '<svg width="32px" height="32px"><circle><animate attributeName='
    '"r"/></circle></svg>',
    '<?xml version="1.0"?><svg viewBox="0 0 300 150"></svg>',
    '<html><body><p>hi onclick= nothing</p></body></html>',
    '<svg width="100%" height="100%"></svg>',
]


def q_svg_structure(spark, sf_dir):
    """SVG structure + safety gate (webparse.svg_structure): the one
    TEXT image format, whose executable content (<script>, on*
    handlers, javascript: hrefs, <foreignObject>) must gate BEFORE
    rasterizing or re-serving; dims from the root tag (px/unitless
    only) and viewBox. Planted: a CSS-unit (pt) svg whose px dims
    stay NULL but whose js-href flags fire, a SMIL-animated icon,
    an xml-decl-prefixed viewBox-only doc, and plain HTML."""
    from dblp_crawler_spark.sources.webparse import svg_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_SVG_CASES)
    text = F.lit(_SVG_CASES[-1])
    for i, s in enumerate(_SVG_CASES[:-1]):
        text = F.when(m == i, F.lit(s)).otherwise(text)
    pages = docs.select("doc_id", text.alias("svg_text"))
    return svg_structure(pages).select(
        "doc_id", "is_svg", "width_px", "height_px", "vb_w", "vb_h",
        "has_script", "has_event_handler", "has_foreign_object",
        "has_js_href", "unsafe", "is_animated",
    )


def _ico_le(v: int, n: int) -> str:
    return "".join(f"{(v >> (8 * i)) & 255:02X}" for i in range(n))


def _ico_entry(w: int, h: int, off: int) -> str:
    """One 16-byte ICONDIRENTRY (dims, 1 plane, 32 bpp, 64-byte
    payload at `off`)."""
    return (_ico_le(w, 1) + _ico_le(h, 1) + "0000" + _ico_le(1, 2)
            + _ico_le(32, 2) + _ico_le(64, 4) + _ico_le(off, 4))


#: ICO fixtures: two-entry icon, PNG-embedded 256px icon (payload at
#: byte 22 = ICONDIR + 1 entry), cursor, truncated directory, a PNG
#: (non-ico), and a FIVE-entry icon pinning the scan cap (only the
#: first ICO_SCAN_ENTRIES=4 entries feed max dims).
_ICO_CASES = [
    "0000" + "0100" + _ico_le(2, 2) + _ico_entry(16, 16, 38) + _ico_entry(32, 32, 102),
    "0000" + "0100" + _ico_le(1, 2) + _ico_entry(0, 0, 22)
    + "89504E470D0A1A0A" + "00" * 8,
    "0000" + "0200" + _ico_le(1, 2) + _ico_entry(32, 32, 22),
    "00000100",
    "89504E470D0A1A0A" + "0000000D49484452",
    "0000" + "0100" + _ico_le(5, 2) + _ico_entry(8, 8, 86)
    + _ico_entry(16, 16, 86) + _ico_entry(24, 24, 86)
    + _ico_entry(32, 32, 86) + _ico_entry(48, 48, 86),
]


def q_ico_structure(spark, sf_dir):
    """Favicon/ICO directory structure (sniff.ico_structure):
    icon-vs-cursor kind, declared image count, max declared dims
    with the 0→256 convention, and PNG-embedded-entry detection (the
    Vista+ form that routes through the PNG decoder). Decode-free
    fixed-offset reads; the five-entry case pins the documented
    ICO_SCAN_ENTRIES cap."""
    from dblp_crawler_spark.operators.sniff import ico_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_ICO_CASES)
    hexstr = F.lit(_ICO_CASES[-1])
    for i, hx in enumerate(_ICO_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return ico_structure(imgs).select(
        "doc_id", "fmt", "kind", "n_images", "max_w", "max_h",
        "has_png_entry",
    )


def _jcs_seg(marker: str, payload: str) -> str:
    ln = len(payload) // 2 + 2
    return marker + f"{ln:04X}" + payload


def _jcs_sof(ncomp: int) -> str:
    comps = "".join(
        f"{i + 1:02X}" + ("22" if i == 0 else "11") + "00"
        for i in range(ncomp)
    )
    return _jcs_seg("FFC0", "08" + "0010" + "0010" + f"{ncomp:02X}" + comps)


def _jcs_adobe(tr: int) -> str:
    return _jcs_seg("FFEE", "41646F6265" + "0064" + "0000" + "0000"
                    + f"{tr:02X}")


_JCS_APP0 = _jcs_seg("FFE0", "4A46494600010100000100010000")
_JCS_ICC = _jcs_seg("FFE2", "4943435F50524F46494C4500" + "0101" + "00" * 16)
_JCS_SOS = _jcs_seg("FFDA", "01" + "010000")
#: JPEG colorspace fixtures: plain JFIF YCbCr, Adobe transform=0 RGB,
#: Adobe transform=2 YCCK, bare 4-comp CMYK, ICC-tagged, grayscale,
#: a PNG, a truncated JPEG, and an APP14 that does NOT spell 'Adobe'
#: (its transform byte must not count).
_JCS_CASES = [
    "FFD8" + _JCS_APP0 + _jcs_sof(3) + _JCS_SOS,
    "FFD8" + _JCS_APP0 + _jcs_adobe(0) + _jcs_sof(3) + _JCS_SOS,
    "FFD8" + _jcs_adobe(2) + _jcs_sof(4) + _JCS_SOS,
    "FFD8" + _JCS_APP0 + _jcs_sof(4) + _JCS_SOS,
    "FFD8" + _JCS_APP0 + _JCS_ICC + _jcs_sof(3) + _JCS_SOS,
    "FFD8" + _jcs_sof(1) + _JCS_SOS,
    "89504E470D0A1A0A" + "0000000D49484452",
    "FFD8" + _jcs_seg("FFEE", "58585858580064000000000002")
    + _jcs_sof(4) + _JCS_SOS,
]


def q_jpeg_colorspace(spark, sf_dir):
    """JPEG colorspace routing (sniff.jpeg_colorspace): the
    loader-crash tier — 4-component CMYK/YCCK press-pipeline JPEGs
    decode to garbage in 3-channel loaders, and the decode-free
    routing signal is SOF component count + the Adobe APP14
    transform byte (libjpeg convention), plus ICC-profile presence
    for color-managed routing. One bounded segment fold tracking
    first SOF/APP14/ICC simultaneously; a planted non-Adobe APP14
    pins that foreign APP14 payloads carry no transform."""
    from dblp_crawler_spark.operators.sniff import jpeg_colorspace

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_JCS_CASES)
    hexstr = F.lit(_JCS_CASES[-1])
    for i, hx in enumerate(_JCS_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return jpeg_colorspace(imgs).select(
        "doc_id", "fmt", "n_components", "adobe_transform", "has_icc",
        "colorspace", "cmyk_risk",
    )


def _tiff_ent_ii(tag, typ, val):
    t = f"{tag & 0xFF:02X}{tag >> 8:02X}" + f"{typ:02X}00" + "01000000"
    if typ == 3:
        return t + f"{val & 0xFF:02X}{val >> 8:02X}0000"
    return t + "".join(f"{(val >> (8 * i)) & 0xFF:02X}" for i in range(4))


def _tiff_ent_mm(tag, typ, val):
    v = f"{val:04X}0000" if typ == 3 else f"{val:08X}"
    return f"{tag:04X}{typ:04X}00000001" + v


def _tiff_ii(entries):
    return ("49492A00" + "08000000" + f"{len(entries):02X}00"
            + "".join(entries) + "00000000")


def _tiff_mm(entries):
    return ("4D4D002A" + "00000008" + f"{len(entries):04X}"
            + "".join(entries) + "00000000")


#: planted TIFF structure cases: LE LZW master, BE uncompressed with a
#: LONG height (the typed-read pin: its first two BE bytes are 0), an
#: old-style JPEG-in-TIFF, an off-table code (3 -> 'other'), a
#: tagless-compression master, and a non-TIFF row.
_TIFF_CASES = [
    _tiff_ii([_tiff_ent_ii(0x0100, 3, 800), _tiff_ent_ii(0x0101, 4, 600),
              _tiff_ent_ii(0x0103, 3, 5)]),
    _tiff_mm([_tiff_ent_mm(0x0100, 3, 1024), _tiff_ent_mm(0x0101, 4, 600),
              _tiff_ent_mm(0x0103, 3, 1)]),
    _tiff_ii([_tiff_ent_ii(0x0100, 3, 32), _tiff_ent_ii(0x0101, 3, 32),
              _tiff_ent_ii(0x0103, 3, 6)]),
    _tiff_mm([_tiff_ent_mm(0x0100, 3, 8), _tiff_ent_mm(0x0101, 3, 8),
              _tiff_ent_mm(0x0103, 3, 3)]),
    _tiff_ii([_tiff_ent_ii(0x0100, 4, 70000), _tiff_ent_ii(0x0101, 4, 50000)]),
    "FFD8FFE000104A46494600010100000100010000",
]


def q_tiff_structure(spark, sf_dir):
    """Standalone-TIFF routing (sniff.tiff_structure): scanner/archival
    masters hand a crawler bare .tif files whose decode path (LZW vs
    old-style JPEG-in-TIFF vs uncompressed multi-GB rows) and bomb-gate
    dims live in IFD0 — read endian-aware and TYPE-aware (a big-endian
    LONG's first two bytes are its high half, so an untyped 2-byte read
    silently returns 0; pinned by the BE LONG-height case)."""
    from dblp_crawler_spark.operators.sniff import tiff_structure

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_TIFF_CASES)
    hexstr = F.lit(_TIFF_CASES[-1])
    for i, hx in enumerate(_TIFF_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return tiff_structure(imgs).select(
        "doc_id", "fmt", "endian", "width", "height", "compression",
    )


def _apng_chunk(ctype, data_hex):
    return (f"{len(data_hex) // 2:08X}" + ctype.encode().hex().upper()
            + data_hex + "00000000")


_APNG_MAGIC = "89504E470D0A1A0A"
_APNG_IHDR = _apng_chunk("IHDR", "00000010" * 2 + "08" + "06" + "000000")
_APNG_IDAT = _apng_chunk("IDAT", "AB" * 4)
_APNG_IEND = _apng_chunk("IEND", "")

#: planted APNG cases: still PNG, looping 10-frame APNG, finite-replay
#: APNG, an acTL AFTER the image data (not an APNG — the chunk walk
#: parks at IDAT), ancillary chunks before acTL, and a GIF row.
_APNG_CASES = [
    _APNG_MAGIC + _APNG_IHDR + _APNG_IDAT + _APNG_IEND,
    _APNG_MAGIC + _APNG_IHDR + _apng_chunk("acTL", "0000000A00000000")
    + _APNG_IDAT + _APNG_IEND,
    _APNG_MAGIC + _APNG_IHDR + _apng_chunk("acTL", "0000000200000003")
    + _APNG_IDAT + _APNG_IEND,
    _APNG_MAGIC + _APNG_IHDR + _APNG_IDAT
    + _apng_chunk("acTL", "0000000A00000000") + _APNG_IEND,
    _APNG_MAGIC + _APNG_IHDR + _apng_chunk("tEXt", "AA" * 6)
    + _apng_chunk("pHYs", "00000B13" + "00000B13" + "01")
    + _apng_chunk("acTL", "0000000400000001") + _APNG_IDAT + _APNG_IEND,
    "4749463839611000" + "1000",
]


def q_png_animated(spark, sf_dir):
    """APNG detection (sniff.png_animated): animation hides inside an
    ordinary PNG — the acTL chunk before the first IDAT is the ONLY
    marker, so a pipeline routing 'png = still image' silently trains
    on frame 1 of animations. Length-hopped chunk walk that PARKS at
    IDAT/IEND (enforcing the spec's acTL-before-IDAT ordering for
    free; the late-acTL case pins it), emitting the declared frame and
    replay counts (plays 0 = loop forever)."""
    from dblp_crawler_spark.operators.sniff import png_animated

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_APNG_CASES)
    hexstr = F.lit(_APNG_CASES[-1])
    for i, hx in enumerate(_APNG_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return png_animated(imgs).select(
        "doc_id", "fmt", "is_apng", "n_frames", "n_plays",
    )


def _riff_case(form, payload_hex, declared=None):
    body = form.encode().hex().upper() + payload_hex
    size = declared if declared is not None else len(body) // 2
    le = "".join(f"{(size >> (8 * i)) & 0xFF:02X}" for i in range(4))
    return "52494646" + le + body


#: planted completeness cases: intact/EOI-less JPEG, intact PNG /
#: PNG cut after IDAT, intact/trailerless GIF, RIFF declaring its
#: true size / declaring 64 bytes over a short payload, and a bmp
#: (no trailer convention -> NULL, never a false truncation flag).
_PAYLOAD_JFIF = "FFD8FFE000104A46494600010100000100010000" + "AB" * 8
_PAYLOAD_PNG_BODY = (_APNG_MAGIC + _APNG_IHDR + _APNG_IDAT)
_PAYLOAD_CASES = [
    _PAYLOAD_JFIF + "FFD9",
    _PAYLOAD_JFIF,
    _PAYLOAD_PNG_BODY + "0000000049454E44AE426082",
    _PAYLOAD_PNG_BODY,
    "474946383961" + "1000" + "1000" + "00" * 6 + "3B",
    "474946383961" + "1000" + "1000" + "00" * 6,
    _riff_case("WEBP", "CD" * 10),
    _riff_case("WEBP", "CD" * 10, declared=64),
    "424D" + "00" * 20,
]


def q_payload_complete(spark, sf_dir):
    """Structural payload completeness (sniff.payload_complete):
    interrupted fetches are routine at crawl scale and invisible to a
    Content-Length check when the response was chunked — but JPEG
    (EOI FFD9), PNG (the fixed 12-byte IEND trailer) and GIF (0x3B)
    must CLOSE with a trailer, and RIFF containers declare their size
    in the header; both checks read 12 tail bytes + 16 head bytes of
    a possibly multi-MB blob, no decode. Formats without a convention
    stay NULL — no evidence is never 'complete' nor 'truncated'."""
    from dblp_crawler_spark.operators.sniff import payload_complete

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_PAYLOAD_CASES)
    hexstr = F.lit(_PAYLOAD_CASES[-1])
    for i, hx in enumerate(_PAYLOAD_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return payload_complete(imgs).select(
        "doc_id", "fmt", "payload_bytes", "trailer_ok", "truncated",
    )


#: planted admission cases (hex, declared fmt): honest PNG (admit),
#: EOI-less JPEG (truncated), complete GIF declared png (mismatch),
#: 30000x30000 PNG bomb with a valid IEND (bomb — trailer passes
#: first), complete WebP (review: decodable, dims not bomb-checked),
#: PDF (notimage), 3000x3000 ratio-bomb GIF, honest BMP (admit —
#: NULL trailer convention passes).
_ADMIT_CASES = [
    (_APNG_MAGIC + _APNG_IHDR + _APNG_IDAT + "0000000049454E44AE426082", "png"),
    (_PAYLOAD_JFIF, "jpeg"),
    ("474946383961" + "1000" + "1000" + "00" * 6 + "3B", "png"),
    (_APNG_MAGIC + _apng_chunk("IHDR", "00007530" * 2 + "0806000000")
     + _APNG_IDAT + "0000000049454E44AE426082", "png"),
    (_riff_case("WEBP", "CD" * 10), "webp"),
    ("255044462D312E34" + "00" * 8, "pdf"),
    ("474946383961" + "B80B" + "B80B" + "00" * 6 + "3B", "gif"),
    ("424D" + "1E000000" + "00000000" + "1A000000" + "28000000"
     + "20000000" + "20000000" + "0100", "bmp"),
]


def q_pipeline_payload_admission(spark, sf_dir):
    """Composed image-store admission (sniff.payload_admission): the
    verdict a fetch pipeline needs before ANY decoder runs, chaining
    the header tiers in cheapest-rejection order — magic sniff
    (notimage), trailer completeness (truncated), declared-vs-sniffed
    contradiction (mismatch), dims-unreadable routing (review), the
    decompression-bomb gate (bomb), else admit. ONE map-side
    projection; every stage is an already-oracled operator and the
    DuckDB replay chains the same fragments, so the composition is
    verified as a unit."""
    from dblp_crawler_spark.operators.sniff import payload_admission

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_ADMIT_CASES)
    hexstr = F.lit(_ADMIT_CASES[-1][0])
    decl = F.lit(_ADMIT_CASES[-1][1])
    for i, (hx, dc) in enumerate(_ADMIT_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
        decl = F.when(m == i, F.lit(dc)).otherwise(decl)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"),
                       decl.alias("declared"))
    return payload_admission(imgs, declared_col="declared").select(
        "doc_id", "fmt", "payload_bytes", "trailer_ok", "width", "height",
        "pixels", "oversized", "bomb_ratio", "verdict",
    )


def _icc_profile_hex(size=200, cls="6D6E7472", cs="52474220",
                     acsp=True, intent=0):
    return (f"{size:08X}" + "00" * 4 + "04400000" + cls + cs + "58595A20"
            + "00" * 12 + ("61637370" if acsp else "DEADBEEF")
            + "00" * 24 + f"{intent:08X}" + "00" * 60)


def _icc_app2(profile_hex):
    payload = "4943435F50524F46494C4500" + "0101" + profile_hex
    return "FFE2" + f"{len(payload) // 2 + 2:04X}" + payload


_ICC_APP0 = "FFE0" + "0010" + "4A46494600010100000100010000"
_ICC_APP1 = "FFE1" + "0014" + "457869660000" + "49492A0008000000" + "0000"

#: planted ICC cases: sRGB display profile, CMYK output profile with
#: relative intent, a profile hiding behind APP0+EXIF (walk hops),
#: a bad-acsp profile (found but not trusted), off-table signatures
#: + intent 7 (-> 'other'), an ICC-less JPEG, and a PNG.
_ICC_CASES = [
    "FFD8" + _ICC_APP0 + _icc_app2(_icc_profile_hex()),
    "FFD8" + _icc_app2(_icc_profile_hex(cls="70727472", cs="434D594B",
                                        intent=1, size=544)),
    "FFD8" + _ICC_APP0 + _ICC_APP1 + _icc_app2(_icc_profile_hex(intent=3)),
    "FFD8" + _icc_app2(_icc_profile_hex(acsp=False)),
    "FFD8" + _icc_app2(_icc_profile_hex(cls="AAAAAAAA", cs="BBBBBBBB",
                                        intent=7)),
    "FFD8" + _ICC_APP0 + "FFDB000401" + "00",
    "89504E470D0A1A0A" + "00" * 8,
]


def q_icc_profile(spark, sf_dir):
    """ICC profile header routing (sniff.icc_profile): a CMYK press
    profile, an exotic rendering intent, or a non-display class each
    need a different normalize step before pixels enter a training
    set — and the routing facts sit in the fixed 128-byte ICC header
    carried in JPEG APP2 behind 'ICC_PROFILE\\0', readable without
    decoding image OR profile. has_icc is the segment-found flag;
    fields additionally gate on the 'acsp' magic (found-but-corrupt
    pinned); off-table signatures and intents label 'other'."""
    from dblp_crawler_spark.operators.sniff import icc_profile

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_ICC_CASES)
    hexstr = F.lit(_ICC_CASES[-1])
    for i, hx in enumerate(_ICC_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return icc_profile(imgs).select(
        "doc_id", "fmt", "has_icc", "icc_size", "icc_class",
        "icc_colorspace", "icc_intent",
    )


def _webp_le32(n):
    return "".join(f"{(n >> (8 * i)) & 0xFF:02X}" for i in range(4))


def _webp_chunk(fourcc, payload_hex):
    size = len(payload_hex) // 2
    pad = "00" if size % 2 else ""
    return fourcc.encode().hex().upper() + _webp_le32(size) + payload_hex + pad


def _webp_riff(body_hex):
    return "52494646" + _webp_le32(len(body_hex) // 2 + 4) + "57454250" + body_hex


_WA_VP8X_ANIM = _webp_chunk("VP8X", "02" + "000000" + "0F0000" + "0F0000")
_WA_VP8X_STILL = _webp_chunk("VP8X", "00" + "000000" + "0F0000" + "0F0000")
_WA_ANMF = _webp_chunk("ANMF", "AB" * 16)

#: planted WebP animation cases: lossy still, infinite-loop 3-frame,
#: loop-5 2-frame, an odd-sized ICCP before ANIM (the even-pad hop),
#: extended-but-still VP8X, and a GIF row.
_WA_CASES = [
    _webp_riff(_webp_chunk("VP8 ", "9D012A" + "00" * 8)),
    _webp_riff(_WA_VP8X_ANIM + _webp_chunk("ANIM", "00000000" + "0000")
               + _WA_ANMF + _WA_ANMF + _WA_ANMF),
    _webp_riff(_WA_VP8X_ANIM + _webp_chunk("ANIM", "00000000" + "0500")
               + _WA_ANMF + _WA_ANMF),
    _webp_riff(_WA_VP8X_ANIM + _webp_chunk("ICCP", "CD" * 7)
               + _webp_chunk("ANIM", "00000000" + "0300") + _WA_ANMF),
    _webp_riff(_WA_VP8X_STILL + _webp_chunk("VP8 ", "9D012A" + "00" * 8)),
    "474946383961" + "1000" + "1000",
]


def q_webp_animation(spark, sf_dir):
    """WebP animation walk (sniff.webp_animation): VP8X extended
    files hide animation behind the container — ANIM carries the
    loop count (0 = forever), each frame is an ANMF chunk, and RIFF
    chunks pad to EVEN length (the pad byte is the classic walker
    off-by-one, pinned by an odd ICCP before ANIM). Completes the
    animation routing family next to png_animated and the GIF
    NETSCAPE hint; frame count is a documented lower bound inside
    the window."""
    from dblp_crawler_spark.operators.sniff import webp_animation

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_WA_CASES)
    hexstr = F.lit(_WA_CASES[-1])
    for i, hx in enumerate(_WA_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return webp_animation(imgs).select(
        "doc_id", "fmt", "is_animated", "loop_count", "n_frames_lb",
    )


def _es_app1(orientation=6):
    ifd = ("49492A00" + "08000000" + "0100"
           + "1201" + "0300" + "01000000" + f"{orientation:02X}000000"
           + "00000000")
    payload = "457869660000" + ifd
    return "FFE1" + f"{len(payload) // 2 + 2:04X}" + payload


_ES_APP0 = "FFE0" + "0010" + "4A46494600010100000100010000"
_ES_DQT = "FFDB" + "0006" + "0001020304"

#: planted strip cases: EXIF behind APP0, EXIF first, EXIF-less,
#: an APP1 declaring a length past the payload (detected but NOT
#: removable — surgery must never shear real bytes), and a PNG.
_ES_CASES = [
    "FFD8" + _ES_APP0 + _es_app1() + _ES_DQT,
    "FFD8" + _es_app1(3) + _ES_APP0 + _ES_DQT,
    "FFD8" + _ES_APP0 + _ES_DQT,
    "FFD8" + "FFE1" + "0FFF" + "457869660000" + "AA" * 4,
    "89504E470D0A1A0A" + "00" * 8,
]


def q_exif_strip(spark, sf_dir):
    """EXIF strip (sniff.exif_strip): the publish-side privacy
    transform — exif_gps_flag DETECTS geotags, but a corpus that
    ships payloads must REMOVE the metadata, and the whole EXIF block
    lives in one APP1 segment whose boundaries are readable from the
    header, so the strip is pure byte surgery (two binary substrings
    + concat): no decode, no re-encode, pixels untouched. A declared
    length running past the payload is detected but NOT removed —
    surgery never shears real bytes (pinned); the stripped payload
    reads NULL through exif_orientation (pinned end-to-end)."""
    from dblp_crawler_spark.operators.sniff import exif_strip

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_ES_CASES)
    hexstr = F.lit(_ES_CASES[-1])
    for i, hx in enumerate(_ES_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    out = exif_strip(imgs)
    return out.select(
        "doc_id", "fmt", "had_exif", "removed_bytes",
        F.hex(F.col("stripped")).alias("stripped_hex"),
    )


def _xmp_app1(xml: str) -> str:
    payload = ("http://ns.adobe.com/xap/1.0/\x00" + xml).encode()
    return "FFE1" + f"{len(payload) + 2:04X}" + payload.hex().upper()


#: planted XMP cases: CC-BY packet with attribute-form Marked +
#: WebStatement + dc:rights, element-form Marked=False, a rights-less
#: packet, an XMP-less JPEG, and a PNG.
_XMP_CASES = [
    "FFD8" + _ES_APP0 + _xmp_app1(
        '<x:xmpmeta><rdf:RDF><rdf:Description xmpRights:Marked="True" '
        'xmpRights:WebStatement="https://creativecommons.org/licenses/by/4.0/">'
        "<dc:rights><rdf:Alt><rdf:li xml:lang='x-default'>(c) Jane Doe"
        "</rdf:li></rdf:Alt></dc:rights></rdf:Description></rdf:RDF>"
        "</x:xmpmeta>") + "FFDB0006" + "0001020304",
    "FFD8" + _xmp_app1("<rdf:Description><xmpRights:Marked>False"
                       "</xmpRights:Marked></rdf:Description>"),
    "FFD8" + _xmp_app1("<x:xmpmeta><rdf:RDF/></x:xmpmeta>"),
    "FFD8" + _ES_APP0,
    "89504E470D0A1A0A" + "00" * 8,
]


def q_xmp_license(spark, sf_dir):
    """XMP rights extraction (sniff.xmp_license): whether a scraped
    image may enter a training set at all often lives in its XMP
    packet — xmpRights:Marked (the copyrighted flag, tri-state:
    NULL = not asserted), xmpRights:WebStatement (the license URL —
    CC deeds live here) and dc:rights. XMP is plain UTF-8 XML behind
    the public APP1 namespace signature; the walk slices EXACTLY the
    packet bytes so the binary around it never reaches the decoder.
    Attribute and element spellings both pinned."""
    from dblp_crawler_spark.operators.sniff import xmp_license

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_XMP_CASES)
    hexstr = F.lit(_XMP_CASES[-1])
    for i, hx in enumerate(_XMP_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return xmp_license(imgs).select(
        "doc_id", "fmt", "has_xmp", "xmp_marked", "license_url", "rights",
    )


def _cam_app1(model: str, le=True, inline=False):
    val = model.encode() + b"\x00"
    cnt = len(val)
    if le:
        ent = "1001" + "0200" + "".join(
            f"{(cnt >> (8 * i)) & 0xFF:02X}" for i in range(4))
    else:
        ent = "0110" + "0002" + f"{cnt:08X}"
    if inline:
        v, extra = val.hex().upper().ljust(8, "0"), ""
    else:
        off = 8 + 2 + 12 + 4
        v = ("".join(f"{(off >> (8 * i)) & 0xFF:02X}" for i in range(4))
             if le else f"{off:08X}")
        extra = val.hex().upper()
    hdr = ("49492A00" + "08000000" + "0100") if le \
        else ("4D4D002A" + "00000008" + "0001")
    payload = "457869660000" + hdr + ent + v + "00000000" + extra
    return "FFE1" + f"{len(payload) // 2 + 2:04X}" + payload


#: planted camera-model cases: LE offset-stored, BE offset-stored,
#: LE inline (count <= 4), EXIF-less JPEG, PNG.
_CAM_CASES = [
    "FFD8" + _cam_app1("Canon EOS R5", le=True),
    "FFD8" + _cam_app1("NIKON Z9", le=False),
    "FFD8" + _cam_app1("X1", le=True, inline=True),
    "FFD8" + _ES_APP0,
    "89504E470D0A1A0A" + "00" * 8,
]


def q_exif_camera_model(spark, sf_dir):
    """EXIF camera-model provenance (sniff.exif_camera_model): a host
    whose images all report ONE model is a single-shooter archive; a
    host whose images report NONE is usually synthetic output
    (generators don't write EXIF) — per-host model diversity is the
    stock-farm signal. ASCII tag 0x0110 read endian-aware with the
    inline-vs-offset storage rule (count <= 4 packs into the value
    field; larger strings live behind an offset from the TIFF
    header), NUL terminator excluded, clamped at 32 bytes."""
    from dblp_crawler_spark.operators.sniff import exif_camera_model

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_CAM_CASES)
    hexstr = F.lit(_CAM_CASES[-1])
    for i, hx in enumerate(_CAM_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return exif_camera_model(imgs).select("doc_id", "fmt", "camera_model")


#: planted K4 on fresh nodes for q_triangle_counts — 4 triangles,
#: every member in 3, clustering 1.0 on the degree-3 corners.
_TRI_K4 = [("h100", "h101"), ("h100", "h102"), ("h100", "h103"),
           ("h101", "h102"), ("h101", "h103"), ("h102", "h103")]


def q_triangle_counts(spark, sf_dir):
    """Per-host triangle participation + local clustering
    (hits.triangle_counts): the community-vs-link-farm texture
    signal — organic neighborhoods close triangles, generated spam
    constellations are locally tree-like. Compact-forward
    orientation (degree-ordered edges) bounds the wedge join on hot
    hubs; planted K4 on fresh nodes pins 4 triangles / clustering
    1.0 against the circulant bulk."""
    from dblp_crawler_spark.operators.hits import triangle_counts

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    base = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 23).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("doc_id") * 7 + 3) % 23).cast("string")).alias("dst"),
    )
    ksrc = F.lit(_TRI_K4[-1][0])
    kdst = F.lit(_TRI_K4[-1][1])
    for i, (s, d) in enumerate(_TRI_K4[:-1]):
        ksrc = F.when(F.col("doc_id") == i, F.lit(s)).otherwise(ksrc)
        kdst = F.when(F.col("doc_id") == i, F.lit(d)).otherwise(kdst)
    planted = docs.filter(F.col("doc_id") < len(_TRI_K4)).select(
        ksrc.alias("src"), kdst.alias("dst"))
    return triangle_counts(base.unionByName(planted))


def q_events_transitions(spark, sf_dir):
    """First-order Markov transition matrix (streaming/events.
    transition_matrix): per ordered event-type pair, how often the
    second immediately follows the first in a user's stream and the
    per-from probability — next-page/broken-flow modeling. One
    per-user lead window ((ts, event_id)-deterministic), one hash
    agg; the normalizer windows the tiny aggregated matrix, never
    the event stream."""
    from dblp_crawler_spark.streaming.events import transition_matrix

    return transition_matrix(_t(spark, sf_dir, "events"))


#: homograph fixtures: brand targets, a Cyrillic-е and a Cyrillic-а
#: imposter, a digit imposter, and a punycode host. Bulk site{k}
#:.com hosts with 0/1 digits skeleton-shift but collide with no
#: target, so they must produce NO pairs.
_HOMOGRAPH_PLANTED = [
    "google.com", "googlе.com", "g00gle.com",
    "paypal.com", "pаypal.com", "xn--pypal-4ve.com",
]


def _homograph_hosts(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    bulk = docs.select(
        F.concat(F.lit("site"), (F.col("doc_id") % 40).cast("string"),
                 F.lit(".com")).alias("host"))
    ph = F.lit(_HOMOGRAPH_PLANTED[-1])
    for i, s in enumerate(_HOMOGRAPH_PLANTED[:-1]):
        ph = F.when(F.col("doc_id") == i, F.lit(s)).otherwise(ph)
    planted = docs.filter(F.col("doc_id") < len(_HOMOGRAPH_PLANTED)) \
                  .select(ph.alias("host"))
    return bulk.unionByName(planted)


def _homograph_hosts_sql() -> str:
    whens = "".join(
        f" WHEN {i} THEN '{s}'"
        for i, s in enumerate(_HOMOGRAPH_PLANTED[:-1]))
    return f"""(
        SELECT 'site' || CAST(doc_id % 40 AS VARCHAR) || '.com' AS host
        FROM documents
        UNION ALL
        SELECT CASE doc_id{whens} ELSE '{_HOMOGRAPH_PLANTED[-1]}' END AS host
        FROM documents WHERE doc_id < {len(_HOMOGRAPH_PLANTED)}
    )"""


def q_idn_homograph(spark, sf_dir):
    """Per-host IDN confusable flags (hostdup.idn_homograph):
    ascii_only (bytes==chars), xn-- punycode labels, the TR39
    mixed-script red flag (Latin + Cyrillic/Greek in one host), and
    the confusable skeleton (translate — codepoint-identical in both
    engines). The skeleton is the block key homograph_pairs joins
    on."""
    from dblp_crawler_spark.operators.hostdup import idn_homograph

    return idn_homograph(_homograph_hosts(spark, sf_dir))


def q_homograph_pairs(spark, sf_dir):
    """Homograph-attack pairs (hostdup.homograph_pairs): hosts the
    confusable map CHANGED (imposters) equi-joined on skeleton
    against hosts it FIXED (authentic Latin spellings) — planted
    Cyrillic-е/-а and 0-for-o imposters collide with their brands,
    while bulk digit-bearing hosts skeleton-shift but match no
    target and must stay silent."""
    from dblp_crawler_spark.operators.hostdup import homograph_pairs

    return homograph_pairs(_homograph_hosts(spark, sf_dir))


def q_pipeline_recrawl_plan(spark, sf_dir):
    """Composed recrawl-wave planner in ONE plan — the freshness-
    side integration statement next to pipeline_frontier_plan's
    admission side: fetch log → recrawl_priorities (observed
    change-rate staleness, the measured-cadence generalization of
    fixed TTLs) → per-host admission cap (top-5 by priority, the
    budget discipline that keeps one hot host from eating the wave)
    → exact politeness_timeline schedule (prefix-max closed form,
    delay 0.5 s). Every stage is an existing oracled operator; the
    replay chains the same fragments so the composition is verified
    as a unit. Output: the recrawl wave's exact fetch schedule with
    its driving priority."""
    from dblp_crawler_spark.operators import recrawl as RC
    from dblp_crawler_spark.operators.scheduler import politeness_timeline

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.concat(F.lit("https://h"), (F.col("user_id") % 7).cast("string"),
                 F.lit(".org/p"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts"),
        F.col("event_type").alias("fingerprint"),
    )
    pr = RC.recrawl_priorities(log)
    cand = pr.filter(F.col("priority").isNotNull()).select(
        "url",
        F.regexp_extract("url", r"^https://([^/]+)/", 1).alias("host"),
        "priority",
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    adm = cand.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5)
    wave = adm.select("host", "url", "priority",
                      F.lit(0).cast("long").alias("ready_us"))
    return politeness_timeline(wave, delay_us=500000).select(
        "host", "url", "priority", "k", "start_us", "finish_us"
    )


#: planted K5 + a pendant 3-chain off n4 for q_host_kcore: at k=2
#: the chain peels one node per round while the clique and the
#: degree-2 circulant bulk survive — the density-vs-pendant signal.
_KCORE_PLANTED = (
    [(f"n{i}", f"n{j}") for i in range(5) for j in range(i + 1, 5)]
    + [("n4", "p0"), ("p0", "p1"), ("p1", "p2")]
)


def q_host_kcore(spark, sf_dir):
    """k-core peel of the host link graph (hits.kcore): the density
    complement to triangle_counts — a link farm fakes degree but
    pendant trees peel away round by round, and only hosts held by a
    dense neighborhood survive. Synchronous fixed-round peel (one
    degree agg + two keep-joins per round, localCheckpoint lineage
    truncation) so the unrolled DuckDB CTE chain replays the loop
    exactly. Planted K5 + pendant chain against the circulant bulk;
    k=2, 6 rounds (past the fixpoint)."""
    from dblp_crawler_spark.operators.hits import kcore

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    bulk = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 23).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("doc_id") * 7 + 3) % 23).cast("string")).alias("dst"),
    )
    ksrc = F.lit(_KCORE_PLANTED[-1][0])
    kdst = F.lit(_KCORE_PLANTED[-1][1])
    for i, (s, d) in enumerate(_KCORE_PLANTED[:-1]):
        ksrc = F.when(F.col("doc_id") == i, F.lit(s)).otherwise(ksrc)
        kdst = F.when(F.col("doc_id") == i, F.lit(d)).otherwise(kdst)
    planted = docs.filter(F.col("doc_id") < len(_KCORE_PLANTED)).select(
        ksrc.alias("src"), kdst.alias("dst"))
    return kcore(bulk.unionByName(planted), k=2, rounds=6)


def _png_chunk_hex(ctype: bytes, data: bytes) -> str:
    return (f"{len(data):08X}" + ctype.hex().upper()
            + data.hex().upper() + "00000000")


_PNG_SIG = "89504E470D0A1A0A"
_PNGTXT_IHDR = _png_chunk_hex(
    b"IHDR", bytes.fromhex("0000001000000010") + bytes([8, 6, 0, 0, 0]))
_PNGTXT_IDAT = _png_chunk_hex(b"IDAT", b"\x00")


def _pngtxt(keyword: bytes, value: bytes, pre: str = "") -> str:
    body = _PNG_SIG + _PNGTXT_IHDR + pre
    body += _png_chunk_hex(b"tEXt", keyword + b"\x00" + value)
    return body + _PNGTXT_IDAT


#: planted tEXt cases: exporter Software, SD-WebUI parameters chunk,
#: generator Software behind a gAMA hop, tEXt-less PNG, a spec-legal
#: but post-IDAT tEXt (never seen — park rule), and a JPEG.
_PNGTXT_CASES = [
    _pngtxt(b"Software", b"GIMP 2.10"),
    _pngtxt(b"parameters", b"masterpiece, 8k, trending"),
    _pngtxt(b"Software", b"Stable Diffusion web UI",
            pre=_png_chunk_hex(b"gAMA", (45455).to_bytes(4, "big"))),
    _PNG_SIG + _PNGTXT_IHDR + _PNGTXT_IDAT,
    _PNG_SIG + _PNGTXT_IHDR + _PNGTXT_IDAT
    + _png_chunk_hex(b"tEXt", b"Software\x00late"),
    "FFD8FFE000104A46494600010100000100010000",
]


def q_png_text_provenance(spark, sf_dir):
    """PNG tEXt provenance (sniff.png_text_chunk): generators sign
    their PNG output in textual chunks — SD-WebUI writes the whole
    prompt under 'parameters', exporters write 'Software' — the PNG
    counterpart of the EXIF camera-model signal (PNGs carry no
    EXIF). Bounded chunk walk parked at IDAT/IEND, unrolled
    first-NUL keyword probe, printable-ASCII decode gate (the rule
    that keeps Spark's U+FFFD-substituting decode and DuckDB's
    erroring decode exact), value clamped at 48 bytes."""
    from dblp_crawler_spark.operators.sniff import png_text_chunk

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_PNGTXT_CASES)
    hexstr = F.lit(_PNGTXT_CASES[-1])
    for i, hx in enumerate(_PNGTXT_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return png_text_chunk(imgs).select(
        "doc_id", "fmt", "text_keyword", "text_value", "gen_hint")


#: classic double-decode residue (UTF-8 re-read as Latin-1), built
#: not typed so the plant is provably the real damage bytes.
_MOJI_RESIDUE = "café déjà vu".encode("utf-8").decode("latin-1")
_MOJI_REPL_DOC = "broken � page � here"


def q_mojibake_gate(spark, sf_dir):
    """Encoding-damage detection (textstats.mojibake_stats):
    double-decoded UTF-8 residue is invisible to lang-ID, charset
    declarations, and dedup — only the structural signatures (C2-DF
    lead + continuation-image follower; E0-EF lead + two; U+FFFD)
    count it. Signature classes rendered from ONE Python table into
    both engines; flag = min-hits AND density. Planted residue and
    replacement-char docs against the clean document bulk."""
    from dblp_crawler_spark.operators.textstats import mojibake_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m = F.col("doc_id") % 7
    text = (
        F.when(m == 0, F.concat(F.col("text"), F.lit(" " + _MOJI_RESIDUE)))
        .when(m == 1, F.lit(_MOJI_REPL_DOC))
        .otherwise(F.col("text"))
    )
    return mojibake_stats(docs.select("doc_id", text.alias("text")))


def q_pagination_chains(spark, sf_dir):
    """Pagination list-ranking (redirects.pagination_chains):
    rel=next series resolved to (root, 1-based page index) by Wyllie
    pointer doubling over the predecessor forest — the fetch-in-
    order key for listing series and the trap detector for infinite
    calendars (cycles, self-loops, and chains past the 2^rounds
    horizon report complete=false). Bulk 6-page chains per site, a
    planted 41-page trap chain that crosses the rounds=5 horizon, a
    3-cycle, and a self-loop."""
    from dblp_crawler_spark.operators.redirects import pagination_chains

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    site = (F.col("doc_id") % 37).cast("string")
    page = F.col("doc_id") % 6
    bulk = docs.filter(page < 5).select(
        F.concat(F.lit("https://s"), site, F.lit(".com/list?page="),
                 page.cast("string")).alias("url"),
        F.concat(F.lit("https://s"), site, F.lit(".com/list?page="),
                 (page + 1).cast("string")).alias("next_url"),
    )
    trap = docs.filter(F.col("doc_id") < 40).select(
        F.concat(F.lit("https://trap.example/p"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("https://trap.example/p"),
                 (F.col("doc_id") + 1).cast("string")).alias("next_url"),
    )
    cyc = docs.filter(F.col("doc_id") < 3).select(
        F.concat(F.lit("https://cyc.example/p"),
                 (F.col("doc_id") % 3).cast("string")).alias("url"),
        F.concat(F.lit("https://cyc.example/p"),
                 ((F.col("doc_id") + 1) % 3).cast("string")).alias("next_url"),
    )
    selfl = docs.filter(F.col("doc_id") == 0).select(
        F.lit("https://self.example/p0").alias("url"),
        F.lit("https://self.example/p0").alias("next_url"),
    )
    links = bulk.unionByName(trap).unionByName(cyc).unionByName(selfl)
    return pagination_chains(links, rounds=5)


def q_robots_drift(spark, sf_dir):
    """robots.txt drift (scheduler.robots_drift): which queued URLs
    FLIP when a host publishes a new robots.txt — newly_blocked must
    leave the frontier (compliance), newly_allowed are re-seed
    candidates. Both rule generations run the full RFC 9309
    longest-match decision (wildcards, '$' anchors, allow-tie), so
    an Allow override like /private/pub* keeps its subtree crawlable
    while /private flips blocked. Even hosts tighten, h3 releases
    /tmp, odd hosts are rule-free in both generations."""
    from dblp_crawler_spark.operators.scheduler import robots_drift

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    hh = (F.col("doc_id") % 7).cast("string")
    seg = F.when(F.col("doc_id") % 4 == 0, "private") \
        .when(F.col("doc_id") % 4 == 1, "pub") \
        .when(F.col("doc_id") % 4 == 2, "private/pub").otherwise("tmp")
    urls = docs.select(
        F.concat(F.lit("https://h"), hh, F.lit(".org/"), seg, F.lit("/d"),
                 (F.col("doc_id") % 50).cast("string")).alias("url"))
    hosts = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"),
                 F.lit(".org")).alias("host")).distinct()
    old = hosts.filter(F.col("host") == "h3.org").select(
        "host", F.lit("disallow").alias("rule"), F.lit("/tmp").alias("pattern"))
    even = F.substring("host", 2, 1).cast("int") % 2 == 0
    new = hosts.filter(even).select(
        "host", F.lit("disallow").alias("rule"), F.lit("/private").alias("pattern")
    ).unionByName(
        hosts.filter(even).select(
            "host", F.lit("allow").alias("rule"),
            F.lit("/private/pub*").alias("pattern"))
    )
    return robots_drift(urls, old, new)


def q_parallel_corpus_mine(spark, sf_dir):
    """Parallel-corpus mining (webparse.parallel_corpus_mine): the
    web's self-labeled bitext — reciprocal hreflang pairs with both
    declared languages pulled from the edge pair, gated by the
    integer length-ratio bitext filter and declared-vs-observed
    language consistency. Planted families: every 5th site declares
    one-way only (dropped by reciprocity), every 5th serves a
    two-word 'translation' (len gate), every 5th declares Italian
    over a French page (lang gate); the rest align."""
    from dblp_crawler_spark.sources.webparse import parallel_corpus_mine

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text") \
        .filter(F.col("doc_id") < 400)
    site = (F.col("doc_id") % 31).cast("string")
    pid = F.col("doc_id").cast("string")
    en = F.concat(F.lit("https://s"), site, F.lit(".org/en/p"), pid)
    fr = F.concat(F.lit("https://s"), site, F.lit(".org/fr/p"), pid)
    m5 = F.col("doc_id") % 5
    fr_decl = F.when(m5 == 2, "it").otherwise("fr")
    fwd = docs.select(en.alias("url"), fr_decl.alias("hreflang"),
                      fr.alias("alt_url"))
    back = docs.filter(m5 != 4).select(
        fr.alias("url"), F.lit("en").alias("hreflang"), en.alias("alt_url"))
    alt = fwd.unionByName(back)
    en_docs = docs.select(en.alias("url"), F.lit("en").alias("lang"), "text")
    fr_docs = docs.select(
        fr.alias("url"), F.lit("fr").alias("lang"),
        F.when(m5 == 3, F.lit("deux mots"))
         .otherwise(F.concat(F.lit("le "), F.col("text"))).alias("text"))
    return parallel_corpus_mine(alt, en_docs.unionByName(fr_docs))


def q_variant_preference(spark, sf_dir):
    """Scheme/www variant election (hostdup.variant_preference):
    collapse http/https × www/bare spellings of the same page BEFORE
    fetching — rank https*2 + bare*1, smallest URL on ties — so the
    frontier rewrites aliases instead of fetching a page four times.
    Synthesis covers full quartets (7 hosts × 11 paths × all four
    spellings at every SF)."""
    from dblp_crawler_spark.operators.hostdup import variant_preference

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m4 = F.col("doc_id") % 4
    prefix = (
        F.when(m4 == 0, "http://")
        .when(m4 == 1, "http://www.")
        .when(m4 == 2, "https://")
        .otherwise("https://www.")
    )
    urls = docs.select(
        F.concat(prefix, F.lit("v"), (F.col("doc_id") % 7).cast("string"),
                 F.lit(".org/p"), (F.col("doc_id") % 11).cast("string"))
        .alias("url"))
    return variant_preference(urls)


def q_tokenizer_fertility(spark, sf_dir):
    """Per-language tokenizer fertility (textstats.
    tokenizer_fertility): chars per BPE-ish token and the
    BPE-vs-whitespace blowup — the exchange rate that converts
    corpus weights into effective token budgets per language. One
    hash agg over the documents table with both existing token
    counters."""
    from dblp_crawler_spark.operators.textstats import tokenizer_fertility

    return tokenizer_fertility(_t(spark, sf_dir, "documents"))


#: planted density cases: JFIF 300 dpi scan, JFIF 118 dpcm, JFIF
#: aspect-only, PNG pHYs 2835/m (72 dpi), density-less PNG, GIF.
def _jfif_hex(unit: int, dx: int, dy: int) -> str:
    return ("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101"
            + f"{unit:02X}" + f"{dx:04X}" + f"{dy:04X}" + "0000")


_DENSITY_CASES = [
    _jfif_hex(1, 300, 300),
    _jfif_hex(2, 118, 118),
    _jfif_hex(0, 1, 1),
    _PNG_SIG + _PNGTXT_IHDR
    + _png_chunk_hex(b"pHYs", (2835).to_bytes(4, "big")
                     + (2835).to_bytes(4, "big") + b"\x01") + _PNGTXT_IDAT,
    _PNG_SIG + _PNGTXT_IHDR + _PNGTXT_IDAT,
    "474946383961" + "00" * 8,
]


def q_image_density(spark, sf_dir):
    """Physical pixel density (sniff.image_density): scan-vs-screen
    provenance — 300/600 dpi means scanner or camera pipeline, 72/96
    means screen export, and generators usually write nothing. JFIF
    APP0 fixed-offset reads + the bounded PNG chunk walk parked at
    pHYs; inch normalization in integer half-up arithmetic so both
    engines round identically; aspect-only densities give NULL
    dpi."""
    from dblp_crawler_spark.operators.sniff import image_density

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_DENSITY_CASES)
    hexstr = F.lit(_DENSITY_CASES[-1])
    for i, hx in enumerate(_DENSITY_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return image_density(imgs).select(
        "doc_id", "fmt", "density_unit", "density_x", "density_y",
        "dpi_x", "dpi_y")


def _thumb_tiff_ii(next_off: int, ifd1_entries: int = 3) -> str:
    body = ("49492A00" + "08000000" + "0100"
            + "0F01" + "0200" + "04000000" + "41424300")
    body += "".join(f"{(next_off >> (8 * i)) & 255:02X}" for i in range(4))
    if next_off:
        body += f"{ifd1_entries:02X}00"
    return body


def _thumb_jpeg(tiff: str) -> str:
    seg_len = 2 + 6 + len(tiff) // 2
    return ("FFD8" + _ES_APP0 + "FFE1" + f"{seg_len:04X}"
            + "457869660000" + tiff)


#: planted IFD1 cases: camera JPEG with thumbnail, stripped JPEG
#: without, BE TIFF with thumbnail, EXIF-less JPEG, PNG.
_THUMB_CASES = [
    _thumb_jpeg(_thumb_tiff_ii(26, ifd1_entries=3)),
    _thumb_jpeg(_thumb_tiff_ii(0)),
    ("4D4D002A" + "00000008" + "0001"
     + "010F" + "0002" + "00000004" + "41424300" + "0000001A" + "0004"),
    "FFD8" + _ES_APP0,
    "89504E470D0A1A0A" + "00" * 8,
]


def q_exif_thumbnail(spark, sf_dir):
    """EXIF IFD1 thumbnail presence (sniff.exif_thumbnail): cameras
    write a thumbnail IFD into every JPEG, exporters and generators
    strip it — a host still serving thumbnails is serving
    camera-original files (and a privacy surface: the thumbnail
    often survives the crop). The next-IFD pointer right after
    IFD0's entries, endian-aware, gated on a sane entry count so
    out-of-window reads NULL-absorb identically in both engines."""
    from dblp_crawler_spark.operators.sniff import exif_thumbnail

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_THUMB_CASES)
    hexstr = F.lit(_THUMB_CASES[-1])
    for i, hx in enumerate(_THUMB_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return exif_thumbnail(imgs).select(
        "doc_id", "fmt", "has_thumbnail", "ifd1_entries")


#: punctuation blob that pushes punct_ratio past the 0.1 quality
#: gate on every synthetic doc length — the planted "worse copy".
_KB_PUNCT = " " + "!" * 80


def q_pipeline_dedup_keep_best(spark, sf_dir):
    """Quality-electing dedup (dedup.keep_best over
    connected_components): in a near-dup cluster keep the BEST
    member, not the numerically smallest — the FineWeb-style
    election min-id drop lists cannot express. Planted clusters pin
    both directions: {clean original, punct-stuffed copy} keeps the
    original, {punct-stuffed ORIGINAL, clean higher-id copy} keeps
    the copy (election provably != min-id). Prefix fingerprints pair
    the planted families; quality is the real composite score, ties
    fall back to min-id."""
    from dblp_crawler_spark.operators.dedup import connected_components, keep_best

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m8 = F.col("doc_id") % 8
    eff = (F.col("doc_id")
           - F.when(m8.isin(1, 5), 1).otherwise(0)).alias("eff")
    base = docs.select(F.col("doc_id").alias("eff_id"),
                       F.col("text").alias("base"))
    planted = (
        docs.select("doc_id", eff)
        .join(base, F.col("eff") == F.col("eff_id"))
        .select(
            "doc_id",
            F.when(m8.isin(1, 4), F.concat(F.col("base"), F.lit(_KB_PUNCT)))
             .otherwise(F.col("base")).alias("text"),
        )
    )
    t = planted.withColumn("fp", F.substring("text", 1, 64))
    a = t.select(F.col("doc_id").alias("a"), F.col("fp"))
    b = t.select(F.col("doc_id").alias("b"), F.col("fp"))
    pairs = a.join(b, "fp").where(F.col("a") < F.col("b")).select("a", "b")
    cc = connected_components(pairs, src="a", dst="b")
    scores = t.select(F.col("doc_id").alias("id"),
                      T.quality_score("text").alias("score"))
    return keep_best(cc, scores).select(
        F.col("id").alias("doc_id"), F.col("keep_id").alias("keep_doc_id"),
        "score", "keep_score")


#: (host_class, rotation) → planted bytes for the provenance rollup:
#: class 0 hosts serve camera-pipeline files (model / thumbnail /
#: 300 dpi), class 1 hosts serve generator output (parameters tEXt /
#: SD Software / EXIF-less), class 2 hosts mix.
def _ip_table() -> dict:
    return {
        (0, 0): _CAM_CASES[0], (0, 1): _THUMB_CASES[0],
        (0, 2): _DENSITY_CASES[0],
        (1, 0): _PNGTXT_CASES[1], (1, 1): _PNGTXT_CASES[2],
        (1, 2): "FFD8" + _ES_APP0,
        (2, 0): _CAM_CASES[0], (2, 1): _PNGTXT_CASES[1],
        (2, 2): _DENSITY_CASES[4],
    }


def q_pipeline_image_provenance(spark, sf_dir):
    """Per-host image provenance scorecard — the integration
    statement over the whole decode-free image tier: EXIF camera
    model + IFD1 thumbnail + physical density say 'camera pipeline',
    PNG tEXt generator signatures say 'synthetic output', and the
    HOST-level mix is the signal (one image proves nothing; a host
    whose images all sign the same way is a farm). Four header reads
    CHAINED on one bytes column (each re-projects its own staging —
    still a single map-side plan, no joins), one hash agg, integer
    majority verdicts. Class-0/1/2 hosts planted archival /
    synthetic / mixed."""
    from dblp_crawler_spark.operators.sniff import (
        exif_camera_model,
        exif_thumbnail,
        image_density,
        png_text_chunk,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    cls = (F.col("doc_id") % 12) % 3
    rot = F.col("doc_id") % 3
    table = _ip_table()
    hexstr = F.lit(table[(2, 2)])
    for (c, i), hx in table.items():
        if (c, i) != (2, 2):
            hexstr = F.when((cls == c) & (rot == i), F.lit(hx)).otherwise(hexstr)
    imgs = docs.select(
        "doc_id",
        F.concat(F.lit("img"), (F.col("doc_id") % 12).cast("string"),
                 F.lit(".example")).alias("host"),
        F.unhex(hexstr).alias("bytes"),
    )
    x = exif_thumbnail(image_density(png_text_chunk(exif_camera_model(imgs))))
    g = x.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.count(F.when(F.col("camera_model").isNotNull(), 1)).alias("n_camera"),
        F.count(F.when(F.col("gen_hint"), 1)).alias("n_gen"),
        F.count(F.when(F.col("dpi_x") >= 300, 1)).alias("n_highdpi"),
        F.count(F.when(F.col("has_thumbnail"), 1)).alias("n_thumb"),
    )
    arch = F.col("n_camera") + F.col("n_thumb") + F.col("n_highdpi")
    verdict = (
        F.when(F.col("n_gen") * 2 >= F.col("n_images"), "synthetic")
        .when(arch * 2 >= F.col("n_images"), "archival")
        .otherwise("mixed")
    )
    return g.withColumn("verdict", verdict)


def q_pipeline_trap_quarantine(spark, sf_dir):
    """Trap quarantine — the admission verdict combining BOTH trap
    detectors: per-URL heuristics (url_trap_flags: calendar paths,
    session params, depth, repeated segments) and the STRUCTURAL
    evidence only pagination list-ranking can see (cycles,
    self-loops, chains past the horizon → chain_trap; resolvable but
    absurdly deep series → deep_pagination). Precedence: structural
    beats heuristic beats depth; everything else admits. Bulk 6-page
    chains admit, the 41-page chain splits into deep_pagination /
    chain_trap at the horizon, calendar and session chains flag
    heuristically."""
    from dblp_crawler_spark.functions.urlnorm import url_trap_flags
    from dblp_crawler_spark.operators.redirects import pagination_chains

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    site = (F.col("doc_id") % 37).cast("string")
    page = F.col("doc_id") % 6
    bulk = docs.filter(page < 5).select(
        F.concat(F.lit("https://s"), site, F.lit(".com/list?page="),
                 page.cast("string")).alias("url"),
        F.concat(F.lit("https://s"), site, F.lit(".com/list?page="),
                 (page + 1).cast("string")).alias("next_url"),
    )
    trap = docs.filter(F.col("doc_id") < 40).select(
        F.concat(F.lit("https://trap.example/p"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("https://trap.example/p"),
                 (F.col("doc_id") + 1).cast("string")).alias("next_url"),
    )
    cyc = docs.filter(F.col("doc_id") < 3).select(
        F.concat(F.lit("https://cyc.example/p"),
                 (F.col("doc_id") % 3).cast("string")).alias("url"),
        F.concat(F.lit("https://cyc.example/p"),
                 ((F.col("doc_id") + 1) % 3).cast("string")).alias("next_url"),
    )

    def _cal(i):
        return F.concat(F.lit("https://cal.example/a/2023/"), i.cast("string"),
                        F.lit("/2024/"), i.cast("string"))

    cal = docs.filter(F.col("doc_id") < 12).select(
        _cal(F.col("doc_id") + 1).alias("url"),
        _cal(F.col("doc_id") + 2).alias("next_url"),
    )
    ses = docs.filter(F.col("doc_id") < 6).select(
        F.concat(F.lit("https://s.example/p?sessionid="),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("https://s.example/p?sessionid="),
                 (F.col("doc_id") + 1).cast("string")).alias("next_url"),
    )
    links = bulk.unionByName(trap).unionByName(cyc) \
                .unionByName(cal).unionByName(ses)
    ch = pagination_chains(links, rounds=5)
    flagged = ch.withColumn("f", url_trap_flags("url")).select(
        "url", "complete", "page_idx", F.col("f.is_trap").alias("is_trap"))
    verdict = (
        F.when(~F.col("complete"), "chain_trap")
        .when(F.col("is_trap"), "heuristic_trap")
        .when(F.col("page_idx") > 20, "deep_pagination")
        .otherwise("admit")
    )
    return flagged.withColumn("verdict", verdict)


_CFA_ENUM = ("daily", "hourly", "monthly", "always",
             "never", "sometimes", "weekly")


def q_changefreq_audit(spark, sf_dir):
    """Declared-vs-observed changefreq audit (recrawl.
    changefreq_audit): sitemap <changefreq> is a claim, the fetch
    log is the measurement — chronic over-declaration ('hourly' on
    yearly pages) is crawl-budget bait a scheduler must not reward.
    Nominal spec intervals vs exact integer observed mean change
    interval with a 2x band, cross-multiplied (no float decides);
    'always' honest only when every revisit changed; junk/never/
    single-fetch/static rows report no_signal. Fetch log derived
    from the events table (event_type as content fingerprint),
    declared enum cycled per URL incl. junk."""
    from dblp_crawler_spark.operators.recrawl import changefreq_audit

    ev = _t(spark, sf_dir, "events")
    url = F.concat(F.lit("https://h"), (F.col("user_id") % 7).cast("string"),
                   F.lit(".org/p"), F.col("user_id").cast("string"))
    log = ev.select(url.alias("url"), "ts",
                    F.col("event_type").alias("fingerprint"))
    cf = F.try_element_at(
        F.array(*[F.lit(x) for x in _CFA_ENUM]),
        (F.col("user_id") % 7 + 1).cast("int"),
    )
    declared = ev.select("user_id").distinct().select(
        url.alias("url"), cf.alias("changefreq"))
    return changefreq_audit(log, declared)


def q_politeness_compliance(spark, sf_dir):
    """Politeness compliance audit (scheduler.politeness_compliance):
    the plan's inverse — the fetch log is ground truth, and
    consecutive same-host gaps under the delay are violations (a
    worker bypassing its window, a retry path skipping the
    scheduler, or two shards on one host — the bug salted pops
    exist to prevent). One per-host lag window + one hash agg, all
    int64 microseconds. Events-derived log, 1000 s delay gives a
    deterministic mix of violating and compliant hosts."""
    from dblp_crawler_spark.operators.scheduler import politeness_compliance

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 11).cast("string"),
                 F.lit(".org")).alias("host"),
        F.concat(F.lit("/e"), F.col("event_id").cast("string")).alias("url"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return politeness_compliance(log, delay_us=1_000_000_000)


def q_dns_churn(spark, sf_dir):
    """DNS churn / fast-flux detection (hostdup.dns_churn): spam
    infrastructure rotates a hostname across botnet IP pools;
    legitimate hosts sit on small stable sets. Distinct-IP count vs
    observation window, churn compared by integer
    cross-multiplication; a planted 8-IP burst host flags against
    the stable bulk."""
    from dblp_crawler_spark.operators.hostdup import dns_churn

    ev = _t(spark, sf_dir, "events")
    bulk = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 9).cast("string"),
                 F.lit(".org")).alias("host"),
        F.concat(F.lit("10.0."), (F.col("user_id") % 2).cast("string"),
                 F.lit("."), (F.col("user_id") % 3).cast("string")).alias("ip"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    flux = ev.filter(F.col("event_id") < 8).select(
        F.lit("flux.example").alias("host"),
        F.concat(F.lit("66.0.0."),
                 F.col("event_id").cast("string")).alias("ip"),
        (F.col("event_id") * 60_000_000).alias("ts_us"),
    )
    return dns_churn(bulk.unionByName(flux))


def q_temperature_mixture(spark, sf_dir):
    """Sqrt temperature mixture (textstats.temperature_mixture):
    the mBERT/XLM-R exponentiated smoothing at alpha = 1/2 —
    proportional sampling lets the head source swamp the tail,
    uniform over-trains tiny sources. alpha fixed at 1/2 because
    sqrt is IEEE correctly-rounded (engine-exact) where pow(n, 0.3)
    is libm-dependent; per-source weights quantize to int64 before
    the normalizer sum so no float addition order exists."""
    from dblp_crawler_spark.operators.textstats import temperature_mixture

    return temperature_mixture(_t(spark, sf_dir, "documents"))


def _sw_app1(value: str, le=True) -> str:
    val = value.encode() + b"\x00"
    cnt = len(val)
    off = 8 + 2 + 12 + 4
    if le:
        ent = "3101" + "0200" + "".join(
            f"{(cnt >> (8 * i)) & 255:02X}" for i in range(4))
        v = "".join(f"{(off >> (8 * i)) & 255:02X}" for i in range(4))
        hdr = "49492A00" + "08000000" + "0100"
    else:
        ent = "0131" + "0002" + f"{cnt:08X}"
        v = f"{off:08X}"
        hdr = "4D4D002A" + "00000008" + "0001"
    payload = ("457869660000" + hdr + ent + v + "00000000"
               + val.hex().upper())
    return "FFD8" + _ES_APP0 + "FFE1" + f"{len(payload) // 2 + 2:04X}" + payload


#: planted Software cases: editor (LE), generator (BE), generator
#: (LE), EXIF-less JPEG, PNG.
_SW_CASES = [
    _sw_app1("Adobe Photoshop 25.0"),
    _sw_app1("Stable Diffusion XL", le=False),
    _sw_app1("ComfyUI"),
    "FFD8" + _ES_APP0,
    "89504E470D0A1A0A" + "00" * 8,
]


def q_exif_software(spark, sf_dir):
    """EXIF Software tag (sniff.exif_software): the JPEG-side
    generator signature — editors and AI pipelines that DO write
    EXIF name themselves in tag 0x0131, matched against the SAME
    fingerprint regex as the PNG tEXt gate so one tool's JPEG and
    PNG output read identically in the host provenance rollup.
    Endian-aware inline-vs-offset ASCII read on the shared EXIF
    staging."""
    from dblp_crawler_spark.operators.sniff import exif_software

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_SW_CASES)
    hexstr = F.lit(_SW_CASES[-1])
    for i, hx in enumerate(_SW_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return exif_software(imgs).select("doc_id", "fmt", "software", "gen_hint")


def q_sitemap_images(spark, sf_dir):
    """Image-sitemap extension (webparse.sitemap_images): the
    publisher's declared image+caption inventory — structured
    captions without fetching a single page, the best discovery
    channel an image+caption crawl has. Blocks-within-blocks regex
    parse (no XML engine), canonicalized URLs, optional fields NULL,
    cross-host declarations flagged not dropped. Every third image
    declared on a CDN host, every second carries a caption."""
    from dblp_crawler_spark.sources.webparse import sitemap_images

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id").cast("string")
    hh = (F.col("doc_id") % 10).cast("string")
    img_host = F.when(F.col("doc_id") % 3 == 0,
                      F.concat(F.lit("https://cdn"), hh, F.lit(".net"))) \
        .otherwise(F.concat(F.lit("https://h"), hh, F.lit(".org")))
    cap = F.when(F.col("doc_id") % 2 == 0,
                 F.concat(F.lit("<image:caption>photo number "), d,
                          F.lit("</image:caption>"))).otherwise(F.lit(""))
    ttl = F.when(F.col("doc_id") % 4 == 0,
                 F.concat(F.lit("<image:title>t"), d,
                          F.lit("</image:title>"))).otherwise(F.lit(""))
    xml = F.concat(
        F.lit("<urlset><url><loc>https://h"), hh, F.lit(".org/g/"), d,
        F.lit("</loc><image:image><image:loc>"), img_host,
        F.lit("/i/"), d, F.lit(".jpg</image:loc>"), cap, ttl,
        F.lit("</image:image>"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("<image:image><image:loc>"), img_host,
                        F.lit("/i/"), d,
                        F.lit("b.jpg</image:loc></image:image>")))
        .otherwise(F.lit("")),
        F.lit("</url></urlset>"),
    )
    pages = docs.select(
        F.concat(F.lit("h"), hh, F.lit(".org")).alias("host"),
        xml.alias("sitemap_xml"))
    return sitemap_images(pages)


def q_sitemap_videos(spark, sf_dir):
    """Video-sitemap extension (webparse.sitemap_videos): the
    publisher's declared video inventory — content/player URL,
    thumbnail, editorial title+description, and duration — the
    richest discovery channel a video-text corpus has, structured
    metadata without fetching a page. content_loc preferred over
    player_loc; durations validated against the spec's [1, 28800]
    band (declared-but-invalid kept flagged, not dropped); CDN-host
    declarations flagged. Planted: every third video player-only,
    every fourth with an out-of-band duration, every fifth with no
    duration at all."""
    from dblp_crawler_spark.sources.webparse import sitemap_videos

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id").cast("string")
    hh = (F.col("doc_id") % 10).cast("string")
    loc = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit("<video:player_loc allow_embed=\"yes\">https://play.ex"),
                 hh, F.lit(".com/e/"), d, F.lit("</video:player_loc>")),
    ).otherwise(
        F.concat(F.lit("<video:content_loc>https://cdn"), hh,
                 F.lit(".net/v/"), d, F.lit(".mp4</video:content_loc>")),
    )
    dur = (
        F.when(F.col("doc_id") % 5 == 0, F.lit(""))
        .when(F.col("doc_id") % 4 == 0,
              F.lit("<video:duration>99999</video:duration>"))
        .otherwise(F.concat(F.lit("<video:duration>"),
                            ((F.col("doc_id") % 600) + 30).cast("string"),
                            F.lit("</video:duration>")))
    )
    xml = F.concat(
        F.lit("<urlset><url><loc>https://h"), hh, F.lit(".org/w/"), d,
        F.lit("</loc><video:video>"), loc,
        F.lit("<video:thumbnail_loc>https://cdn"), hh, F.lit(".net/t/"), d,
        F.lit(".jpg</video:thumbnail_loc><video:title>Clip "), d,
        F.lit("</video:title><video:description>about clip "), d,
        F.lit("</video:description>"), dur,
        F.lit("</video:video></url></urlset>"),
    )
    pages = docs.select(
        F.concat(F.lit("h"), hh, F.lit(".org")).alias("host"),
        xml.alias("sitemap_xml"))
    return sitemap_videos(pages)


def q_outlink_profile(spark, sf_dir):
    """Per-page outlink spray profile (webparse.outlink_profile):
    link-farm texture BEFORE any graph algorithm — hundreds of
    anchors across many unrelated domains, nearly all external,
    vs organic pages linking mostly within their site. Exact
    per-mille external fraction, integer spray gates. Every 11th
    page is a planted 24-domain sprayer."""
    from dblp_crawler_spark.sources.webparse import outlink_profile

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    page = F.concat(F.lit("https://site"), (F.col("doc_id") % 11).cast("string"),
                    F.lit(".org/p"), (F.col("doc_id") % 7).cast("string"))
    spray = F.col("doc_id") % 11 == 0
    k = F.col("doc_id") % 24
    out = F.when(
        spray,
        F.concat(F.lit("https://spam"), F.col("doc_id").cast("string"),
                 F.lit(".net/x")),
    ).otherwise(
        F.when(k < 20,
               F.concat(F.lit("https://site"),
                        (F.col("doc_id") % 11).cast("string"),
                        F.lit(".org/a"), F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("https://ref"), k.cast("string"),
                            F.lit(".org/cite"))))
    return outlink_profile(docs.select(page.alias("url"), out.alias("out_url")))


def q_meta_refresh(spark, sf_dir):
    """Meta-refresh redirects (webparse.meta_refresh): the redirect
    channel that never touches HTTP — parked domains and consent
    walls hop through <meta http-equiv=refresh>, and ignoring it
    records the hop page as content. 0-5 s refreshes are redirects
    (the search-engine rule), longer delays are content; attribute
    order free; targets resolve against the page. Families: instant
    redirect, reversed-attribute 3 s, self-reload, slow refresh,
    refresh-less pages."""
    from dblp_crawler_spark.sources.webparse import meta_refresh

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 5
    html = (
        F.when(m == 0, F.concat(
            F.lit("<html><meta http-equiv='refresh' content='0; url=/n"), d,
            F.lit("'></html>")))
        .when(m == 1, F.concat(
            F.lit("<meta content=\"3;url=https://q.org/t"), d,
            F.lit("\" http-equiv=\"refresh\">")))
        .when(m == 2, F.lit("<meta http-equiv='refresh' content='300'>"))
        .when(m == 3, F.concat(
            F.lit("<meta http-equiv='refresh' content='30; url=slow"), d,
            F.lit(".html'>")))
        .otherwise(F.lit("<html>no refresh</html>"))
    )
    pages = docs.select(
        F.concat(F.lit("https://p"), (F.col("doc_id") % 13).cast("string"),
                 F.lit(".org/x"), d).alias("url"),
        html.alias("html"))
    return meta_refresh(pages)


def q_pipeline_image_discovery(spark, sf_dir):
    """Image+caption discovery plan — the graft cell's core story in
    ONE oracled plan: merge the two discovery channels (declared
    image-sitemap records with structured captions; parsed <img>
    tags with alt-text captions), elect one record per image URL
    preferring the declared channel (richer captions), then gate
    through the full RFC 9309 robots decision before anything is
    scheduled (planted /private images flip to disallowed). Every
    stage is an existing oracled operator; the replay chains the
    same fragments so the composition is verified as a unit."""
    from dblp_crawler_spark.operators.scheduler import robots_decide
    from dblp_crawler_spark.sources.webparse import (
        extract_images,
        sitemap_images,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id").cast("string")
    hh = (F.col("doc_id") % 8).cast("string")
    img = F.concat(
        F.lit("https://h"), hh, F.lit(".org"),
        F.when(F.col("doc_id") % 6 == 0, "/private").otherwise(""),
        F.lit("/i/"), d, F.lit(".jpg"))
    page_url = F.concat(F.lit("https://h"), hh, F.lit(".org/g/"), d)
    html = F.concat(
        F.lit('<img src="'), img, F.lit('" alt="alt text '), d, F.lit('">'),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit('<img src="data:image/png;base64,xx">'))
        .otherwise(F.lit("")))
    pages = docs.select(page_url.alias("url"), html.alias("html"))
    sm = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.concat(F.lit("h"), hh, F.lit(".org")).alias("host"),
        F.concat(
            F.lit("<urlset><url><loc>"), page_url,
            F.lit("</loc><image:image><image:loc>"), img,
            F.lit("</image:loc><image:caption>declared caption "), d,
            F.lit("</image:caption></image:image></url></urlset>"),
        ).alias("sitemap_xml"))
    declared = sitemap_images(sm).select(
        "image_url", "page_url", "caption", F.lit("sitemap").alias("source"))
    parsed = extract_images(pages).select(
        F.col("img_url").alias("image_url"),
        F.col("url").alias("page_url"),
        F.col("alt").alias("caption"),
        F.lit("html").alias("source"))
    cand = declared.unionByName(parsed).distinct()
    w = Window.partitionBy("image_url").orderBy(
        F.desc((F.col("source") == "sitemap").cast("int")),
        F.asc("page_url"),
        F.asc(F.coalesce(F.col("caption"), F.lit(""))),
    )
    best = cand.withColumn("rn", F.row_number().over(w)) \
               .where(F.col("rn") == 1).drop("rn")
    hosts = docs.select(
        F.concat(F.lit("h"), hh, F.lit(".org")).alias("host")).distinct()
    rules = hosts.select(
        "host", F.lit("disallow").alias("rule"),
        F.lit("/private").alias("pattern"))
    adm = robots_decide(best.select(F.col("image_url").alias("url")),
                        rules)
    return best.join(adm, best["image_url"] == adm["url"]).select(
        "image_url", "page_url", "caption", "source", "allowed")


_BL_PATTERNS = [
    ("host_suffix", "bad7.example"),
    ("path_prefix", "s3.org/private"),
    ("substring", "utm_spy"),
    ("host", "s5.org"),
]


def q_url_blocklist(spark, sf_dir):
    """Typed URL deny list (frontier.url_blocklist): the admission
    gate every production crawler carries — legal takedowns, abuse
    domains, opt-outs — matched BEFORE fetching. Four pattern kinds
    (exact host, dot-checked host suffix, host+path prefix, raw
    substring), each its own broadcast-join shape against the tiny
    dim; deterministic precedence election when several match."""
    from dblp_crawler_spark.operators.frontier import url_blocklist

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    host = F.when(F.col("doc_id") % 9 == 0,
                  F.concat(F.lit("sub"), (F.col("doc_id") % 3).cast("string"),
                           F.lit(".bad7.example"))) \
        .otherwise(F.concat(F.lit("s"), (F.col("doc_id") % 8).cast("string"),
                            F.lit(".org")))
    path = F.when(F.col("doc_id") % 7 == 0, "/private/p") \
        .otherwise(F.lit("/p"))
    q = F.when(F.col("doc_id") % 13 == 0, "?utm_spy=1").otherwise(F.lit(""))
    urls = docs.select(
        F.concat(F.lit("https://"), host, path,
                 F.col("doc_id").cast("string"), q).alias("url"))
    pats = spark.createDataFrame(_BL_PATTERNS, "kind string, pattern string")
    return url_blocklist(urls, pats)


def q_text_url_mentions(spark, sf_dir):
    """Plain-text URL citation mining (webparse.text_url_mentions):
    PDFs, READMEs, and forum posts cite URLs without anchors — a
    frontier that only follows <a href> never sees them. Trailing
    prose punctuation stripped (the 'see https://x.org/p.' rule),
    scheme case-folded, canonicalized, mention-counted. Planted
    citations (with prose periods and duplicates) over the document
    bulk."""
    from dblp_crawler_spark.sources.webparse import text_url_mentions

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cite = F.concat(F.lit(" see https://cite"),
                    (F.col("doc_id") % 31).cast("string"),
                    F.lit(".org/p"), (F.col("doc_id") % 17).cast("string"),
                    F.lit("."))
    text = F.when(F.col("doc_id") % 2 == 0, F.concat(F.col("text"), cite))
    text = text.when(F.col("doc_id") % 5 == 1,
                     F.concat(F.col("text"), cite, cite)) \
        .otherwise(F.col("text"))
    return text_url_mentions(docs.select("doc_id", text.alias("text")))


def q_order_divergence(spark, sf_dir):
    """Crawl-order replay divergence (audit.order_divergence): the
    diagnostic behind the determinism contract — when two runs
    disagree, the first diverging sequence number localizes the bug
    and the rows AT it say which side scheduled what. Planted swap
    at seq 100/200 over an otherwise identical order."""
    from dblp_crawler_spark.operators.audit import order_divergence

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 9).cast("string"),
                   F.lit(".org/p"), F.col("doc_id").cast("string"))
    a = docs.select(F.col("doc_id").alias("seq"), url.alias("url"))
    swapped = (
        F.when(F.col("doc_id") == 100, F.lit(200))
        .when(F.col("doc_id") == 200, F.lit(100))
        .otherwise(F.col("doc_id"))
    )
    b_url = F.concat(F.lit("https://h"), (swapped % 9).cast("string"),
                     F.lit(".org/p"), swapped.cast("string"))
    b = docs.select(F.col("doc_id").alias("seq"), b_url.alias("url"))
    return order_divergence(a, b)


def q_byte_budget_admission(spark, sf_dir):
    """Per-host byte-budget admission (budget.byte_budget_admission):
    politeness bounds fetch RATE, bandwidth bounds fetch BYTES — a
    wave planner admitting by count lets one video-heavy host eat
    the wave. Per-host running totals in (priority DESC, url) order;
    the first over-budget item still admits (first-fit — an
    oversized page must not starve its host forever). Declared
    sizes and priorities synthesized from doc_id; budget 200 KB."""
    from dblp_crawler_spark.operators.budget import byte_budget_admission

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    cand = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 13).cast("string"),
                 F.lit(".org")).alias("host"),
        F.concat(F.lit("/p"), F.col("doc_id").cast("string")).alias("url"),
        (F.col("doc_id") * 7 % 101).alias("priority"),
        (F.col("doc_id") * 1717 % 90000 + 10000).alias("bytes_est"),
    )
    return byte_budget_admission(cand, budget_bytes=200_000)


def q_embedding_drift(spark, sf_dir):
    """Snapshot embedding drift (similarity.embedding_drift): when a
    source's embedding distribution moves — redesign, language
    shift, injection — the pipeline should know before the model
    does. Cosine between the two snapshots' mean vectors over
    MILLI-QUANTIZED int64 component sums: cosine is scale-invariant
    so the un-divided integer sums ARE the mean direction, every sum
    is exact, and the only floats are the final sqrt/divide.
    Snapshots = even/odd vec_id halves (offset +0.5 so each label's
    mean has a strong common direction), grouped by label; %7==0
    labels planted with a flipped second half (drift ~2 vs ~0)."""
    from dblp_crawler_spark.operators.similarity import embedding_drift

    emb = _t(spark, sf_dir, "embeddings")
    # +0.5 gives every label's mean a strong common direction, so the
    # unplanted halves agree (cos ~ +1) and the %7==0 flip shows the
    # full reversal (cos ~ -1) instead of hiding in mean-of-random
    # noise (raw synthetic means are near-orthogonal across halves)
    sign = F.when((F.col("label") % 7 == 0) & (F.col("vec_id") % 2 == 1), -1.0) \
        .otherwise(1.0)
    flipped = emb.select(
        "vec_id", "label",
        F.transform(F.col("embedding"),
                    lambda v: (v + F.lit(0.5)) * sign).alias("embedding"))
    a = flipped.filter(F.col("vec_id") % 2 == 0)
    b = flipped.filter(F.col("vec_id") % 2 == 1)
    return embedding_drift(a, b)


def q_seed_distance(spark, sf_dir):
    """Hop distance from the seed hosts (hits.seed_distance): the
    frontier's depth map over the DIRECTED link graph — depth-0/1 is
    the curated neighborhood, depth-5+ chains are where spam lives,
    unreachable hosts don't belong in the frontier. Synchronous
    Bellman-Ford rounds with explicit NULL-aware min (engines
    disagree on LEAST's NULL rule), localCheckpoint + Observation;
    unrolled CTE replay. Circulant bulk + a planted far chain
    hanging off the bulk; seeds h0 and h5."""
    from dblp_crawler_spark.operators.hits import seed_distance

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    bulk = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 19).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("doc_id") * 5 + 2) % 19).cast("string")).alias("dst"),
    )
    chain = docs.filter(F.col("doc_id") < 6).select(
        F.when(F.col("doc_id") == 0, F.lit("h2")).otherwise(
            F.concat(F.lit("far"), (F.col("doc_id") - 1).cast("string")))
        .alias("src"),
        F.concat(F.lit("far"), F.col("doc_id").cast("string")).alias("dst"),
    )
    seeds = spark.createDataFrame([("h0",), ("h5",)], "id string")
    return seed_distance(bulk.unionByName(chain), seeds, rounds=12)


def q_og_image_caption(spark, sf_dir):
    """OpenGraph image+caption extraction (webparse.
    og_image_caption): the third discovery channel and often the
    richest — og:image/og:image:alt/og:description are EDITORIAL
    choices, the page's own statement of its representative image
    and text. Quote-delimited property match (og:image never matches
    og:image:alt), property=/name= in any attribute order, first
    occurrence wins, image resolved against the page. Families:
    full tag set, name= + reversed attrs, relative images, og-less
    pages."""
    from dblp_crawler_spark.sources.webparse import og_image_caption

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    html = (
        F.when(m == 0, F.concat(
            F.lit('<meta property="og:title" content="Post '), d,
            F.lit('"><meta property="og:image" content="/img/'), d,
            F.lit('.jpg"><meta property="og:image:alt" content="hero '), d,
            F.lit('"><meta property="og:description" content="about '), d,
            F.lit('">')))
        .when(m == 1, F.concat(
            F.lit("<meta content='https://cdn.example/"), d,
            F.lit(".png' name='og:image'>")))
        .when(m == 2, F.concat(
            F.lit('<meta property="og:image" content="first'), d,
            F.lit('.jpg"><meta property="og:image" content="second.jpg">')))
        .otherwise(F.lit("<html>no og tags</html>"))
    )
    pages = docs.select(
        F.concat(F.lit("https://o"), (F.col("doc_id") % 9).cast("string"),
                 F.lit(".org/p"), d).alias("url"),
        html.alias("html"))
    return og_image_caption(pages)


def q_pipeline_multilingual_budget(spark, sf_dir):
    """Multilingual token-budget allocation — tokenizer_fertility ×
    sqrt temperature_mixture composed on the language key: the
    smoothed sampling share converts a total token budget into
    per-language token allocations, and the fertility table says
    what those tokens cost in chars. budget_tokens =
    floor(temp_share * 10^6) (floor of an already-rounded share —
    deterministic in both engines)."""
    from dblp_crawler_spark.operators.textstats import (
        temperature_mixture,
        tokenizer_fertility,
    )

    docs = _t(spark, sf_dir, "documents")
    fert = tokenizer_fertility(docs)
    mix = temperature_mixture(docs, source_col="lang") \
        .withColumnRenamed("source", "lang")
    j = fert.join(mix.select("lang", "temp_share", "boost"), "lang")
    return j.select(
        "lang", "n_docs", "n_bpe_tokens", "chars_per_bpe_token",
        "temp_share", "boost",
        F.floor(F.col("temp_share") * 1_000_000).cast("long")
        .alias("budget_tokens"),
    )


def _pe_chunk(ctype: bytes, data: bytes) -> str:
    return (f"{len(data):08X}" + ctype.hex().upper()
            + data.hex().upper() + "00000000")


def _pe_tiff_ii(orientation: int) -> bytes:
    ent = (bytes.fromhex("1201") + bytes.fromhex("0300")
           + (1).to_bytes(4, "little")
           + orientation.to_bytes(2, "little") + b"\x00\x00")
    return (b"II*\x00" + (8).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + ent + b"\x00\x00\x00\x00")


def _pe_tiff_mm(orientation: int) -> bytes:
    ent = (bytes.fromhex("0112") + bytes.fromhex("0003")
           + (1).to_bytes(4, "big")
           + orientation.to_bytes(2, "big") + b"\x00\x00")
    return (b"MM\x00*" + (8).to_bytes(4, "big")
            + (1).to_bytes(2, "big") + ent + b"\x00\x00\x00\x00")


#: planted eXIf cases: LE o6 (transposing), BE o8, LE o1 behind a
#: gAMA hop, eXIf-less PNG, JPEG.
_PE_IHDR = _pe_chunk(
    b"IHDR", bytes.fromhex("0000001000000010") + bytes([8, 6, 0, 0, 0]))
_PE_CASES = [
    _PNG_SIG + _PE_IHDR + _pe_chunk(b"eXIf", _pe_tiff_ii(6))
    + _pe_chunk(b"IDAT", b"\x00"),
    _PNG_SIG + _PE_IHDR + _pe_chunk(b"eXIf", _pe_tiff_mm(8))
    + _pe_chunk(b"IDAT", b"\x00"),
    _PNG_SIG + _PE_IHDR + _pe_chunk(b"gAMA", (45455).to_bytes(4, "big"))
    + _pe_chunk(b"eXIf", _pe_tiff_ii(1)) + _pe_chunk(b"IDAT", b"\x00"),
    _PNG_SIG + _PE_IHDR + _pe_chunk(b"IDAT", b"\x00"),
    "FFD8" + _ES_APP0,
]


def q_png_exif_orientation(spark, sf_dir):
    """EXIF inside PNG (sniff.png_exif_orientation): the PNG 1.5
    eXIf chunk is a raw TIFF blob — iPhone screenshots and modern
    exporters write it, and a provenance pass reading only JPEG APP1
    calls those PNGs metadata-free. Chunk walk parked at IDAT/IEND,
    then the same endian-aware TIFF staging and orientation scan as
    the JPEG path anchored at the chunk data; orientations 5-8
    transpose."""
    from dblp_crawler_spark.operators.sniff import png_exif_orientation

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % len(_PE_CASES)
    hexstr = F.lit(_PE_CASES[-1])
    for i, hx in enumerate(_PE_CASES[:-1]):
        hexstr = F.when(m == i, F.lit(hx)).otherwise(hexstr)
    imgs = docs.select("doc_id", F.unhex(hexstr).alias("bytes"))
    return png_exif_orientation(imgs).select(
        "doc_id", "fmt", "orientation", "swap_dims")


#: planted invisible payloads, built from codepoints (never typed)
_INV_ZW = "".join(chr(c) for c in (0x200B, 0x200D, 0x2060))
_INV_BIDI = chr(0x202E) + "gpj.exe" + chr(0x202C)


def q_invisible_chars(spark, sf_dir):
    """Invisible/bidi-control hygiene (textstats.invisible_chars):
    zero-width and bidi codepoints are the web's invisible ink —
    hidden watermarks, RLO-spoofed filenames, prompt-injection
    payloads that survive every visual review. Two classes rendered
    from one codepoint table into both engines, counted per doc,
    plus the cleaned text column. Every 6th doc planted with
    zero-width splices, every 11th with an RLO spoof."""
    from dblp_crawler_spark.operators.textstats import invisible_chars

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m = F.col("doc_id")
    text = (
        F.when(m % 6 == 0, F.concat(F.lit("wm" + _INV_ZW), F.col("text")))
        .when(m % 11 == 1, F.concat(F.col("text"), F.lit(" file" + _INV_BIDI)))
        .otherwise(F.col("text"))
    )
    return invisible_chars(docs.select("doc_id", text.alias("text")))


def q_caption_diversity(spark, sf_dir):
    """Per-host caption diversity (webparse.caption_diversity):
    generated galleries share caption TEMPLATES — the host-level
    caption distribution is the stock-farm smell per-image gates
    can't see. Case-folded trimmed captions; NULL/empty counted as
    uncaptioned, not template evidence. Every 5th host planted as a
    single-template farm against organic per-image captions."""
    from dblp_crawler_spark.sources.webparse import caption_diversity

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    hh = F.col("doc_id") % 15
    farm = hh % 5 == 0
    cap = (
        F.when(farm & (F.col("doc_id") % 7 != 3),
               F.lit("Beautiful Sunset Wallpaper HD"))
        .when(farm, F.lit("beautiful sunset wallpaper hd "))
        .when(F.col("doc_id") % 9 == 4, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("photo number "),
                            F.col("doc_id").cast("string")))
    )
    imgs = docs.select(
        F.concat(F.lit("cap"), hh.cast("string"), F.lit(".example"))
        .alias("host"),
        cap.alias("caption"))
    return caption_diversity(imgs)


def q_pipeline_corpus_release(spark, sf_dir):
    """The text-side release pipeline in ONE oracled plan — the
    curation sequence a corpus actually ships through: hygiene gates
    (mojibake signatures, invisible/bidi characters, minimum
    tokens) → exact dedup (md5, min-id representative) → seeded
    deterministic shuffle (the portable permutation that breaks
    source/time locality) → token-budget shard packing IN SHUFFLE
    ORDER via the two-pass distributed prefix sum. Planted families:
    every 13th doc carries double-decode residue (gated), the next a
    zero-width splice (gated), m13==5 duplicates its clean
    predecessor (deduped). Every stage is an existing oracled
    operator; the replay chains the same fragments."""
    from dblp_crawler_spark.operators.textstats import (
        invisible_chars,
        mojibake_stats,
        pack_shards,
        seeded_shuffle,
        token_count,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m13 = F.col("doc_id") % 13
    eff = (F.col("doc_id") - F.when(m13 == 5, 1).otherwise(0)).alias("eff")
    base = docs.select(F.col("doc_id").alias("eff_id"),
                       F.col("text").alias("base"))
    src = (
        docs.select("doc_id", eff)
        .join(base, F.col("eff") == F.col("eff_id"))
        .select(
            "doc_id",
            F.when(m13 == 0, F.concat(F.col("base"),
                                      F.lit(" " + _MOJI_RESIDUE)))
            .when(m13 == 1, F.concat(F.lit(_INV_ZW), F.col("base")))
            .otherwise(F.col("base")).alias("text"),
        )
    )
    mj = mojibake_stats(src).select("doc_id", "mojibake_flag")
    iv = invisible_chars(src).select("doc_id", "has_invisible")
    gated = (
        src.join(mj, "doc_id").join(iv, "doc_id")
        .where(~F.col("mojibake_flag") & ~F.col("has_invisible")
               & (token_count("text") >= 10))
        .select("doc_id", "text")
    )
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))) \
        .orderBy("doc_id")
    kept = gated.withColumn("rn", F.row_number().over(w)) \
        .where(F.col("rn") == 1).drop("rn")
    ranked = kept.join(seeded_shuffle(kept, seed=17), "doc_id")
    packed = pack_shards(ranked.select("epoch_rank", "text"),
                         shard_tokens=2000, id_col="epoch_rank")
    return (
        ranked.select("doc_id", "epoch_rank")
        .join(packed, "epoch_rank")
        .select("doc_id", "epoch_rank", "n_tokens", "shard")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pushdown_year_filter": q_pushdown_year_filter,
        "keyword_cnf_filter": q_keyword_cnf_filter,
        "keyword_weak_filter": q_keyword_weak_filter,
        "canonical_title_hash": q_canonical_title_hash,
        "url2doi": q_url2doi,
        "journal_key_prefix": q_journal_key_prefix,
        "dim_broadcast_lookup": q_dim_broadcast_lookup,
        "frontier_antijoin": q_frontier_antijoin,
        "frontier_expand_join": q_frontier_expand_join,
        "pair_cooccurrence": q_pair_cooccurrence,
        "degree_threshold": q_degree_threshold,
        "politeness_window": q_politeness_window,
        "priority_pop": q_priority_pop,
        "seen_set_union": q_seen_set_union,
        "metrics_rollup": q_metrics_rollup,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_containment": q_dedup_containment,
        "dedup_editdist": q_dedup_editdist,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_minhash_lsh_fast": q_dedup_minhash_lsh_fast,
        "dedup_simhash_fast": q_dedup_simhash_fast,
        "dedup_simhash_capped": q_dedup_simhash_capped,
        "dedup_simhash_overflow": q_dedup_simhash_overflow,
        "dedup_minhash_capped": q_dedup_minhash_capped,
        "dedup_minhash_overflow": q_dedup_minhash_overflow,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_planted": q_embedding_near_dup_planted,
        "semdedup_drop_list": q_semdedup_drop_list,
        "semdedup_auto": q_semdedup_auto,
        "dedup_components": q_dedup_components,
        "dedup_drop_list": q_dedup_drop_list,
        "dedup_substring_spans": q_dedup_substring_spans,
        "decontaminate": q_decontaminate,
        "text_repetition": q_text_repetition,
        "text_top_ngrams": q_text_top_ngrams,
        "pipeline_curation": q_pipeline_curation,
        "ann_cosine_topk": q_ann_cosine_topk,
        "contrastive_hard_negatives": q_contrastive_hard_negatives,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_pq_adc": q_ann_pq_adc,
        "text_token_count": q_text_token_count,
        "text_bpe_tokens": q_text_bpe_tokens,
        "text_quality": q_text_quality,
        "pipeline_source_cap": q_pipeline_source_cap,
        "pipeline_pack_shards": q_pipeline_pack_shards,
        "text_lang_id": q_text_lang_id,
        "gopher_quality_rules": q_gopher_quality_rules,
        "recrawl_schedule": q_recrawl_schedule,
        "snapshot_diff": q_snapshot_diff,
        "fetch_backoff": q_fetch_backoff,
        "table_profile": q_table_profile,
        "corpus_drift": q_corpus_drift,
        "alias_collapse": q_alias_collapse,
        "fairness_gini": q_fairness_gini,
        "pii_redaction": q_pii_redaction,
        "tfidf_top_terms": q_tfidf_top_terms,
        "content_sniff": q_content_sniff,
        "length_quantiles": q_length_quantiles,
        "sketch_quantiles": q_sketch_quantiles,
        "inverted_index": q_inverted_index,
        "index_delta_update": q_index_delta_update,
        "index_search_and": q_index_search_and,
        "index_search_bm25": q_index_search_bm25,
        "hash_split": q_hash_split,
        "split_leakage_free": q_split_leakage_free,
        "classifier_calibration": q_classifier_calibration,
        "cdc_chunking": q_cdc_chunking,
        "bpe_train": q_bpe_train,
        "bpe_encode": q_bpe_encode,
        "corpus_mix": q_corpus_mix,
        "doc_chunk_overlap": q_doc_chunk_overlap,
        "mixture_sample": q_mixture_sample,
        "corpus_shuffle": q_corpus_shuffle,
        "url_canonicalize": q_url_canonicalize,
        "frontier_pagerank": q_frontier_pagerank,
        "link_hits": q_link_hits,
        "link_trustrank": q_link_trustrank,
        "host_pagerank": q_host_pagerank,
        "anchor_text_agg": q_anchor_text_agg,
        "host_budget_alloc": q_host_budget_alloc,
        "robots_parse": q_robots_parse,
        "robots_decide": q_robots_decide,
        "host_shard_assign": q_host_shard_assign,
        "html_meta_directives": q_html_meta_directives,
        "cache_policy": q_cache_policy,
        "adaptive_crawl_delay": q_adaptive_crawl_delay,
        "dsir_importance": q_dsir_importance,
        "mixture_interleave": q_mixture_interleave,
        "warc_cdx_layout": q_warc_cdx_layout,
        "warc_revisit_dedup": q_warc_revisit_dedup,
        "dataset_fingerprint": q_dataset_fingerprint,
        "exif_orientation": q_exif_orientation,
        "frontier_aging": q_frontier_aging,
        "jpeg_quality_estimate": q_jpeg_quality,
        "url_template_cap": q_url_template_cap,
        "minhash_delta_dedup": q_minhash_delta_dedup,
        "charset_detect": q_charset_detect,
        "politeness_timeline": q_politeness_timeline,
        "politeness_timeline_parallel": q_politeness_timeline_parallel,
        "script_profile": q_script_profile,
        "robots_availability": q_robots_availability,
        "registrable_domain": q_registrable_domain,
        "index_search_phrase": q_index_search_phrase,
        "jpeg_structure": q_jpeg_structure,
        "image_bomb_gate": q_image_bomb_gate,
        "sitemap_scheduling_hints": q_sitemap_scheduling_hints,
        "ann_binary_hamming": q_ann_binary_hamming,
        "png_structure": q_png_structure,
        "webp_structure": q_webp_structure,
        "gif_structure": q_gif_structure,
        "exif_datetime": q_exif_datetime,
        "soft404_detect": q_soft404_detect,
        "mirror_hosts": q_mirror_hosts,
        "isobmff_structure": q_isobmff_structure,
        "url_resolve": q_url_resolve,
        "extract_outlinks": q_extract_outlinks,
        "extract_images": q_extract_images,
        "figure_captions": q_figure_captions,
        "caption_election": q_caption_election,
        "html_tables": q_html_tables,
        "feed_enclosures": q_feed_enclosures,
        "table_markdown": q_table_markdown,
        "code_blocks": q_code_blocks,
        "data_uri_images": q_data_uri_images,
        "lazyload_images": q_lazyload_images,
        "image_role": q_image_role,
        "pdf_structure": q_pdf_structure,
        "gzip_structure": q_gzip_structure,
        "wav_structure": q_wav_structure,
        "mp3_structure": q_mp3_structure,
        "id3_text_frames": q_id3_text_frames,
        "pipeline_audio_admission": q_pipeline_audio_admission,
        "pipeline_caption_release": q_pipeline_caption_release,
        "tar_structure": q_tar_structure,
        "zstd_structure": q_zstd_structure,
        "zip_structure": q_zip_structure,
        "parquet_structure": q_parquet_structure,
        "webdataset_manifest": q_webdataset_manifest,
        "pipeline_image_harvest": q_pipeline_image_harvest,
        "host_language_profile": q_host_language_profile,
        "hreflang_alternates": q_hreflang_alternates,
        "pipeline_frontier_plan": q_pipeline_frontier_plan,
        "caption_locale_gate": q_caption_locale_gate,
        "zorder_key": q_zorder_key,
        "zorder_file_stats": q_zorder_file_stats,
        "url_locale_hint": q_url_locale_hint,
        "embedding_quality": q_embedding_quality,
        "pipeline_warc_to_corpus": q_pipeline_warc_to_corpus,
        "sitemap_discover": q_sitemap_discover,
        "sitemap_index_expand": q_sitemap_index_expand,
        "fetch_plan": q_fetch_plan,
        "robots_sitemap_lines": q_robots_sitemap_lines,
        "warc_parse": q_warc_parse,
        "image_header_dims": q_image_header_dims,
        "line_dedup": q_line_dedup,
        "redirect_resolve": q_redirect_resolve,
        "url_trap_filter": q_url_trap_filter,
        "frontier_admission": q_frontier_admission,
        "video_scene_cuts": q_video_scene_cuts,
        "webvtt_cues": q_webvtt_cues,
        "pipeline_video_text": q_pipeline_video_text,
        "srt_cues": q_srt_cues,
        "jsonld_image_license": q_jsonld_image_license,
        "hls_segments": q_hls_segments,
        "hls_playlist": q_hls_playlist,
        "hls_variants": q_hls_variants,
        "pipeline_av_discovery": q_pipeline_av_discovery,
        "hls_media_renditions": q_hls_media_renditions,
        "pipeline_subtitle_harvest": q_pipeline_subtitle_harvest,
        "html_text_extract": q_html_text_extract,
        "lm_bits_score": q_lm_bits_score,
        "text_classifier_gate": q_text_classifier_gate,
        "text_fingerprint": q_text_fingerprint,
        "events_windowed_agg": q_events_windowed_agg,
        "events_sessionization": q_events_sessionization,
        "events_asof_attribution": q_events_asof_attribution,
        "events_range_join": q_events_range_join,
        "events_hypertable_rollup": q_events_hypertable_rollup,
        "sketch_distinct_users": q_sketch_distinct_users,
        "sketch_heavy_hitters": q_sketch_heavy_hitters,
        "multimodal_features": q_multimodal_features,
        "image_phash_dedup": q_image_phash_dedup,
        "dedup_hamming_pigeonhole": q_dedup_hamming_pigeonhole,
        "image_phash_components": q_image_phash_components,
        "split_leakage_images": q_split_leakage_images,
        "joint_dedup_clusters": q_joint_dedup_clusters,
        "image_linear_gate": q_image_linear_gate,
        "image_batch_assembly": q_image_batch_assembly,
        "image_aspect_bucket": q_image_aspect_bucket,
        "clip_align_gate": q_clip_align_gate,
        "caption_dedup_best": q_caption_dedup_best,
        "crossmodal_recall": q_crossmodal_recall,
        "pipeline_image_caption": q_pipeline_image_caption,
        "video_frame_sample": q_video_frame_sample,
        "audio_features": q_audio_features,
        "ip_politeness": q_ip_politeness,
        "caption_quality": q_caption_quality,
        "pmi_collocations": q_pmi_collocations,
        "stratified_sample": q_stratified_sample,
        "code_detect": q_code_detect,
        "exif_gps": q_exif_gps,
        "events_funnel": q_events_funnel,
        "events_retention": q_events_retention,
        "link_reciprocity": q_link_reciprocity,
        "sitemap_coverage": q_sitemap_coverage,
        "zipf_slope": q_zipf_slope,
        "svg_structure": q_svg_structure,
        "ico_structure": q_ico_structure,
        "jpeg_colorspace": q_jpeg_colorspace,
        "tiff_structure": q_tiff_structure,
        "png_animated": q_png_animated,
        "payload_complete": q_payload_complete,
        "pipeline_payload_admission": q_pipeline_payload_admission,
        "icc_profile": q_icc_profile,
        "webp_animation": q_webp_animation,
        "exif_strip": q_exif_strip,
        "xmp_license": q_xmp_license,
        "exif_camera_model": q_exif_camera_model,
        "feed_entries": q_feed_entries,
        "cloaking_detect": q_cloaking_detect,
        "url_param_significance": q_url_param_significance,
        "x_robots_tag": q_x_robots_tag,
        "retry_after": q_retry_after,
        "pipeline_header_policy": q_pipeline_header_policy,
        "hreflang_reciprocity": q_hreflang_reciprocity,
        "range_reassembly": q_range_reassembly,
        "revalidation_headers": q_revalidation_headers,
        "strip_boilerplate": q_strip_boilerplate,
        "pipeline_host_scorecard": q_pipeline_host_scorecard,
        "interleaved_segments": q_interleaved_segments,
        "pipeline_reputation_budget": q_pipeline_reputation_budget,
        "percent_normalize": q_percent_normalize,
        "sitemap_scope_check": q_sitemap_scope_check,
        "triangle_counts": q_triangle_counts,
        "events_transitions": q_events_transitions,
        "idn_homograph": q_idn_homograph,
        "homograph_pairs": q_homograph_pairs,
        "pipeline_recrawl_plan": q_pipeline_recrawl_plan,
        "host_kcore": q_host_kcore,
        "png_text_provenance": q_png_text_provenance,
        "mojibake_gate": q_mojibake_gate,
        "pagination_chains": q_pagination_chains,
        "robots_drift": q_robots_drift,
        "parallel_corpus_mine": q_parallel_corpus_mine,
        "variant_preference": q_variant_preference,
        "tokenizer_fertility": q_tokenizer_fertility,
        "image_density": q_image_density,
        "exif_thumbnail": q_exif_thumbnail,
        "pipeline_dedup_keep_best": q_pipeline_dedup_keep_best,
        "pipeline_image_provenance": q_pipeline_image_provenance,
        "pipeline_trap_quarantine": q_pipeline_trap_quarantine,
        "changefreq_audit": q_changefreq_audit,
        "politeness_compliance": q_politeness_compliance,
        "dns_churn": q_dns_churn,
        "temperature_mixture": q_temperature_mixture,
        "exif_software": q_exif_software,
        "sitemap_images": q_sitemap_images,
        "sitemap_videos": q_sitemap_videos,
        "outlink_profile": q_outlink_profile,
        "meta_refresh": q_meta_refresh,
        "pipeline_image_discovery": q_pipeline_image_discovery,
        "url_blocklist": q_url_blocklist,
        "text_url_mentions": q_text_url_mentions,
        "order_divergence": q_order_divergence,
        "byte_budget_admission": q_byte_budget_admission,
        "embedding_drift": q_embedding_drift,
        "seed_distance": q_seed_distance,
        "og_image_caption": q_og_image_caption,
        "pipeline_multilingual_budget": q_pipeline_multilingual_budget,
        "png_exif_orientation": q_png_exif_orientation,
        "invisible_chars": q_invisible_chars,
        "caption_diversity": q_caption_diversity,
        "pipeline_corpus_release": q_pipeline_corpus_release,
    }


# --------------------------------------------------------------------------
_TOK = "regexp_extract_all(lower(text), '[0-9a-z_]+')"


def _portable_hash_oracles() -> dict[str, str]:
    """DuckDB replays of the portable-hash-family entries.

    These oracles reproduce the ENTIRE operator pipelines — minhash
    signatures/bands/verify, simhash lane votes, the rolling
    fingerprint fold, HLL registers+estimate, CMS counters+query —
    because `functions.hashing.hash60` (md5-derived 60-bit) is
    computable bit-identically in any engine with md5. The SQL is
    generated, not hand-written, so lane/band counts stay in lockstep
    with the Spark entries' parameters."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    # tokenize() (functions/text.py): DISTINCT tokens, wide char class
    tok_distinct = "list_distinct(regexp_extract_all(lower(text), '[0-9a-z_À-￿]+'))"
    # dedup.shingles(): distinct word 3-grams over _TOK with multiplicity
    shingle = f"""
        SELECT doc_id,
          CASE WHEN len(tk) >= 3 THEN
            list_distinct(list_transform(range(1, len(tk) - 1),
              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
          ELSE [array_to_string(tk, ' ')] END AS sh
        FROM (SELECT doc_id, {_TOK} AS tk FROM documents)
    """

    # ---- minhash+lsh: 32 lanes, 8 bands of 4, jaccard >= 0.2 ----
    n_hashes, bands, thr = 32, 8, 0.2
    per = n_hashes // bands
    mins = ",\n                ".join(f"MIN({H('s', i)}) AS h{i}" for i in range(n_hashes))
    band_rows = "\n              UNION ALL\n              ".join(
        "SELECT doc_id, {b} AS band, {bh} AS band_hash FROM sig".format(
            b=b,
            bh=H(" || ',' || ".join(f"h{i}::VARCHAR" for i in range(b * per, (b + 1) * per))),
        )
        for b in range(bands)
    )
    minhash_cte = f"""
        WITH sh AS ({shingle}),
        hsh AS (SELECT doc_id, list_transform(sh, t -> {H('t')}) AS hs, len(sh) AS n FROM sh),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
        bandt AS ({band_rows})"""
    minhash_verify = f"""
        SELECT c.a, c.b,
               len(list_intersect(ha.hs, hb.hs))::DOUBLE /
               (ha.n + hb.n - len(list_intersect(ha.hs, hb.hs))) AS jaccard
        FROM cand c JOIN hsh ha ON c.a = ha.doc_id JOIN hsh hb ON c.b = hb.doc_id
        WHERE len(list_intersect(ha.hs, hb.hs))::DOUBLE /
              (ha.n + hb.n - len(list_intersect(ha.hs, hb.hs))) >= {thr}
    """
    minhash_sql = minhash_cte + """,
        cand AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bandt x JOIN bandt y
            ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
        )""" + minhash_verify
    # capped variant: same signatures/banding, buckets over the cap
    # excluded from candidate expansion; overflow = the skipped buckets
    mcap = MINHASH_BUCKET_CAP
    minhash_capped_sql = minhash_cte + f""",
        bksz AS (
          SELECT band, band_hash, COUNT(*) AS n FROM bandt GROUP BY band, band_hash
        ), bkeep AS (
          SELECT b.doc_id, b.band, b.band_hash
          FROM bandt b JOIN bksz s
            ON b.band = s.band AND b.band_hash = s.band_hash AND s.n <= {mcap}
        ), cand AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bkeep x JOIN bkeep y
            ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
        )""" + minhash_verify
    minhash_overflow_sql = minhash_cte + f"""
        SELECT band, band_hash, COUNT(*) AS n_docs FROM bandt
        GROUP BY band, band_hash HAVING COUNT(*) > {mcap}
    """

    # ---- simhash: 60 lanes, prefix-block 8 bits, hamming <= 8 ----
    bits, prefix_bits, max_ham = 60, 8, 8
    lanes = ",\n              ".join(
        f"SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}" for b in range(bits)
    )
    packed = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)" for b in range(bits)
    )
    simhash_cte = f"""
        WITH tk AS (
          SELECT doc_id, unnest({tok_distinct}) AS t FROM documents
        ), hh AS (
          SELECT doc_id, {H('t')} AS h FROM tk
        ), votes AS (
          SELECT doc_id, {lanes} FROM hh GROUP BY doc_id
        ), sim AS (
          SELECT d.doc_id, COALESCE({packed}, 0) AS sh
          FROM documents d LEFT JOIN votes v ON d.doc_id = v.doc_id
        ), blocked AS (
          SELECT doc_id, sh, sh // {1 << (bits - prefix_bits)} AS block FROM sim
        )"""
    simhash_sql = simhash_cte + f"""
        SELECT x.doc_id AS a, y.doc_id AS b, bit_count(xor(x.sh, y.sh)) AS hamming
        FROM blocked x JOIN blocked y ON x.block = y.block AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.sh, y.sh)) <= {max_ham}
    """
    # capped variant: same fingerprints/blocking, blocks over the cap
    # excluded from pair expansion (skip-and-flag guard); overflow =
    # exactly the skipped blocks
    cap = SIMHASH_BLOCK_CAP
    simhash_capped_sql = simhash_cte + f""", bsz AS (
          SELECT block, COUNT(*) AS n FROM blocked GROUP BY block
        ), keep AS (
          SELECT b.doc_id, b.sh, b.block
          FROM blocked b JOIN bsz s ON b.block = s.block AND s.n <= {cap}
        )
        SELECT x.doc_id AS a, y.doc_id AS b, bit_count(xor(x.sh, y.sh)) AS hamming
        FROM keep x JOIN keep y ON x.block = y.block AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.sh, y.sh)) <= {max_ham}
    """
    simhash_overflow_sql = simhash_cte + f"""
        SELECT block, COUNT(*) AS n_docs FROM blocked
        GROUP BY block HAVING COUNT(*) > {cap}
    """

    # ---- rolling fingerprint: (acc*31 + h%M) % M over ordered tokens ----
    fp_sql = f"""
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform({_TOK}, t -> {H('t')} % 2147483647)),
            (a, b) -> (a * 31 + b) % 2147483647) AS fingerprint
        FROM documents
    """

    # ---- HLL: p=12 registers over hash60, exact scaled harmonic sum ----
    p, hb = 12, 60
    m, k = 1 << p, hb - p  # 4096 registers, 48-bit rho field
    alpha_mm = repr(0.7213 / (1.0 + 1.079 / m) * m * m)
    hll_sql = f"""
        WITH regs AS (
          SELECT event_type,
                 CAST(h // {1 << k} AS INT) AS register,
                 h % {1 << k} AS r
          FROM (SELECT event_type, {H('user_id')} AS h FROM events)
        ), sk AS (
          SELECT event_type, register,
                 MAX(CASE WHEN r = 0 THEN {k + 1} ELSE {k + 1} - length(bin(r)) END) AS rho
          FROM regs GROUP BY event_type, register
        ), agg AS (
          SELECT event_type,
                 CAST(SUM(CAST(pow(2, {k + 1} - rho) AS HUGEINT)) AS DOUBLE) / {float(1 << (k + 1))!r} AS inv_sum,
                 COUNT(*) AS present
          FROM sk GROUP BY event_type
        )
        SELECT event_type,
          CAST(ROUND(CASE WHEN {alpha_mm} / (inv_sum + ({m} - present)) <= {2.5 * m!r}
                           AND {m} - present > 0
                     THEN {float(m)!r} * ln({float(m)!r} / ({m} - present))
                     ELSE {alpha_mm} / (inv_sum + ({m} - present)) END) AS BIGINT) AS n_distinct_est
        FROM agg
    """

    # ---- CMS: d=4 rows x w=4096 slots, min-over-rows query, top 10 ----
    # slot seed is the row index i (a column, not a literal), so the
    # hash60 seeded form is inlined here instead of using H(expr, seed)
    d, w = 4, 1 << 12
    slot = ("CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR) || chr(31) || i::VARCHAR), 1, 15)) "
            f"AS BIGINT) % {w}")
    cms_sql = f"""
        WITH cnts AS (
          SELECT i, {slot} AS slot, COUNT(*) AS cnt
          FROM events, range({d}) r(i) GROUP BY 1, 2
        ), probes AS (
          SELECT DISTINCT user_id, i, {slot} AS slot
          FROM events, range({d}) r(i)
        )
        SELECT p.user_id, MIN(c.cnt) AS cnt_est
        FROM probes p JOIN cnts c ON p.i = c.i AND p.slot = c.slot
        GROUP BY p.user_id
        ORDER BY cnt_est DESC, p.user_id ASC LIMIT 10
    """

    # ---- ANN LSH: quantized signatures make the candidate set exact ----
    # 8 tables x 6 planes, multiprobe hamming-1, cosine re-rank top-10.
    # The fixed-point integer signatures (operators/similarity.py,
    # lsh_signature_quantized) are engine-portable, so DuckDB replays
    # the EXACT candidate set; the re-rank reuses the proven
    # list_cosine_similarity equivalence from ann_cosine_topk.
    from dblp_crawler_spark.operators.similarity import LSH_QUANT_SCALE, _iplanes, _planes

    n_planes, n_tables, seed = 6, 8, 42
    def bucket_expr(iplanes):
        terms = []
        for j, row in enumerate(iplanes):
            plist = "[" + ",".join(f"{p}.0" for p in row) + "]::DOUBLE[]"
            terms.append(f"(CASE WHEN list_dot_product(v, {plist}) > 0 THEN {1 << j} ELSE 0 END)")
        return "CAST(" + " + ".join(terms) + " AS BIGINT)"

    sig_rows = "\n          UNION ALL\n          ".join(
        f"SELECT vec_id, {t} AS tbl, {bucket_expr(_iplanes(_planes(64, n_planes, seed + t)))} AS bucket FROM base"
        for t in range(n_tables)
    )
    masks = "[" + ",".join(str(1 << i) for i in range(n_planes)) + "]"
    lsh_ann_sql = f"""
        WITH base AS (
          SELECT vec_id, embedding::DOUBLE[] AS e,
                 list_transform(embedding::DOUBLE[], x -> floor(x * {float(LSH_QUANT_SCALE)!r})) AS v
          FROM embeddings
        ), csig AS (
          {sig_rows}
        ), probes AS (
          SELECT q_id, tbl, unnest(probe) AS bucket FROM (
            SELECT vec_id AS q_id, tbl,
                   list_concat([bucket], list_transform({masks}, m -> xor(bucket, CAST(m AS BIGINT)))) AS probe
            FROM csig WHERE vec_id < 5
          )
        ), cand AS (
          SELECT DISTINCT p.q_id, c.vec_id
          FROM probes p JOIN csig c ON p.tbl = c.tbl AND p.bucket = c.bucket
        ), scored AS (
          SELECT cand.q_id, cand.vec_id,
                 list_cosine_similarity(qe.e, ce.e) AS cosine,
                 ROW_NUMBER() OVER (PARTITION BY cand.q_id
                   ORDER BY list_cosine_similarity(qe.e, ce.e) DESC, cand.vec_id ASC) AS rank
          FROM cand
          JOIN base qe ON cand.q_id = qe.vec_id
          JOIN base ce ON cand.vec_id = ce.vec_id
        )
        SELECT q_id, vec_id, ROUND(cosine, 6) AS cosine, rank FROM scored WHERE rank <= 10
    """

    return {
        "dedup_minhash_lsh": minhash_sql,
        "dedup_simhash": simhash_sql,
        "dedup_simhash_capped": simhash_capped_sql,
        "dedup_simhash_overflow": simhash_overflow_sql,
        "dedup_minhash_capped": minhash_capped_sql,
        "dedup_minhash_overflow": minhash_overflow_sql,
        "text_fingerprint": fp_sql,
        "sketch_distinct_users": hll_sql,
        "sketch_heavy_hitters": cms_sql,
        "ann_lsh_topk": lsh_ann_sql,
        "ann_ivf_topk": _ann_ivf_oracle(),
        "ann_pq_adc": _ann_pq_oracle(),
        "dedup_substring_spans": _substring_spans_oracle(),
        "lm_bits_score": _lm_bits_oracle(),
        "corpus_shuffle": _corpus_shuffle_oracle(),
        "url_canonicalize": _url_canonicalize_oracle(),
        "frontier_pagerank": _pagerank_oracle(),
        "link_hits": _hits_oracle(),
        "link_trustrank": _trustrank_oracle(),
        "classifier_calibration": _calibration_oracle(),
        "host_pagerank": _host_pagerank_oracle(),
        "cdc_chunking": _cdc_oracle(),
        "bpe_train": _bpe_oracle(),
        "bpe_encode": _bpe_encode_oracle(),
        "anchor_text_agg": _anchor_text_oracle(),
        "host_budget_alloc": """
            WITH h AS (
              SELECT source AS host, CAST(SUM(n_chars) AS BIGINT) AS weight
              FROM documents GROUP BY source),
            t AS (SELECT CAST(SUM(weight) AS BIGINT) AS w FROM h),
            q AS (
              SELECT host, weight,
                     (1000 * weight) // w AS base,
                     (1000 * weight) % w AS rem
              FROM h, t),
            k AS (SELECT 1000 - CAST(SUM(base) AS BIGINT) AS k FROM q),
            r AS (
              SELECT host, weight, base,
                     ROW_NUMBER() OVER (ORDER BY rem DESC, host) AS rk
              FROM q)
            SELECT host, weight,
                   CAST(base + CASE WHEN rk <= (SELECT k FROM k) THEN 1 ELSE 0 END
                        AS BIGINT) AS budget
            FROM r
        """,
        "robots_parse": _robots_parse_oracle(),
        "robots_decide": _robots_decide_oracle(),
        "host_shard_assign": _host_shard_oracle(),
        "html_meta_directives": _html_meta_oracle(),
        "cache_policy": _cache_policy_oracle(),
        "adaptive_crawl_delay": _adaptive_delay_oracle(),
        "dsir_importance": _dsir_oracle(),
        "mixture_interleave": _mixture_interleave_oracle(),
        "warc_cdx_layout": _warc_layout_oracle(),
        "warc_revisit_dedup": _warc_revisit_oracle(),
        "dataset_fingerprint": _fingerprint_oracle(),
        "exif_orientation": _exif_oracle(),
        "frontier_aging": _frontier_aging_oracle(),
        "jpeg_quality_estimate": _jpeg_quality_oracle(),
        "url_template_cap": _template_cap_oracle(),
        "minhash_delta_dedup": _minhash_delta_oracle(),
        "charset_detect": _charset_oracle(),
        "politeness_timeline": _politeness_timeline_oracle(),
        "politeness_timeline_parallel": _politeness_parallel_oracle(),
        "script_profile": _script_profile_oracle(),
        "robots_availability": _robots_availability_oracle(),
        "registrable_domain": _registrable_domain_oracle(),
        "index_search_phrase": _search_phrase_oracle(),
        "jpeg_structure": _jpeg_structure_oracle(),
        "image_bomb_gate": _bomb_gate_oracle(),
        "sitemap_scheduling_hints": _sitemap_hints_oracle(),
        "ann_binary_hamming": _binary_hamming_oracle(),
        "png_structure": _png_structure_oracle(),
        "webp_structure": _webp_structure_oracle(),
        "gif_structure": _gif_structure_oracle(),
        "exif_datetime": _exif_datetime_oracle(),
        "soft404_detect": _soft404_oracle(),
        "mirror_hosts": _mirror_hosts_oracle(),
        "isobmff_structure": _isobmff_oracle(),
        "url_resolve": _url_resolve_oracle(),
        "extract_outlinks": _outlinks_oracle(),
        "extract_images": _images_oracle(),
        "figure_captions": _figure_captions_oracle(),
        "caption_election": _caption_election_oracle(),
        "html_tables": _html_tables_oracle(),
        "feed_enclosures": _feed_enclosures_oracle(),
        "table_markdown": _table_markdown_oracle(),
        "code_blocks": _code_blocks_oracle(),
        "data_uri_images": _data_uri_oracle(),
        "lazyload_images": _lazyload_oracle(),
        "image_role": _image_role_oracle(),
        "pdf_structure": _pdf_structure_oracle(),
        "gzip_structure": _gzip_structure_oracle(),
        "wav_structure": _wav_structure_oracle(),
        "mp3_structure": _mp3_structure_oracle(),
        "id3_text_frames": _id3_frames_oracle(),
        "pipeline_audio_admission": _audio_admission_oracle(),
        "pipeline_caption_release": _caption_release_oracle(),
        "tar_structure": _tar_structure_oracle(),
        "zstd_structure": _zstd_structure_oracle(),
        "zip_structure": _zip_structure_oracle(),
        "parquet_structure": _parquet_structure_oracle(),
        "webdataset_manifest": _wds_manifest_oracle(),
        "pipeline_image_harvest": _image_harvest_oracle(),
        "host_language_profile": _host_lang_profile_oracle(),
        "hreflang_alternates": _hreflang_oracle(),
        "pipeline_frontier_plan": _frontier_plan_oracle(),
        "caption_locale_gate": _caption_locale_oracle(),
        "zorder_key": _zorder_key_oracle(),
        "zorder_file_stats": _zorder_stats_oracle(),
        "url_locale_hint": _url_locale_oracle(),
        "embedding_quality": _embedding_quality_oracle(),
        "pipeline_warc_to_corpus": _warc_corpus_oracle(),
        "sitemap_discover": _sitemap_discover_oracle(),
        "sitemap_index_expand": _sitemap_index_oracle(),
        "fetch_plan": _fetch_plan_oracle(),
        "robots_sitemap_lines": _robots_sitemaps_oracle(),
        "warc_parse": _warc_parse_oracle(),
        "image_header_dims": _image_dims_oracle(),
        "line_dedup": _line_dedup_oracle(),
        "redirect_resolve": _redirect_oracle(),
        "url_trap_filter": _url_trap_oracle(),
        "frontier_admission": _frontier_admission_oracle(),
        "video_scene_cuts": _scene_cuts_oracle(),
        "webvtt_cues": _webvtt_cues_oracle(),
        "pipeline_video_text": _video_text_oracle(),
        "srt_cues": _srt_cues_oracle(),
        "jsonld_image_license": _jsonld_oracle(),
        "hls_segments": _hls_oracle("segments"),
        "hls_playlist": _hls_oracle("playlist"),
        "hls_variants": _hls_oracle("variants"),
        "pipeline_av_discovery": _av_discovery_oracle(),
        "hls_media_renditions": _hls_renditions_oracle(),
        "pipeline_subtitle_harvest": _subtitle_harvest_oracle(),
        "html_text_extract": _html_text_oracle(),
        "semdedup_drop_list": _semdedup_oracle(),
        "image_aspect_bucket": _aspect_bucket_oracle(),
        "clip_align_gate": _clip_align_oracle(),
        "caption_dedup_best": _caption_dedup_best_oracle(),
        "crossmodal_recall": _crossmodal_recall_oracle(),
        "image_phash_dedup": _phash_dedup_oracle(),
        "dedup_hamming_pigeonhole": _hamming_pigeonhole_oracle(),
        "image_phash_components": _phash_components_oracle(),
        "split_leakage_images": _split_leakage_images_oracle(),
        "joint_dedup_clusters": _joint_dedup_oracle(),
        "image_linear_gate": _image_linear_gate_oracle(),
        "image_batch_assembly": _batch_assembly_oracle(),
        "mixture_sample": _mixture_sample_oracle(),
        "text_classifier_gate": _classifier_gate_oracle(),
        "doc_chunk_overlap": f"""
            WITH tk AS (
              SELECT doc_id, {_TOK} AS tk FROM documents
            ), st AS (
              SELECT doc_id, tk,
                     unnest(generate_series(0, greatest(len(tk) - 1, 0), 16)) AS s
              FROM tk
            )
            SELECT doc_id,
                   CAST(s // 16 AS INT) AS chunk_id,
                   CAST(len(list_slice(tk, s + 1, s + 32)) AS INT) AS n_chunk_tokens,
                   array_to_string(list_slice(tk, s + 1, s + 32), ' ') AS chunk_text
            FROM st
        """,
        "pipeline_image_caption": _image_caption_oracle(),
    }


def _clip_align_oracle() -> str:
    """DuckDB replay of q_clip_align_gate: the identical hash60
    component plants expanded to scalar columns (dim 8), the dot /
    norm sums written out term-by-term, and the identical
    cross-multiplied integer threshold test. hash60 is non-negative,
    so DuckDB's % matches Spark's pmod."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    dim = 8
    img = [f"(({H('doc_id', s)}) % 15 - 7)" for s in range(dim)]
    cap_raw = [f"(({H('doc_id', 100 + s)}) % 15 - 7)" for s in range(dim)]
    aligned = f"(({H('doc_id', 99)}) % 4 = 0)"
    img_cols = ",\n                 ".join(f"{e} AS i{s}" for s, e in enumerate(img))
    cap_cols = ",\n                 ".join(
        f"CASE WHEN {aligned} THEN i{s} + {1 if s == 0 else 0} "
        f"ELSE {cap_raw[s]} END AS c{s}"
        for s in range(dim)
    )
    dot = " + ".join(f"i{s} * c{s}" for s in range(dim))
    na = " + ".join(f"i{s} * i{s}" for s in range(dim))
    nb = " + ".join(f"c{s} * c{s}" for s in range(dim))
    return f"""
        WITH e AS (
          SELECT doc_id,
                 {img_cols}
          FROM documents
        ), p AS (
          SELECT doc_id,
                 {cap_cols},
                 * EXCLUDE (doc_id)
          FROM e
        ), s AS (
          SELECT doc_id,
                 CAST({dot} AS BIGINT) AS dot,
                 CAST({na} AS BIGINT) AS n_img,
                 CAST({nb} AS BIGINT) AS n_cap
          FROM p
        )
        SELECT doc_id, dot, n_img, n_cap,
               (dot > 0 AND dot * dot * 10000 >= 900 * n_img * n_cap) AS align_keep
        FROM s
    """


def _crossmodal_recall_oracle() -> str:
    """DuckDB replay of q_crossmodal_recall: identical planted
    caption/image embeddings (hash60 components as DOUBLE lists),
    the same cross-join top-5 by cosine with the (cosine DESC,
    vec_id ASC) tiebreak as the ann_cosine_topk oracle, then the
    hit-count aggregate."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    dim = 8
    cap = ", ".join(f"CAST(({H('doc_id', s)}) % 15 - 7 AS DOUBLE)" for s in range(dim))
    img = ", ".join(
        f"CAST(({H('doc_id', s)}) % 15 - 7 AS DOUBLE)" + (" + 1.0" if s == 0 else "")
        for s in range(dim)
    )
    return f"""
        WITH cap AS (
          SELECT doc_id AS vec_id, [{cap}] AS embedding FROM documents
        ), img AS (
          SELECT doc_id AS q_id, [{img}] AS q_vec FROM documents WHERE doc_id % 50 = 0
        ), topk AS (
          SELECT q_id, vec_id FROM (
            SELECT i.q_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY i.q_id
                     ORDER BY list_cosine_similarity(i.q_vec, c.embedding) DESC,
                              c.vec_id ASC) AS rank
            FROM img i CROSS JOIN cap c
          ) WHERE rank <= 5
        )
        SELECT 5 AS k,
               COUNT(DISTINCT q_id) AS n_queries,
               CAST(SUM(CASE WHEN q_id = vec_id THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               ROUND(SUM(CASE WHEN q_id = vec_id THEN 1 ELSE 0 END)::DOUBLE
                     / COUNT(DISTINCT q_id), 4) AS recall_at_k
        FROM topk
    """


def _caption_dedup_best_oracle() -> str:
    """DuckDB replay of q_caption_dedup_best: identical planted
    caption groups and hash60 geometry, ROW_NUMBER over
    (area DESC, doc_id ASC), rn = 1 survivors."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    return f"""
        WITH p AS (
          SELECT doc_id,
                 'caption ' || CAST(doc_id % 37 AS VARCHAR) AS caption,
                 CAST(256 + ({H('doc_id')}) % 1024 AS INT) AS w,
                 CAST(256 + ({H('doc_id', 1)}) % 1024 AS INT) AS h
          FROM documents
        ), a AS (
          SELECT *, CAST(w AS BIGINT) * h AS area FROM p
        ), r AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY caption ORDER BY area DESC, doc_id ASC) AS rn
          FROM a
        )
        SELECT doc_id, caption, w, h, area FROM r WHERE rn = 1
    """


def _substring_spans_oracle() -> str:
    """DuckDB replay of q_dedup_substring_spans: rolling k-token
    window grams per start offset (DuckDB list slices are
    inclusive-end: tk[i:i+k-1] is the k-gram at 1-based i), hash60
    gram hashes, corpus-wide count >= 2, then the identical
    window-island interval merge."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    k = 12
    return f"""
        WITH toks AS (
          SELECT doc_id, {_TOK} AS tk FROM documents
        ), g AS (
          SELECT doc_id, r.i - 1 AS start,
                 {H(f"array_to_string(tk[r.i:r.i+{k - 1}], ' ')")} AS gh
          FROM toks, unnest(range(1, len(tk) - {k} + 2)) AS r(i)
        ), dup AS (
          SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2
        ), occ AS (
          SELECT g.doc_id, g.start FROM g JOIN dup USING (gh)
        ), brk AS (
          SELECT doc_id, start,
            CASE WHEN start > COALESCE(MAX(start + {k}) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS b
          FROM occ
        ), isl AS (
          SELECT doc_id, start, SUM(b) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM brk
        )
        SELECT doc_id, MIN(start) AS span_start, MAX(start) + {k} AS span_end,
               MAX(start) + {k} - MIN(start) AS span_tokens
        FROM isl GROUP BY doc_id, island
    """


def _url_canonicalize_oracle() -> str:
    """DuckDB replay of q_url_canonicalize: the identical planted raw
    spellings, canonical_url_sql (the fragment kept adjacent to the
    Spark expression chain in functions/urlnorm.py), and the hash60
    seen key."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.functions.urlnorm import canonical_url_sql

    c = canonical_url_sql("url")
    return f"""
        WITH raw AS (
          SELECT unnest([
            'http://example' || (doc_id % 50) || '.org/path/' || (doc_id % 50) || '?b=2&a=1',
            'HTTP://EXAMPLE' || (doc_id % 50) || '.ORG:80/path/' || (doc_id % 50) || '/?a=1&b=2#frag',
            'http://example' || (doc_id % 50) || '.org/path/' || (doc_id % 50) || '#sec',
            'https://example' || (doc_id % 50) || '.org:443/other/' || (doc_id % 50),
            'https://example' || (doc_id % 50) || '.org/other/' || (doc_id % 50) || '?'
          ]) AS url FROM documents
        ), canon AS (
          SELECT url, {c} AS canonical_url FROM raw
        )
        SELECT canonical_url,
               COUNT(*) AS n_raw,
               COUNT(DISTINCT url) AS n_forms,
               {H('canonical_url')} AS seen_key
        FROM canon GROUP BY canonical_url
    """


def _anchor_text_oracle() -> str:
    """DuckDB replay of q_anchor_text_agg: identical planted link
    graph (hash60 dsts), anchor = first 4 tokens of the source doc,
    exact (n_srcs, n_links) counts, top-2 per dst by the same
    deterministic ordering."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    links_union = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id AS src, {H('doc_id', j)} % (SELECT n FROM nn) AS dst, "
        f"unnest(list_slice({_TOK}, 1, 4)) AS term FROM documents"
        for j in (1, 2, 3)
    )
    return f"""
        WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        l AS (
            {links_union}
        ),
        a AS (
          SELECT dst, term, COUNT(*) AS n_links, COUNT(DISTINCT src) AS n_srcs
          FROM l GROUP BY dst, term)
        SELECT dst, term, n_links, n_srcs, rk FROM (
          SELECT dst, term, n_links, n_srcs,
                 ROW_NUMBER() OVER (PARTITION BY dst
                     ORDER BY n_srcs DESC, n_links DESC, term) AS rk
          FROM a)
        WHERE rk <= 2
    """


def _pagerank_oracle(iters: int = 4) -> str:
    """DuckDB replay of q_frontier_pagerank: the identical planted
    edge list and `iters` unrolled integer power iterations —
    SUM(r // odeg) per target, damped as (85*m)//100 + base. Every
    SUM is cast back to BIGINT (DuckDB integer SUM is HUGEINT)."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    r0 = 10**12
    base = (r0 * 15) // 100
    edges_union = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id AS src, {H('doc_id', j)} % (SELECT n FROM nn) AS dst FROM documents"
        for j in (1, 2, 3)
    )
    ctes = [
        "nn AS (SELECT COUNT(*) AS n FROM documents)",
        f"e0 AS (\n            {edges_union}\n        )",
        "od AS (SELECT src, COUNT(*) AS odeg FROM e0 GROUP BY src)",
        "e AS (SELECT e0.src, e0.dst, od.odeg FROM e0 JOIN od USING (src))",
        "nodes AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM e0 UNION ALL SELECT dst AS id FROM e0))",
        f"pr0 AS (SELECT id, CAST({r0} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""pr{i} AS (
          SELECT n.id, CAST({base} + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS r
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS id, CAST(SUM(rr.r // e.odeg) AS BIGINT) AS m
            FROM e JOIN pr{i - 1} rr ON e.src = rr.id GROUP BY e.dst
          ) s ON n.id = s.id
        )""")
    body = ",\n        ".join(ctes)
    return f"WITH {body}\n        SELECT id AS doc_id, r AS rank_int FROM pr{iters}"


def _calibration_oracle(n_bins: int = 20) -> str:
    """DuckDB replay of q_classifier_calibration: identical planted
    label/score arithmetic (same IEEE operation order so floor-binning
    agrees), histogram, descending cumulative window, and rounded
    divisions. SUMs cast back from HUGEINT."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    return f"""
        WITH s AS (
          SELECT least(CAST(floor(score * {n_bins}) AS BIGINT), {n_bins - 1}) AS bin, lab
          FROM (
            SELECT (({H('doc_id', 7)} % 1000) / 1000.0 + lab) / 2 AS score, lab
            FROM (
              SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS lab
              FROM documents
            )
          )
        ), hist AS (
          SELECT bin, CAST(SUM(lab) AS BIGINT) AS pos,
                 CAST(SUM(1 - lab) AS BIGINT) AS neg
          FROM s GROUP BY bin
        ), c AS (
          SELECT bin,
            CAST(SUM(pos) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
            CAST(SUM(neg) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp,
            CAST(SUM(pos) OVER ()
                 - SUM(pos) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fn
          FROM hist
        )
        SELECT bin::DOUBLE / {n_bins} AS threshold, tp, fp, fn,
               ROUND(tp::DOUBLE / (tp + fp), 6) AS precision,
               ROUND(tp::DOUBLE / (tp + fn), 6) AS recall,
               ROUND(2 * tp::DOUBLE / (2 * tp + fp + fn), 6) AS f1
        FROM c
    """


def _bpe_cte_chain(n_merges: int) -> list[str]:
    """Shared CTE chain replaying bpe_train's rounds in DuckDB: the
    word-frequency table, then per round — pair counts via an
    index-range unnest, top-1 with the identical (tot DESC, a, b)
    tie-break, and the EXACT greedy merge fold via list_reduce over
    a '|'-delimited accumulator (symbols are [0-9a-z_]+
    concatenations, '|' cannot occur). The word string rides every
    w{r} so the encode oracle can join back. Assumes the corpus
    sustains n_merges rounds (true for the documents tables); SUMs
    cast back from HUGEINT."""
    ctes = [
        f"""wf AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM (SELECT unnest({_TOK}) AS w FROM documents) GROUP BY w
        )""",
        "w0 AS (SELECT w, cnt, regexp_extract_all(w, '.') AS syms FROM wf)",
    ]
    for r in range(1, n_merges + 1):
        ctes.append(f"""p{r} AS (
          SELECT pr.a AS a, pr.b AS b, CAST(SUM(cnt) AS BIGINT) AS tot FROM (
            SELECT cnt, unnest(list_transform(range(1, len(syms)),
                     i -> {{'a': syms[i], 'b': syms[i+1]}})) AS pr
            FROM w{r - 1}
          ) GROUP BY pr.a, pr.b
        )""")
        ctes.append(f"t{r} AS (SELECT a, b, tot FROM p{r} ORDER BY tot DESC, a ASC, b ASC LIMIT 1)")
        ctes.append(f"""w{r} AS (
          SELECT w, cnt,
            CASE WHEN len(syms) < 2 THEN syms
                 ELSE string_split(list_reduce(syms, (acc, x) ->
                    CASE WHEN regexp_extract(acc, '([^|]*)$', 1) = t.a AND x = t.b
                         THEN regexp_replace(acc, '([^|]*)$', t.a || t.b)
                         ELSE acc || '|' || x END), '|') END AS syms
          FROM w{r - 1}, t{r} t
        )""")
    return ctes


def _bpe_oracle(n_merges: int = 6) -> str:
    """DuckDB replay of q_bpe_train via _bpe_cte_chain."""
    finals = "\n        UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, a AS left_sym, b AS right_sym, tot AS pair_count FROM t{r}"
        for r in range(1, n_merges + 1)
    )
    body = ",\n        ".join(_bpe_cte_chain(n_merges))
    return f"WITH {body}\n        {finals}"


def _bpe_encode_oracle(n_merges: int = 6) -> str:
    """DuckDB replay of q_bpe_encode: the same merge chain
    (_bpe_cte_chain), then per-doc counts = explode words, join each
    word's final symbol count from w{n}, sum per doc."""
    body = ",\n        ".join(_bpe_cte_chain(n_merges))
    return f"""WITH {body}
        SELECT doc_id, CAST(SUM(len(v.syms)) AS BIGINT) AS n_bpe_tokens
        FROM (SELECT doc_id, unnest({_TOK}) AS w FROM documents) d
        JOIN w{n_merges} v USING (w)
        GROUP BY doc_id"""


def _cdc_oracle(div: int = 16) -> str:
    """DuckDB replay of q_cdc_chunking: same tokenization (_TOK),
    same 2-gram hash60 boundary rule, same [starts, ends) span
    slicing (list_slice's inclusive end vs Spark slice's length —
    ends[j]-1 == start + length - 1)."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    bh = H("tk[i-1] || ' ' || tk[i]")
    return f"""
        WITH t AS (
          SELECT doc_id, {_TOK} AS tk FROM documents
        ), b AS (
          SELECT doc_id, tk,
                 CASE WHEN len(tk) >= 2 THEN
                   list_filter(range(2, len(tk) + 1), i -> {bh} % {div} = 0)
                 ELSE [] END AS mid
          FROM t
        ), s AS (
          SELECT doc_id, tk,
                 list_concat([1], mid) AS starts,
                 list_concat(mid, [len(tk) + 1]) AS ends
          FROM b
        ), u AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(starts) + 1), j -> {{
                   'idx': j - 1,
                   'n': ends[j] - starts[j],
                   'ch': array_to_string(list_slice(tk, starts[j], ends[j] - 1), ' ')
                 }})) AS c
          FROM s
        )
        SELECT doc_id, CAST(c.idx AS BIGINT) AS chunk_idx,
               CAST(c.n AS BIGINT) AS n_tokens, c.ch AS chunk
        FROM u WHERE c.n > 0
    """


def _host_pagerank_oracle(iters: int = 4) -> str:
    """DuckDB replay of q_host_pagerank: host projection with count
    weights, then `iters` unrolled weighted iterations — share =
    (r * w) // sw, damped as (85*m)//100 + base, r0 = 10^9. SUMs
    cast back from HUGEINT."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    r0 = 10**9
    base = (r0 * 15) // 100
    edges_union = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id % 40 AS src, ({H('doc_id', j)} % (SELECT n FROM nn)) % 40 AS dst FROM documents"
        for j in (1, 2, 3)
    )
    ctes = [
        "nn AS (SELECT COUNT(*) AS n FROM documents)",
        f"e0 AS (\n            {edges_union}\n        )",
        "he AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM e0 GROUP BY src, dst)",
        "swt AS (SELECT src, CAST(SUM(w) AS BIGINT) AS sw FROM he GROUP BY src)",
        "e AS (SELECT he.src, he.dst, he.w, swt.sw FROM he JOIN swt USING (src))",
        "nodes AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM he UNION ALL SELECT dst AS id FROM he))",
        f"pr0 AS (SELECT id, CAST({r0} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""pr{i} AS (
          SELECT n.id, CAST({base} + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS r
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS id, CAST(SUM((rr.r * e.w) // e.sw) AS BIGINT) AS m
            FROM e JOIN pr{i - 1} rr ON e.src = rr.id GROUP BY e.dst
          ) s ON n.id = s.id
        )""")
    body = ",\n        ".join(ctes)
    return f"WITH {body}\n        SELECT id AS host_id, r AS rank_int FROM pr{iters}"


def _trustrank_oracle(iters: int = 4) -> str:
    """DuckDB replay of q_link_trustrank: _pagerank_oracle's planted
    edge list with the teleport base and initial mass gated on seed
    membership (id % 13 = 0) — non-seeds start at 0 and receive only
    propagated, damped mass. SUMs cast back from HUGEINT."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    r0 = 10**12
    base = (r0 * 15) // 100
    edges_union = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id AS src, {H('doc_id', j)} % (SELECT n FROM nn) AS dst FROM documents"
        for j in (1, 2, 3)
    )
    ctes = [
        "nn AS (SELECT COUNT(*) AS n FROM documents)",
        f"e0 AS (\n            {edges_union}\n        )",
        "od AS (SELECT src, COUNT(*) AS odeg FROM e0 GROUP BY src)",
        "e AS (SELECT e0.src, e0.dst, od.odeg FROM e0 JOIN od USING (src))",
        "nodes AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM e0 UNION ALL SELECT dst AS id FROM e0))",
        f"tr0 AS (SELECT id, CAST(CASE WHEN id % 13 = 0 THEN {r0} ELSE 0 END AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""tr{i} AS (
          SELECT n.id, CAST(CASE WHEN n.id % 13 = 0 THEN {base} ELSE 0 END
                            + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS r
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS id, CAST(SUM(rr.r // e.odeg) AS BIGINT) AS m
            FROM e JOIN tr{i - 1} rr ON e.src = rr.id GROUP BY e.dst
          ) s ON n.id = s.id
        )""")
    body = ",\n        ".join(ctes)
    return f"WITH {body}\n        SELECT id AS doc_id, r AS trust_int FROM tr{iters}"


def _hits_oracle(iters: int = 3) -> str:
    """DuckDB replay of q_link_hits: the identical planted edge list
    and `iters` unrolled integer HITS iterations — auth = SUM of hub
    over in-edges, hub = SUM of NEW auth over out-edges, each
    normalized divide-first by GREATEST(1, ceil(max/SCALE)) so every
    intermediate stays int64 (SUMs cast back from HUGEINT)."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    s = 10**6
    edges_union = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id AS src, {H('doc_id', j)} % (SELECT n FROM nn) AS dst FROM documents"
        for j in (1, 2, 3)
    )
    ctes = [
        "nn AS (SELECT COUNT(*) AS n FROM documents)",
        f"e AS (\n            {edges_union}\n        )",
        "nodes AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e))",
        f"h0 AS (SELECT id, CAST({s} AS BIGINT) AS sc FROM nodes)",
    ]
    for i in range(1, iters + 1):
        for raw, cur, prev, on_e, on_p in (
            (f"ar{i}", f"a{i}", f"h{i - 1}", "dst", "src"),
            (f"hr{i}", f"h{i}", f"a{i}", "src", "dst"),
        ):
            ctes.append(
                f"{raw} AS (SELECT e.{on_e} AS id, CAST(SUM(p.sc) AS BIGINT) AS m\n"
                f"          FROM e JOIN {prev} p ON e.{on_p} = p.id GROUP BY e.{on_e})"
            )
            ctes.append(
                f"{cur} AS (SELECT n.id,\n"
                f"            CAST(COALESCE(r.m, 0) // GREATEST(\n"
                f"              (SELECT (COALESCE(MAX(m), 0) + {s - 1}) // {s} FROM {raw}),\n"
                f"              1) AS BIGINT) AS sc\n"
                f"          FROM nodes n LEFT JOIN {raw} r ON n.id = r.id)"
            )
    body = ",\n        ".join(ctes)
    return (
        f"WITH {body}\n"
        f"        SELECT n.id AS doc_id, a.sc AS auth_int, h.sc AS hub_int\n"
        f"        FROM nodes n JOIN a{iters} a ON n.id = a.id JOIN h{iters} h ON n.id = h.id"
    )


def _url_trap_oracle() -> str:
    """DuckDB replay of q_url_trap_filter: identical planted URLs,
    url_trap_flags_sql heuristics, per-host counts (SUMs cast back
    to BIGINT)."""
    from dblp_crawler_spark.functions.urlnorm import url_trap_flags_sql

    deep_path = "/" + "/".join(f"p{i}" for i in range(10))
    fr = url_trap_flags_sql("url")
    sums = ",\n               ".join(
        f"CAST(SUM(CASE WHEN {fr[name]} THEN 1 ELSE 0 END) AS BIGINT) AS {alias}"
        for name, alias in [
            ("deep_path", "n_deep"),
            ("repeated_segments", "n_repeat"),
            ("session_param", "n_session"),
            ("calendar_loop", "n_calendar"),
            ("is_trap", "n_trapped"),
        ]
    )
    return f"""
        WITH raw AS (
          SELECT CASE doc_id % 5
            WHEN 0 THEN 'http://h' || (doc_id % 50) || '.org/a/b?x=1'
            WHEN 1 THEN 'http://h' || (doc_id % 50) || '.org{deep_path}'
            WHEN 2 THEN 'http://h' || (doc_id % 50) || '.org/cat/page/cat/page/cat'
            WHEN 3 THEN 'http://h' || (doc_id % 50) || '.org/a?PHPSESSID=abc&x=1'
            ELSE 'http://h' || (doc_id % 50) || '.org/2020/01/2020/02/x'
          END AS url FROM documents
        )
        SELECT 'h' || regexp_extract(url, 'h([0-9]+)\\.org', 1) || '.org' AS host,
               COUNT(*) AS n_urls,
               {sums}
        FROM raw GROUP BY 1
    """


def _scene_cuts_oracle(max_hamming: int = 10) -> str:
    """DuckDB replay of q_video_scene_cuts: identical planted frame
    phashes (seeded-hash60 base per scene, XOR jitter), lag + running
    sum in separate CTEs (no nested windows), bit_count(xor)."""
    base = ("CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || chr(31) "
            "|| CAST(i // 3 AS VARCHAR)), 1, 15)) AS BIGINT)")
    return f"""
        WITH frames AS (
          SELECT doc_id AS video_id, CAST(i AS INT) AS frame_idx,
                 xor({base}, CAST(i % 3 AS BIGINT)) AS phash
          FROM documents, range(8) t(i)
        ), lagged AS (
          SELECT video_id, frame_idx, phash,
                 lag(phash) OVER (PARTITION BY video_id ORDER BY frame_idx) AS prev
          FROM frames
        ), cuts AS (
          SELECT video_id, frame_idx,
                 CASE WHEN prev IS NULL
                      OR bit_count(xor(phash, prev)) > {max_hamming}
                 THEN 1 ELSE 0 END AS cut
          FROM lagged
        ), scened AS (
          SELECT video_id, frame_idx,
                 SUM(cut) OVER (PARTITION BY video_id ORDER BY frame_idx
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene
          FROM cuts
        ), per_scene AS (
          SELECT video_id, scene, COUNT(*) AS len FROM scened GROUP BY video_id, scene
        )
        SELECT video_id,
               CAST(SUM(len) AS BIGINT) AS n_frames,
               COUNT(*) AS n_scenes,
               MAX(len) AS longest_scene
        FROM per_scene GROUP BY video_id
    """


def _sql_str(s: str) -> str:
    """Render a Python string (possibly holding newlines) as a DuckDB
    expression — chr(10) concat, since plain SQL literals don't
    interpret escapes."""
    parts = []
    for seg in s.split("\n"):
        if seg:
            parts.append("'" + seg.replace("'", "''") + "'")
        parts.append("chr(10)")
    return "(" + " || ".join(parts[:-1] or ["''"]) + ")"


def _srt_cues_oracle() -> str:
    """DuckDB replay of q_srt_cues."""
    from dblp_crawler_spark.sources.subtitles import srt_cues_sql

    sid = "CAST(doc_id AS VARCHAR)"
    srt = (
        f"CASE WHEN doc_id % 3 = 2 THEN 'no cues here'"
        f" ELSE {_sql_str(_SRT_PRE)} || {sid} || {_sql_str(_SRT_MID)}"
        f" || {sid} || {_sql_str(_SRT_POST)} END"
    )
    src = f"""(
        SELECT doc_id AS video_id, {srt} AS srt FROM documents
    ) srt_src"""
    return srt_cues_sql(src)


def _jsonld_oracle() -> str:
    """DuckDB replay of q_jsonld_image_license — same planted
    blocks, real JSON functions."""
    from dblp_crawler_spark.sources.webparse import jsonld_images_sql

    sid = "CAST(doc_id AS VARCHAR)"
    b1 = (
        f"'{{\"@type\":\"ImageObject\",\"contentUrl\":\"/ph/c' || {sid}"
        f" || '.jpg\",\"caption\":\"photo ' || {sid}"
        f" || '\",\"license\":\"https://creativecommons.org/licenses/by/4.0/\","
        f"\"creditText\":\"Agency\",\"creator\":{{\"name\":\"Ann ' || {sid}"
        f" || '\"}}}}'"
    )
    b2 = "'{\"@type\":\"NewsArticle\",\"headline\":\"x\"}'"
    b3 = (
        f"CASE WHEN doc_id % 2 = 0 THEN"
        f" '{{\"@type\":\"ImageObject\",\"url\":\"https://cdn'"
        f" || CAST(doc_id % 5 AS VARCHAR) || '.net/u' || {sid}"
        f" || '.png\"}}'"
        f" ELSE '{{\"@type\":\"ImageObject\", broken' END"
    )
    html = (
        f"'<script type=\"application/ld+json\">' || {b1} || '</script>'"
        f" || '<script type=\"application/ld+json\">' || {b2} || '</script>'"
        f" || '<script type=\"application/ld+json\">' || {b3} || '</script>'"
    )
    src = f"""(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/a/p'
                 || {sid} AS url,
               {html} AS html
        FROM documents
    ) jl_src"""
    return jsonld_images_sql(src)


def _hls_oracle(which: str) -> str:
    """DuckDB replay of the q_hls_* entries — same planted playlists
    through _sql_str, same fragments."""
    from dblp_crawler_spark.sources.hls import (
        hls_playlist_sql,
        hls_segments_sql,
        hls_variants_sql,
    )

    sid = "CAST(doc_id AS VARCHAR)"
    m3u8 = (
        f"CASE doc_id % 3"
        f" WHEN 0 THEN {_sql_str(_HLS_MASTER_PRE)} || {sid}"
        f" || {_sql_str(_HLS_MASTER_MID)} || {sid}"
        f" || {_sql_str(_HLS_MASTER_POST)}"
        f" WHEN 1 THEN {_sql_str(_HLS_VOD_PRE)} || {sid}"
        f" || {_sql_str(_HLS_VOD_MID)} || {sid}"
        f" || {_sql_str(_HLS_VOD_POST)}"
        f" ELSE {_sql_str(_HLS_LIVE_PRE)} || {sid}"
        f" || {_sql_str(_HLS_LIVE_POST)} END"
    )
    src = f"""(
        SELECT 'https://v' || CAST(doc_id % 10 AS VARCHAR) || '.ex.org/s'
                 || {sid} || '/index.m3u8' AS url,
               {m3u8} AS m3u8
        FROM documents
    ) hls_src"""
    fn = {"segments": hls_segments_sql, "playlist": hls_playlist_sql,
          "variants": hls_variants_sql}[which]
    return fn(src)


def _av_discovery_oracle() -> str:
    """DuckDB replay of q_pipeline_av_discovery — chains
    sitemap_videos_sql + hls_playlist_sql + the same left join and
    per-host rollup."""
    from dblp_crawler_spark.sources.hls import hls_playlist_sql
    from dblp_crawler_spark.sources.webparse import sitemap_videos_sql

    d = "CAST(doc_id AS VARCHAR)"
    hh = "CAST(doc_id % 10 AS VARCHAR)"
    sm_src = f"""(
        SELECT 'h' || {hh} || '.org' AS host,
               '<urlset><url><loc>https://h' || {hh} || '.org/w/' || {d}
               || '</loc><video:video><video:content_loc>https://cdn' || {hh}
               || '.net/v/' || {d}
               || '.m3u8</video:content_loc><video:title>Clip ' || {d}
               || '</video:title></video:video></url></urlset>'
                 AS sitemap_xml
        FROM documents
    )"""
    m3u8 = (
        f"CASE WHEN doc_id % 3 = 1 THEN {_sql_str(_HLS_VOD_PRE)} || {d}"
        f" || {_sql_str(_HLS_VOD_MID)} || {d} || {_sql_str(_HLS_VOD_POST)}"
        f" WHEN doc_id % 2 = 0 THEN {_sql_str(_HLS_MASTER_PRE)} || {d}"
        f" || {_sql_str(_HLS_MASTER_MID)} || {d}"
        f" || {_sql_str(_HLS_MASTER_POST)}"
        f" ELSE {_sql_str(_HLS_LIVE_PRE)} || {d}"
        f" || {_sql_str(_HLS_LIVE_POST)} END"
    )
    store = f"""(
        SELECT 'https://cdn' || {hh} || '.net/v/' || {d} || '.m3u8' AS url,
               {m3u8} AS m3u8
        FROM documents WHERE doc_id % 3 <> 0
    )"""
    declared = sitemap_videos_sql(sm_src)
    routed = hls_playlist_sql(store)
    return f"""
        WITH avd_d AS ({declared}), avd_r AS ({routed}), avd_j AS (
          SELECT d.host, r.kind, r.live, r.total_duration_ms
          FROM avd_d d LEFT JOIN avd_r r ON d.video_url = r.url
        )
        SELECT host, COUNT(*) AS n_declared,
               COUNT(kind) AS n_fetched,
               CAST(SUM(CASE WHEN kind = 'media' AND NOT live
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_vod,
               CAST(SUM(CASE WHEN COALESCE(live, false)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
               CAST(SUM(CASE WHEN kind = 'master' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_master,
               CAST(COALESCE(SUM(CASE WHEN kind = 'media' AND NOT live
                    THEN total_duration_ms ELSE 0 END), 0) AS BIGINT)
                 AS vod_duration_ms
        FROM avd_j GROUP BY host
    """


def _hls_rendition_src_sql() -> str:
    """Shared planted-master relation for the rendition entries."""
    sid = "CAST(doc_id AS VARCHAR)"
    lang = ("CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de'"
            " WHEN 2 THEN 'fr' ELSE 'es' END")
    m3u8 = (
        f"'#EXTM3U' || chr(10)"
        f" || '#EXT-X-MEDIA:TYPE=AUDIO,GROUP-ID=\"aud\",NAME=\"Main\","
        f"LANGUAGE=\"en\",DEFAULT=YES' || chr(10)"
        f" || '#EXT-X-MEDIA:TYPE=SUBTITLES,GROUP-ID=\"subs\",NAME=\"T\","
        f"LANGUAGE=\"' || {lang} || '\",DEFAULT=NO,URI=\"subs/' || {lang}"
        f" || '-' || {sid} || '.vtt\"' || chr(10)"
        f" || '#EXT-X-STREAM-INF:BANDWIDTH=800000' || chr(10)"
        f" || 'low.m3u8' || chr(10)"
    )
    return f"""(
        SELECT 'https://v' || CAST(doc_id % 10 AS VARCHAR) || '.ex.org/m'
                 || {sid} || '/master.m3u8' AS url,
               {m3u8} AS m3u8
        FROM documents
    ) hm_src"""


def _hls_renditions_oracle() -> str:
    """DuckDB replay of q_hls_media_renditions."""
    from dblp_crawler_spark.sources.hls import hls_media_renditions_sql

    return hls_media_renditions_sql(_hls_rendition_src_sql())


def _subtitle_harvest_oracle() -> str:
    """DuckDB replay of q_pipeline_subtitle_harvest — chains
    hls_media_renditions_sql + webvtt_cues_sql + the same left join
    and per-language rollup."""
    from dblp_crawler_spark.sources.hls import hls_media_renditions_sql
    from dblp_crawler_spark.sources.subtitles import webvtt_cues_sql

    sid = "CAST(doc_id AS VARCHAR)"
    lang = ("CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de'"
            " WHEN 2 THEN 'fr' ELSE 'es' END")
    dur = "CAST(doc_id % 7 + 2 AS VARCHAR)"
    vtt = (
        f"'WEBVTT' || chr(10) || chr(10)"
        f" || '00:01.000 --> 00:0' || {dur} || '.000' || chr(10)"
        f" || 'hello ' || {sid} || chr(10) || chr(10)"
        f" || '01:00.000 --> 01:30.500' || chr(10)"
        f" || 'world ' || {sid} || chr(10)"
    )
    store = f"""(
        SELECT 'https://v' || CAST(doc_id % 10 AS VARCHAR) || '.ex.org/m'
                 || {sid} || '/subs/' || {lang} || '-' || {sid}
                 || '.vtt' AS vtt_url,
               {vtt} AS vtt
        FROM documents WHERE doc_id % 5 <> 0
    ) vs_src"""
    rends = hls_media_renditions_sql(_hls_rendition_src_sql())
    cues = webvtt_cues_sql(store, keep="vtt_url")
    return f"""
        WITH sh_r AS ({rends}), sh_c AS ({cues}), sh_j AS (
          SELECT r.language, r.rendition_url, c.vtt_url, c.cue_idx,
                 c.end_ms - c.start_ms AS dur_ms
          FROM (SELECT * FROM sh_r WHERE type = 'SUBTITLES') r
          LEFT JOIN sh_c c ON r.rendition_url = c.vtt_url
        )
        SELECT language,
               CAST(COUNT(DISTINCT rendition_url) AS BIGINT)
                 AS n_declared_tracks,
               CAST(COUNT(DISTINCT vtt_url) AS BIGINT) AS n_fetched_tracks,
               CAST(COUNT(cue_idx) AS BIGINT) AS n_cues,
               CAST(COALESCE(SUM(dur_ms), 0) AS BIGINT) AS caption_ms
        FROM sh_j GROUP BY language
    """


def _webvtt_cues_oracle() -> str:
    """DuckDB replay of q_webvtt_cues — same planted VTT strings."""
    from dblp_crawler_spark.sources.subtitles import webvtt_cues_sql

    sid = "CAST(doc_id AS VARCHAR)"
    src = f"""(
        SELECT doc_id AS video_id,
               CASE doc_id % 3
                 WHEN 0 THEN {_sql_str(_VTT_A_PRE)} || {sid}
                   || {_sql_str(_VTT_A_POST)}
                 WHEN 1 THEN {_sql_str(_VTT_B_PRE)} || {sid}
                   || {_sql_str(_VTT_B_POST)}
                 ELSE {_sql_str(_VTT_NONE)} END AS vtt
        FROM documents
    ) vt_src"""
    return webvtt_cues_sql(src)


def _video_text_oracle() -> str:
    """DuckDB replay of q_pipeline_video_text — chains the same three
    fragments: planted frames → scene_segments_sql, planted VTT →
    webvtt_cues_sql, then scene_transcripts_sql."""
    from dblp_crawler_spark.operators.multimodal import (
        scene_segments_sql,
        scene_transcripts_sql,
    )
    from dblp_crawler_spark.sources.subtitles import webvtt_cues_sql

    base = ("CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || chr(31) "
            "|| CAST(i // 3 AS VARCHAR)), 1, 15)) AS BIGINT)")
    frames = f"""(
        SELECT doc_id AS video_id, CAST(i AS INT) AS frame_idx,
               xor({base}, CAST(i % 3 AS BIGINT)) AS phash,
               CAST(i * 1000 AS BIGINT) AS ts_ms
        FROM documents, range(8) t(i)
    ) vx_frames"""
    sid = "CAST(doc_id AS VARCHAR)"
    vtt = (
        f"{_sql_str('WEBVTT||00:00.500 --> 00:01.200|open '.replace('|', chr(10)))}"
        f" || {sid} || "
        f"{_sql_str('||00:01.800 --> 00:03.300|bridge '.replace('|', chr(10)))}"
        f" || {sid} || CASE WHEN doc_id % 3 != 2 THEN "
        f"{_sql_str('||00:06.100 --> 00:07.000|close '.replace('|', chr(10)))}"
        f" || {sid} ELSE '' END || chr(10)"
    )
    files = f"(SELECT doc_id AS video_id, {vtt} AS vtt FROM documents) vx_files"
    seg_sql = scene_segments_sql(frames, max_hamming=10)
    cue_sql = webvtt_cues_sql(files)
    return scene_transcripts_sql(f"({seg_sql})", f"({cue_sql})")


def _frontier_admission_oracle() -> str:
    """DuckDB replay of q_frontier_admission: canonical_url_sql +
    url_trap_flags_sql is_trap + hash60 keying + MIN-url batch dedup
    + NOT IN seen — every stage of admit_candidates in SQL."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.functions.urlnorm import (
        canonical_url_sql,
        url_host_sql,
        url_trap_flags_sql,
    )

    trap = url_trap_flags_sql("url")["is_trap"]
    seen_url = (
        "'http://example' || (doc_id % 50) || '.org/path/' || (doc_id % 50) || '?a=1&b=2'"
    )
    return f"""
        WITH raw AS (
          SELECT unnest([
            'http://example' || (doc_id % 50) || '.org/path/' || (doc_id % 50) || '?b=2&a=1',
            'HTTP://EXAMPLE' || (doc_id % 50) || '.ORG:80/path/' || (doc_id % 50) || '/?a=1&b=2#frag',
            'http://example' || (doc_id % 50) || '.org/path/' || (doc_id % 50) || '#sec',
            'https://example' || (doc_id % 50) || '.org:443/other/' || (doc_id % 50),
            'https://example' || (doc_id % 50) || '.org/other/' || (doc_id % 50) || '?',
            'http://example' || (doc_id % 50) || '.org/a?PHPSESSID=x'
          ]) AS url FROM documents
        ), canon AS (
          SELECT {canonical_url_sql('url')} AS url FROM raw
        ), clean AS (
          SELECT url FROM canon WHERE NOT {trap}
        ), keyed AS (
          SELECT url, {H('url')} AS seen_key FROM clean
        ), batch AS (
          SELECT seen_key, MIN(url) AS url FROM keyed GROUP BY seen_key
        ), seen AS (
          SELECT DISTINCT {H(seen_url)} AS seen_key
          FROM documents WHERE (doc_id % 50) % 4 = 0
        )
        SELECT b.url, {url_host_sql('b.url')} AS host, b.seen_key
        FROM batch b
        WHERE b.seen_key NOT IN (SELECT seen_key FROM seen)
    """


def _redirect_oracle(max_hops: int = 12) -> str:
    """DuckDB replay of q_redirect_resolve: recursive CTE bounded at
    max_hops over the identical planted chain+cycle map; the furthest
    row per src (max_by over hops) IS the linear walk's outcome."""
    return f"""
        WITH RECURSIVE rmap AS (
          SELECT doc_id AS src, doc_id - 1 AS dst FROM documents WHERE doc_id % 10 <> 0
          UNION ALL
          SELECT doc_id AS src, doc_id + 9 AS dst FROM documents WHERE doc_id % 20 = 0
        ), walk AS (
          SELECT src, dst AS cur, 1 AS hops FROM rmap
          UNION ALL
          SELECT w.src, m.dst, w.hops + 1
          FROM walk w JOIN rmap m ON w.cur = m.src
          WHERE w.hops < {max_hops}
        ), fin AS (
          SELECT src, max_by(cur, hops) AS final, MAX(hops) AS hops
          FROM walk GROUP BY src
        )
        SELECT f.src, f.final, CAST(f.hops AS INT) AS hops,
               m.src IS NULL AS resolved
        FROM fin f LEFT JOIN rmap m ON f.final = m.src
    """


def _line_dedup_oracle() -> str:
    """DuckDB replay of q_line_dedup: identical planted 4-line pages,
    hash60 line hashes, corpus count >= 5, reassembly via
    string_agg(line, chr(10) ORDER BY pos)."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    return f"""
        WITH planted AS (
          SELECT doc_id,
                 'id: ' || doc_id || chr(10) || 'COMMON FOOTER' || chr(10)
                 || text || chr(10) || 'lang: ' || lang AS text
          FROM documents
        ), lines AS (
          SELECT doc_id,
                 unnest(string_split(text, chr(10))) AS line,
                 generate_subscripts(string_split(text, chr(10)), 1) AS pos
          FROM planted
        ), hashed AS (
          SELECT doc_id, pos, line, {H('line')} AS lh FROM lines
        ), common AS (
          SELECT lh FROM hashed GROUP BY lh HAVING COUNT(*) >= 5
        ), kept AS (
          SELECT * FROM hashed WHERE lh NOT IN (SELECT lh FROM common)
        ), agg AS (
          SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
                 COUNT(*) AS n_kept
          FROM kept GROUP BY doc_id
        ), tot AS (
          SELECT doc_id, COUNT(*) AS total FROM lines GROUP BY doc_id
        )
        SELECT t.doc_id,
               COALESCE(a.text, '') AS text,
               CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(t.total - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
        FROM tot t LEFT JOIN agg a USING (doc_id)
    """


def _robots_parse_oracle() -> str:
    """DuckDB replay of q_robots_parse: identical planted robots.txt
    variants (newlines via chr(10)), then the full windowed group
    parse from webparse.parse_robots_sql over a CTE named
    robots_pages."""
    from dblp_crawler_spark.sources.webparse import parse_robots_sql

    cases = []
    for i, v in enumerate(_ROBOTS_VARIANTS):
        lit = " || chr(10) || ".join(
            "'" + part.replace("'", "''") + "'" for part in v.split("\n")
        )
        cases.append(f"WHEN doc_id % 6 = {i} THEN {lit}")
    body = parse_robots_sql("robots_pages").strip()
    assert body.upper().startswith("WITH")
    return f"""
        WITH robots_pages AS (
          SELECT 'h' || doc_id || '.org' AS host,
                 CASE {' '.join(cases)} END AS robots_txt
          FROM documents WHERE doc_id < 24
        ), {body[len('WITH '):]}
    """


def _mixture_interleave_oracle() -> str:
    """DuckDB replay of q_mixture_interleave
    (mixture_interleave_sql over the documents table)."""
    from dblp_crawler_spark.operators.textstats import mixture_interleave_sql

    return mixture_interleave_sql("documents", {"src0": 4, "src1": 2}, seed=17)


def _warc_layout_oracle() -> str:
    """DuckDB replay of q_warc_cdx_layout: the same synthetic fetch
    records (port/query variety, hash60 digest) through
    warc_layout_sql — SURT, exact record bytes, exclusive prefix,
    DIV placement."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.operators.archive import warc_layout_sql

    src = f"""(
        SELECT 'https://www.' || source || '.example.org'
                 || CASE WHEN doc_id % 11 = 0 THEN ':8443' ELSE '' END
                 || '/docs/' || CAST(doc_id AS VARCHAR)
                 || CASE WHEN doc_id % 7 = 0 THEN '?a=2&b=1' ELSE '' END AS url,
               CAST(1700000000 + doc_id * 37 AS BIGINT) AS ts,
               'text/plain' AS mime,
               {H('text')} AS digest,
               text AS payload
        FROM documents
    )"""
    return warc_layout_sql(src, target_bytes=1 << 16)


def _warc_revisit_oracle() -> str:
    """DuckDB replay of q_warc_revisit_dedup: the same planted
    leader-text duplicates (self-join on the group of 4) through
    warc_revisit_layout_sql — same election, stubs, placement."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.operators.archive import warc_revisit_layout_sql

    src = f"""(
        SELECT 'https://www.' || d.source || '.example.org/docs/'
                 || CAST(d.doc_id AS VARCHAR) AS url,
               CAST(1700000000 + d.doc_id * 37 AS BIGINT) AS ts,
               'text/plain' AS mime,
               {H('l.text')} AS digest,
               l.text AS payload
        FROM documents d
        JOIN documents l ON l.doc_id = d.doc_id - d.doc_id % 4
    )"""
    return warc_revisit_layout_sql(src, target_bytes=1 << 16)


def _fingerprint_oracle() -> str:
    """DuckDB replay of q_dataset_fingerprint — the identical audit
    over the documents table's value columns."""
    from dblp_crawler_spark.operators.audit import table_fingerprint_sql

    return table_fingerprint_sql(
        "documents",
        columns=["doc_id", "text", "lang", "n_chars"],
        group_cols=["source"],
    )


def _exif_oracle() -> str:
    """DuckDB replay of q_exif_orientation: the same planted payload
    hex (shared constants) through exif_orientation_sql's staged
    walk + IFD reads; fmt re-derived from the shared MAGIC_TABLE."""
    from dblp_crawler_spark.operators.sniff import (
        exif_orientation_sql,
        sniff_case_sql,
    )

    o = "(doc_id % 8 + 1)"
    src = f"""(
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN '{_EXIF_JPEG_PREFIX}' || printf('%02X00', {o}) || '{_EXIF_SUFFIX}'
                    WHEN doc_id % 3 = 1
                    THEN '{_EXIF_TIFF_PREFIX}' || printf('00%02X', {o}) || '{_EXIF_SUFFIX}'
                    ELSE '{_EXIF_PNG}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} eo_src)"
    return exif_orientation_sql(staged)


def _frontier_aging_oracle() -> str:
    """DuckDB replay of q_frontier_aging: the same synthetic frontier
    (priority_col arithmetic inlined: ccf_weight<<48 + year<<32 +
    (2^16 - depth)) through aging_order_sql."""
    from dblp_crawler_spark.operators.scheduler import aging_order_sql

    w = "CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 0 END"
    src = f"""(
        SELECT 'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.org/p/'
                 || CAST(doc_id AS VARCHAR) AS url,
               CAST({w} AS BIGINT) * {1 << 48}
                 + CAST(1990 + doc_id % 30 AS BIGINT) * {1 << 32}
                 + CAST({1 << 16} - doc_id % 5 AS BIGINT) AS priority,
               doc_id % 17 AS enqueue_wave
        FROM documents
    )"""
    return aging_order_sql(src, current_wave=20)


def _jpeg_quality_oracle() -> str:
    """DuckDB replay of q_jpeg_quality: the same libjpeg-formula
    tables (list_reduce hex concat over the shared base table), same
    walk + estimator via jpeg_quality_sql."""
    from dblp_crawler_spark.operators.sniff import (
        DQT_BASE,
        jpeg_quality_sql,
        sniff_case_sql,
    )

    base_list = "[" + ",".join(map(str, DQT_BASE)) + "]"
    q = "(doc_id % 19 * 5 + 5)"
    s = f"CASE WHEN {q} < 50 THEN 5000 // {q} ELSE 200 - 2 * {q} END"
    tbl = (
        f"list_reduce(list_transform(range(0, 64), i -> printf('%02X', "
        f"LEAST(255, GREATEST(1, ({base_list}[i + 1] * ({s}) + 50) // 100)))), "
        "(a, b) -> a || b)"
    )
    pq = "CASE WHEN doc_id % 7 = 0 THEN '10' ELSE '00' END"
    src = f"""(
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 4 THEN '{_EXIF_PNG}'
                    ELSE 'FFD8{_EXIF_APP0}FFDB0043' || {pq} || {tbl} END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} jq_src)"
    return jpeg_quality_sql(staged)


def _template_cap_oracle() -> str:
    """DuckDB replay of q_url_template_cap: the same synthetic URL
    mix through template_cap_sql's single-window form (provably
    equivalent to the engine's salted two-level rank)."""
    from dblp_crawler_spark.operators.frontier import template_cap_sql

    src = """(
        SELECT DISTINCT
               CASE WHEN doc_id % 2 = 0
                    THEN 'https://cal.example.org/archive/'
                         || CAST(2000 + doc_id % 20 AS VARCHAR)
                         || '/' || CAST(doc_id % 12 + 1 AS VARCHAR)
                    WHEN doc_id % 5 = 1
                    THEN 'https://img.example.org/obj/'
                         || md5(CAST(doc_id AS VARCHAR))
                         || '?size=big&v=' || CAST(doc_id AS VARCHAR)
                    ELSE 'https://h' || CAST(doc_id % 7 AS VARCHAR)
                         || '.org/page/' || CAST(doc_id AS VARCHAR) END AS url
        FROM documents
    )"""
    return template_cap_sql(src, max_per_template=20)


def _minhash_delta_oracle() -> str:
    """DuckDB replay of q_minhash_delta_dedup: planted leader texts,
    shingles (3-gram, short-text fallback, distinct), 16 hash60
    min-lanes, 8-band hashes over lane pairs, the new×old band
    probe, and the ≥12/16 lane-agreement verify."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    k, bands = 16, 8
    lanes = ", ".join(f"MIN({H('sh', i)}) AS h{i}" for i in range(k))
    r = k // bands
    band_hash = "CASE band " + " ".join(
        "WHEN {b} THEN {h}".format(
            b=b,
            h=H("(" + " || ',' || ".join(
                f"CAST(h{b * r + j} AS VARCHAR)" for j in range(r)
            ) + ")"),
        )
        for b in range(bands)
    ) + " END"
    agree = " + ".join(
        f"(CASE WHEN a.h{i} = o.h{i} THEN 1 ELSE 0 END)" for i in range(k)
    )
    return f"""
        WITH md_rec AS (
          SELECT d.doc_id,
                 CASE WHEN d.doc_id % 8 = 0 AND l.text IS NOT NULL
                      THEN l.text ELSE d.text END AS text
          FROM documents d LEFT JOIN documents l ON l.doc_id = d.doc_id + 1
        ), md_tk AS (
          SELECT doc_id, {_TOK} AS tk FROM md_rec
        ), md_sh0 AS (
          SELECT doc_id, list_distinct(
            CASE WHEN len(tk) >= 3 THEN
              list_transform(range(1, len(tk) - 1),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
            ELSE [array_to_string(tk, ' ')] END) AS shs
          FROM md_tk
        ), md_sig AS (
          SELECT doc_id, {lanes}
          FROM (SELECT doc_id, unnest(shs) AS sh FROM md_sh0)
          GROUP BY doc_id
        ), md_band AS (
          SELECT doc_id, band, {band_hash} AS band_hash
          FROM md_sig, (SELECT unnest(range(0, {bands})) AS band) bs
        ), md_cand AS (
          SELECT DISTINCT n.doc_id AS nid, o.doc_id AS oid
          FROM md_band n JOIN md_band o
            ON n.band = o.band AND n.band_hash = o.band_hash
          WHERE n.doc_id % 4 = 0 AND o.doc_id % 4 <> 0
        )
        SELECT c.nid AS doc_id, c.oid AS dup_of,
               CAST({agree} AS INT) AS agree_lanes
        FROM md_cand c
        JOIN md_sig a ON a.doc_id = c.nid
        JOIN md_sig o ON o.doc_id = c.oid
        WHERE {agree} >= 12
    """


def _charset_oracle() -> str:
    """DuckDB replay of q_charset_detect: the same planted BOM hex /
    markup through the BOM_TABLE CASE and the shared regexes."""
    from dblp_crawler_spark.operators.sniff import (
        bom_charset_sql,
        meta_charset_sql,
    )

    src = """(
        SELECT doc_id,
               CASE doc_id % 6
                 WHEN 0 THEN 'EFBBBF48'
                 WHEN 1 THEN 'FFFE0000'
                 WHEN 2 THEN 'FFFE4800'
                 ELSE '48544D4C' END AS bh,
               CASE doc_id % 6
                 WHEN 0 THEN '<meta charset="KOI8-R">' || text
                 WHEN 3 THEN '<html><head><meta charset=ISO-8859-1></head>' || text
                 WHEN 4 THEN '<meta http-equiv=''Content-Type'' content=''text/html; charset=Windows-1251''>' || text
                 WHEN 5 THEN '<?xml version=''1.0'' encoding=''UTF-8''?><root>' || text
                 ELSE text END AS html
        FROM documents
    )"""
    return f"""
        WITH cs0 AS (
          SELECT doc_id, {bom_charset_sql('bh')} AS bom,
                 {meta_charset_sql('html')} AS meta
          FROM {src} cs_src
        )
        SELECT doc_id, bom, meta, COALESCE(bom, meta, 'utf-8') AS charset
        FROM cs0
    """


def _politeness_timeline_oracle() -> str:
    """DuckDB replay of q_politeness_timeline: same synthetic wave,
    same rank + prefix-max closed form."""
    from dblp_crawler_spark.operators.scheduler import politeness_timeline_sql

    src = """(
        SELECT 'h' || CAST(doc_id % 9 AS VARCHAR) AS host,
               'https://h' || CAST(doc_id % 9 AS VARCHAR) || '.org/p/'
                 || CAST(doc_id AS VARCHAR) AS url,
               CAST(1700000000000000 + (doc_id * 37 % 50) * 1000000 AS BIGINT) AS ready_us
        FROM documents
    )"""
    return politeness_timeline_sql(src, delay_us=2500000)


def _politeness_parallel_oracle() -> str:
    """DuckDB replay of q_politeness_timeline_parallel: same wave,
    round-robin lanes, per-(host, lane) prefix max."""
    from dblp_crawler_spark.operators.scheduler import (
        politeness_timeline_parallel_sql,
    )

    src = """(
        SELECT 'h' || CAST(doc_id % 9 AS VARCHAR) AS host,
               'https://h' || CAST(doc_id % 9 AS VARCHAR) || '.org/p/'
                 || CAST(doc_id AS VARCHAR) AS url,
               CAST(1700000000000000 + (doc_id * 37 % 50) * 1000000 AS BIGINT) AS ready_us
        FROM documents
    )"""
    return politeness_timeline_parallel_sql(src, nconn=2, delay_us=2500000)


def _script_profile_oracle() -> str:
    """DuckDB replay of q_script_profile: the same planted
    multilingual texts through script_profile_sql (RE2 spellings,
    'g' flag, same tie-break)."""
    from dblp_crawler_spark.operators.textstats import script_profile_sql

    src = """(
        SELECT doc_id,
               CASE doc_id % 5
                 WHEN 1 THEN text || ' Привет мир'
                 WHEN 2 THEN text || ' 汉字文本与 данные'
                 WHEN 3 THEN 'مرحبا بالعالم'
                 WHEN 4 THEN 'Ελληνικά ' || text
                 ELSE text END AS text
        FROM documents
    )"""
    return script_profile_sql(src)


def _robots_availability_oracle() -> str:
    """DuckDB replay of q_robots_availability: the same synthetic
    per-host fetch log through robots_availability_sql."""
    from dblp_crawler_spark.operators.scheduler import robots_availability_sql

    src = """(
        SELECT 'h' || CAST(doc_id % 30 AS VARCHAR) AS host,
               CAST(1700000000000000 + (doc_id // 30) * 259200000000 AS BIGINT) AS ts_us,
               CAST(CASE doc_id % 30 % 5
                 WHEN 0 THEN 200
                 WHEN 1 THEN CASE WHEN doc_id // 30 < 8 THEN 200 ELSE 404 END
                 WHEN 2 THEN CASE WHEN doc_id // 30 < 14 THEN 200 ELSE 503 END
                 WHEN 3 THEN 503
                 ELSE CASE WHEN (doc_id // 30) % 2 = 0 THEN 200 ELSE 500 END
               END AS INT) AS status
        FROM documents
    )"""
    return robots_availability_sql(src)


def _registrable_domain_oracle() -> str:
    """DuckDB replay of q_registrable_domain: the same planted hosts
    and the default suffix dim through registrable_domain_sql."""
    from dblp_crawler_spark.operators.frontier import (
        DEFAULT_PUBLIC_SUFFIXES,
        registrable_domain_sql,
    )

    psl = "(SELECT unnest([" + ", ".join(
        f"'{s}'" for s in DEFAULT_PUBLIC_SUFFIXES
    ) + "]) AS suffix)"
    src = """(
        SELECT CASE doc_id % 5
                 WHEN 0 THEN 'www.site' || CAST(doc_id AS VARCHAR) || '.co.uk'
                 WHEN 1 THEN 'a.b.site' || CAST(doc_id AS VARCHAR) || '.com.au'
                 WHEN 2 THEN 'site' || CAST(doc_id AS VARCHAR) || '.example.org'
                 WHEN 3 THEN 'deep.x.site' || CAST(doc_id AS VARCHAR) || '.ac.uk'
                 ELSE 'host' || CAST(doc_id AS VARCHAR) END AS host
        FROM documents
    )"""
    return registrable_domain_sql(src, psl)


def _search_phrase_oracle() -> str:
    """DuckDB replay of q_index_search_phrase — zipped unnest
    positions, same anchor aggregation and top-k."""
    from dblp_crawler_spark.operators.invindex import search_phrase_sql

    return search_phrase_sql("documents", ["key", "order"], k=20)


def _jpeg_structure_oracle() -> str:
    """DuckDB replay of q_jpeg_structure: the same planted SOF
    variants through jpeg_structure_sql."""
    from dblp_crawler_spark.operators.sniff import (
        jpeg_structure_sql,
        sniff_case_sql,
    )

    h4 = "printf('%04X', doc_id % 900 + 100)"
    w4 = "printf('%04X', (doc_id * 7) % 900 + 100)"

    def sof3(marker, hv):
        return (f"'{marker}001108' || {h4} || {w4} || "
                f"'0301{hv}00021101031101'")

    def sofg(marker):
        return f"'{marker}000B08' || {h4} || {w4} || '01011100'"

    src = f"""(
        SELECT doc_id,
               CASE doc_id % 5
                 WHEN 0 THEN 'FFD8{_EXIF_APP0}' || {sof3('FFC0', '22')}
                 WHEN 1 THEN 'FFD8{_EXIF_APP0}' || {sof3('FFC2', '11')}
                 WHEN 2 THEN 'FFD8{_EXIF_APP0}{_EXIF_APP0}' || {sof3('FFC0', '21')}
                 WHEN 3 THEN 'FFD8{_EXIF_APP0}' || {sofg('FFC2')}
                 ELSE '{_EXIF_PNG}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} js_src)"
    return jpeg_structure_sql(staged)


def _bomb_gate_oracle() -> str:
    """DuckDB replay of q_image_bomb_gate: same planted PNG hex,
    same dims parse and integer cross-multiplied gates."""
    from dblp_crawler_spark.operators.sniff import image_bomb_gate_sql

    png_pre = "89504E470D0A1A0A0000000D49484452"
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN '{png_pre}' || printf('%08X', doc_id % 60 + 20)
                             || '00000032' || '0806000000'
                 WHEN 1 THEN '{png_pre}' || '0000753000007530' || '0806000000'
                 WHEN 2 THEN '{png_pre}' || '00000BB800000BB8' || '0806000000'
                 ELSE 'DEADBEEF00112233' END AS h
        FROM documents
    )"""
    return image_bomb_gate_sql(src)


def _sitemap_hints_oracle() -> str:
    """DuckDB replay of q_sitemap_scheduling_hints: same planted
    XML, same validation/clamp/default/mapping."""
    from dblp_crawler_spark.sources.webparse import sitemap_entries_full_sql

    cf = "['daily', 'weekly', 'SOMETIMES', 'monthly', 'never', ''][doc_id % 6 + 1]"
    pr = "['0.8', '1.0', '2.5', '', '0.1', 'abc'][doc_id % 6 + 1]"
    src = f"""(
        SELECT 'h' || CAST(doc_id % 10 AS VARCHAR) AS host,
               '<urlset><url><loc>https://h' || CAST(doc_id % 10 AS VARCHAR)
                 || '.org/p/' || CAST(doc_id AS VARCHAR) || '</loc>'
                 || CASE WHEN doc_id % 3 = 0
                         THEN '<lastmod>2024-05-0' || CAST(doc_id % 9 + 1 AS VARCHAR)
                              || '</lastmod>' ELSE '' END
                 || CASE WHEN {cf} <> ''
                         THEN '<changefreq>' || {cf} || '</changefreq>' ELSE '' END
                 || CASE WHEN {pr} <> ''
                         THEN '<priority>' || {pr} || '</priority>' ELSE '' END
                 || '</url></urlset>' AS sitemap_xml
        FROM documents
    )"""
    return sitemap_entries_full_sql(src)


def _binary_hamming_oracle() -> str:
    """DuckDB replay of q_ann_binary_hamming."""
    from dblp_crawler_spark.operators.similarity import binary_hamming_topk_sql

    return binary_hamming_topk_sql("embeddings", "vec_id % 50 = 0", k=10)


def _png_structure_oracle() -> str:
    """DuckDB replay of q_png_structure."""
    from dblp_crawler_spark.operators.sniff import (
        png_structure_sql,
        sniff_case_sql,
    )

    pre = "89504E470D0A1A0A" + "0000000D49484452" + "0000004000000040"
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 5
                 WHEN 0 THEN '{pre}0806000000'
                 WHEN 1 THEN '{pre}0803000000'
                 WHEN 2 THEN '{pre}1000000001'
                 WHEN 3 THEN '{pre}0802000000'
                 ELSE 'FFD8{_EXIF_APP0}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} ps_src)"
    return png_structure_sql(staged)


def _webp_structure_oracle() -> str:
    """DuckDB replay of q_webp_structure."""
    from dblp_crawler_spark.operators.sniff import (
        sniff_case_sql,
        webp_structure_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_WEBP_CASES)
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 6{whens}
                 ELSE '89504E470D0A1A0A0000000D49484452' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} ws_src)"
    return webp_structure_sql(staged)


def _gif_structure_oracle() -> str:
    """DuckDB replay of q_gif_structure."""
    from dblp_crawler_spark.operators.sniff import (
        gif_structure_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_GIF_CASES)
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 6{whens}
                 ELSE '89504E470D0A1A0A0000000D49484452' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} gs_src)"
    return gif_structure_sql(staged)


def _exif_datetime_oracle() -> str:
    """DuckDB replay of q_exif_datetime."""
    from dblp_crawler_spark.operators.sniff import (
        exif_datetime_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_DTO_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 4{whens} ELSE '{_DTO_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} ed_src)"
    return exif_datetime_sql(staged)


def _soft404_oracle() -> str:
    """DuckDB replay of q_soft404_detect."""
    from dblp_crawler_spark.operators.hostdup import soft404_detect_sql

    src = """(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '/p/'
                 || CAST(doc_id AS VARCHAR) AS url,
               'h' || CAST(doc_id % 10 AS VARCHAR) AS host,
               CASE WHEN doc_id % 10 IN (3, 7) AND doc_id % 20 < 10
                    THEN 'tpl' || CAST(doc_id % 10 AS VARCHAR)
                    ELSE 'c' || CAST(doc_id AS VARCHAR) END AS content_hash
        FROM documents
    )"""
    return soft404_detect_sql(src)


def _mirror_hosts_oracle() -> str:
    """DuckDB replay of q_mirror_hosts."""
    from dblp_crawler_spark.operators.hostdup import mirror_host_pairs_sql

    src = """(
        SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) AS host,
               CASE WHEN doc_id % 20 IN (1, 11)
                    THEN 'm' || CAST(doc_id % 7 AS VARCHAR)
                    ELSE 'c' || CAST(doc_id AS VARCHAR) END AS content_hash
        FROM documents
    ) mh_src"""
    return mirror_host_pairs_sql(src)


def _isobmff_oracle() -> str:
    """DuckDB replay of q_isobmff_structure."""
    from dblp_crawler_spark.operators.sniff import (
        isobmff_structure_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_ISOBMFF_CASES)
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 6{whens}
                 ELSE '89504E470D0A1A0A0000000D49484452' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} ib_src)"
    return isobmff_structure_sql(staged)


def _image_role_oracle() -> str:
    """DuckDB replay of q_image_role."""
    from dblp_crawler_spark.operators.sniff import (
        image_dims_sql,
        image_role_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_ROLE_HEADERS)
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 6{whens} WHEN 4 THEN '{_PIXEL_HDR}'
                 ELSE 'FFD8FF' END AS h
        FROM documents
    )"""
    fmt, w, h = image_dims_sql("h")
    staged = (f"(SELECT doc_id, {fmt} AS fmt, CAST({w} AS INT) AS width, "
              f"CAST({h} AS INT) AS height FROM {src} ir_src)")
    return (f"SELECT doc_id, fmt, width, height, "
            f"{image_role_sql()} AS role FROM {staged} ir_d")


def _pdf_structure_oracle() -> str:
    """DuckDB replay of q_pdf_structure."""
    from dblp_crawler_spark.operators.sniff import (
        pdf_structure_sql,
        sniff_case_sql,
    )

    v17 = "255044462D312E370A"
    lin = v17.replace("312E37", "312E34") + "3C3C202F4C696E6561726973"
    lin_real = (v17.replace("312E37", "312E34")
                + "3C3C202F4C696E656172697A65642031203E3E")
    enc = v17.replace("312E37", "312E36") + "2F456E63727970742035"
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 5 WHEN 0 THEN '{v17}' WHEN 1 THEN '{lin_real}'
                 WHEN 2 THEN '{enc}' WHEN 3 THEN '{lin}'
                 ELSE '89504E470D0A1A0A0000000D49484452' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} pd_src)"
    return pdf_structure_sql(staged)


def _gzip_structure_oracle() -> str:
    """DuckDB replay of q_gzip_structure."""
    from dblp_crawler_spark.operators.sniff import (
        gzip_structure_sql,
        sniff_case_sql,
    )

    named = "1F8B0808" + "00CA9A65" + "0003" + "64756D702E7761726300" + "AB"
    unnamed = "1F8B0800" + "0094358D" + "0003" + "AB"
    zero_mt = "1F8B0808" + "00000000" + "0003" + "612E74787400"
    fextra = "1F8B080C" + "00A30959" + "0003" + "02000000"
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 5 WHEN 0 THEN '{named}' WHEN 1 THEN '{unnamed}'
                 WHEN 2 THEN '{zero_mt}' WHEN 3 THEN '{fextra}'
                 ELSE '89504E470D0A1A0A' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} gz_src)"
    return gzip_structure_sql(staged)


def _wav_structure_oracle() -> str:
    """DuckDB replay of q_wav_structure — same planted hex, same
    chunk-walk fragment."""
    from dblp_crawler_spark.operators.sniff import (
        sniff_case_sql,
        wav_structure_sql,
    )

    whens = " ".join(
        f"WHEN {i} THEN '{hx}'" for i, hx in enumerate(_WAV_CASES)
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 5 {whens}
                 ELSE 'FFD8FFE00000000000000000' END AS h
        FROM documents
    )"""
    staged = (f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt"
              f" FROM {src} wv_src)")
    return wav_structure_sql(staged)


def _mp3_structure_oracle() -> str:
    """DuckDB replay of q_mp3_structure."""
    from dblp_crawler_spark.operators.sniff import (
        mp3_structure_sql,
        sniff_case_sql,
    )

    whens = " ".join(
        f"WHEN {i} THEN '{hx}'" for i, hx in enumerate(_MP3_CASES)
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 6 {whens}
                 ELSE '89504E470D0A1A0A0000000000000000' END AS h
        FROM documents
    )"""
    staged = (f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt"
              f" FROM {src} m3_src)")
    return mp3_structure_sql(staged)


def _id3_frames_oracle() -> str:
    """DuckDB replay of q_id3_text_frames."""
    from dblp_crawler_spark.operators.sniff import (
        id3_text_frames_sql,
        sniff_case_sql,
    )

    src = f"""(
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN '{_ID3_V23_HEX}'
                 WHEN 1 THEN '{_ID3_V24_HEX}'
                 ELSE '89504E470D0A1A0A' END AS h
        FROM documents
    ) id3_src"""
    staged = (f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt"
              f" FROM {src})")
    return id3_text_frames_sql(staged)


def _html_tables_oracle() -> str:
    """DuckDB replay of q_html_tables."""
    from dblp_crawler_spark.sources.webparse import html_tables_sql

    sid = "CAST(doc_id AS VARCHAR)"
    html = (
        f"'<table><tr><th>Key</th><th>Val &amp; unit</th></tr>"
        f"<tr><td><b>row' || {sid} || '</b></td><td>'"
        f" || CAST(doc_id % 97 AS VARCHAR) || ' &lt; 100</td></tr></table>'"
        f" || CASE WHEN doc_id % 3 = 0 THEN"
        f" '<table><tr><td>extra ' || {sid} || '</td></tr></table>'"
        f" ELSE '' END"
    )
    src = f"""(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/t/p'
                 || {sid} AS url,
               {html} AS html
        FROM documents
    ) ht_src"""
    return html_tables_sql(src)


def _code_blocks_oracle() -> str:
    """DuckDB replay of q_code_blocks."""
    from dblp_crawler_spark.sources.webparse import code_blocks_sql

    sid = "CAST(doc_id AS VARCHAR)"
    html = (
        f"CASE doc_id % 3"
        f" WHEN 0 THEN '<pre><code class=\"language-python\">def f'"
        f" || {sid} || '(x):' || chr(10) || '    return x &lt; ' || {sid}"
        f" || '</code></pre><p><code>inline</code></p>'"
        f" WHEN 1 THEN '<pre><code>SELECT ' || {sid}"
        f" || ' FROM t &amp;&amp; go</code></pre>'"
        f" ELSE '<p>no code here</p>' END"
    )
    src = f"""(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/c/p'
                 || {sid} AS url,
               {html} AS html
        FROM documents
    ) cb_src"""
    return code_blocks_sql(src)


def _table_markdown_oracle() -> str:
    """DuckDB replay of q_table_markdown — chains the html_tables
    oracle into the markdown renderer fragment."""
    from dblp_crawler_spark.sources.webparse import table_markdown_sql

    return table_markdown_sql(f"({_html_tables_oracle()})")


def _feed_enclosures_oracle() -> str:
    """DuckDB replay of q_feed_enclosures."""
    from dblp_crawler_spark.sources.webparse import feed_enclosures_sql

    sid = "CAST(doc_id AS VARCHAR)"
    dur = (
        f"CASE doc_id % 3"
        f" WHEN 0 THEN '<itunes:duration>1:0'"
        f" || CAST(doc_id % 6 AS VARCHAR) || ':03</itunes:duration>'"
        f" WHEN 1 THEN '<itunes:duration>'"
        f" || CAST((doc_id % 50) + 10 AS VARCHAR)"
        f" || ':30</itunes:duration>'"
        f" ELSE '' END"
    )
    enc = (
        f"CASE WHEN doc_id % 3 = 2 THEN"
        f" '<enclosure type=\"video/mp4\" url=\"https://cdn'"
        f" || CAST(doc_id % 5 AS VARCHAR) || '.ex/v' || {sid} || '.mp4\"/>'"
        f" ELSE '<enclosure url=\"https://cdn'"
        f" || CAST(doc_id % 5 AS VARCHAR) || '.ex/e' || {sid}"
        f" || '.mp3\" length=\"'"
        f" || CAST((doc_id % 900) * 1000 + 50000 AS VARCHAR)"
        f" || '\" type=\"audio/mpeg\"/>' END"
    )
    xml = (
        f"'<rss><channel><item><link>https://pod'"
        f" || CAST(doc_id % 10 AS VARCHAR) || '.ex/ep' || {sid}"
        f" || '</link>' || {enc} || {dur} || '</item>'"
        f" || '<item><link>https://pod.ex/none</link></item>'"
        f" || '</channel></rss>'"
    )
    src = f"""(
        SELECT 'pod' || CAST(doc_id % 10 AS VARCHAR) || '.ex' AS host,
               {xml} AS feed_xml
        FROM documents
    ) fe_src"""
    return feed_enclosures_sql(src)


def _caption_release_oracle() -> str:
    """DuckDB replay of q_pipeline_caption_release — chains
    caption_election_sql + the store join + image_dims_sql +
    image_role_sql + the keep-best window + webdataset_manifest_sql,
    end-to-end."""
    from dblp_crawler_spark.operators.archive import webdataset_manifest_sql
    from dblp_crawler_spark.operators.sniff import (
        image_dims_sql,
        image_role_sql,
        sniff_case_sql,
    )
    from dblp_crawler_spark.sources.webparse import caption_election_sql

    sid = "CAST(doc_id AS VARCHAR)"
    html = (
        f"'<figure><img src=\"/i/a' || {sid}"
        f" || '.jpg\"><figcaption>shared cap '"
        f" || CAST(doc_id % 23 AS VARCHAR) || '</figcaption></figure>'"
        f" || '<img src=\"/i/a' || {sid} || '.jpg\" alt=\"alt ' || {sid}"
        f" || '\">'"
        f" || '<img src=\"/i/b' || {sid} || '.jpg\" alt=\"banner alt '"
        f" || {sid} || '\">'"
    )
    pages = f"""(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/r/p'
                 || {sid} AS url,
               {html} AS html
        FROM documents
    ) rel_pages"""
    host = "'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org'"
    w_hex = ("upper(lpad(to_hex(CAST(200 + (doc_id % 7) * 100 AS BIGINT)),"
             " 8, '0'))")
    store = f"""(
        SELECT {host} || '/i/a' || {sid} || '.jpg' AS img_url,
               '{_REL_PNG_PRE}' || {w_hex} || '00000258' || '0802000000' AS h
        FROM documents WHERE doc_id % 5 <> 0
        UNION ALL
        SELECT {host} || '/i/b' || {sid} || '.jpg' AS img_url,
               '{_REL_PNG_PRE}' || '000002D8' || '0000005A' || '0802000000'
                 AS h
        FROM documents
    )"""
    elect = caption_election_sql(pages)
    fmt_case, w_sql, h_sql = image_dims_sql("h")
    role = image_role_sql("width", "height")
    manifest = webdataset_manifest_sql("rel_best", target_bytes=1 << 14,
                                       payload_hex_col="h")
    return f"""
        WITH rel_e AS ({elect}), rel_s AS (SELECT * FROM {store} st),
        rel_j AS (
          SELECT e.img_url, e.caption, s.h
          FROM rel_e e JOIN rel_s s USING (img_url)
        ), rel_f AS (
          SELECT *, {sniff_case_sql('h')} AS fmt FROM rel_j
        ), rel_d AS (
          SELECT img_url, caption, h, {w_sql} AS width, {h_sql} AS height
          FROM rel_f
        ), rel_r AS (
          SELECT *, {role} AS role FROM rel_d
        ), rel_g AS (
          SELECT regexp_extract(img_url, '/i/([ab]\\d+)\\.jpg', 1)
                   AS image_id,
                 caption, h,
                 CAST(width AS BIGINT) * height AS area
          FROM rel_r
          WHERE role = 'content' AND caption IS NOT NULL
        ), rel_k AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY caption
                 ORDER BY area DESC, image_id) AS rn
          FROM rel_g
        ), rel_best AS (
          SELECT image_id, h, caption FROM rel_k WHERE rn = 1
        )
        SELECT * FROM ({manifest}) rel_m
    """


def _audio_admission_oracle() -> str:
    """DuckDB replay of q_pipeline_audio_admission."""
    from dblp_crawler_spark.operators.sniff import (
        audio_admission_sql,
        sniff_case_sql,
    )

    all_cases = _WAV_CASES + _MP3_CASES + ["89504E470D0A1A0A"]
    whens = " ".join(f"WHEN {i} THEN '{hx}'"
                     for i, hx in enumerate(all_cases))
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(all_cases)} {whens}
                 ELSE 'FFD8FFE000000000' END AS h
        FROM documents
    ) aa_src"""
    staged = (f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt"
              f" FROM {src})")
    return audio_admission_sql(staged)


def _tar_structure_oracle() -> str:
    """DuckDB replay of q_tar_structure — identical stdlib-written
    tar fixtures."""
    from dblp_crawler_spark.operators.sniff import tar_structure_sql

    src = f"""(
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN '{_TAR_PAIR_HEX}'
                 WHEN 1 THEN '{_TAR_SINGLE_HEX}'
                 ELSE '89504E470D0A1A0A' END AS h
        FROM documents
    ) tar_src"""
    return tar_structure_sql(src)


def _zstd_structure_oracle() -> str:
    """DuckDB replay of q_zstd_structure."""
    from dblp_crawler_spark.operators.sniff import (
        sniff_case_sql,
        zstd_structure_sql,
    )

    whens = " ".join(f"WHEN {i} THEN '{hx}'"
                     for i, hx in enumerate(_ZSTD_CASES))
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 5 {whens}
                 ELSE '89504E470D0A1A0A00000000' END AS h
        FROM documents
    ) zs_src"""
    staged = (f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt"
              f" FROM {src})")
    return zstd_structure_sql(staged)


def _parquet_structure_oracle() -> str:
    """DuckDB replay of q_parquet_structure."""
    from dblp_crawler_spark.operators.sniff import (
        parquet_structure_sql,
        sniff_case_sql,
    )

    whens = " ".join(f"WHEN {i} THEN '{hx}'"
                     for i, hx in enumerate(_PQ_CASES))
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 4 {whens}
                 ELSE '89504E470D0A1A0A00000000' END AS h
        FROM documents
    ) pq_src"""
    staged = (f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt"
              f" FROM {src})")
    return parquet_structure_sql(staged)


def _zip_structure_oracle() -> str:
    """DuckDB replay of q_zip_structure — identical stdlib-written
    archives."""
    from dblp_crawler_spark.operators.sniff import (
        sniff_case_sql,
        zip_structure_sql,
    )

    trunc = _ZIP_REAL_HEX[: len(_ZIP_REAL_HEX) // 2 // 2 * 2]
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN '{_ZIP_REAL_HEX}'
                 WHEN 1 THEN '{_ZIP_TRICKY_HEX}'
                 WHEN 2 THEN '{trunc}'
                 ELSE '89504E470D0A1A0A' END AS h
        FROM documents
    ) zp_src"""
    staged = (f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt"
              f" FROM {src})")
    return zip_structure_sql(staged)


def _wds_manifest_oracle() -> str:
    """DuckDB replay of q_webdataset_manifest — same planted sizes,
    same member arithmetic."""
    from dblp_crawler_spark.operators.archive import webdataset_manifest_sql

    src = """(
        SELECT printf('img%07d', doc_id) AS image_id,
               repeat('58', CAST(100 + (doc_id % 7) * 137 AS INT)) AS h,
               'caption ' || CAST(doc_id AS VARCHAR) AS caption
        FROM documents
    ) wds_src"""
    return webdataset_manifest_sql(src, target_bytes=1 << 20)


def _image_harvest_oracle() -> str:
    """DuckDB replay of q_pipeline_image_harvest — chains the same
    fragments: extract_images_sql → store join → image_dims_sql →
    image_role_sql → admission filter."""
    from dblp_crawler_spark.operators.sniff import (
        image_dims_sql,
        image_role_sql,
    )
    from dblp_crawler_spark.sources.webparse import extract_images_sql

    sid = "CAST(doc_id AS VARCHAR)"
    host = "'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org'"
    html = (
        f"'<img srcset=\"s' || {sid} || '.jpg 320w, l' || {sid}"
        f" || '.jpg 1280w\" src=\"f' || {sid} || '.jpg\" alt=\"cap '"
        f" || CAST(doc_id % 5 AS VARCHAR) || '\">'"
        f" || '<img src=\"/i/' || {sid} || '.png\">'"
    )
    pages = (f"(SELECT {host} || '/g/p' || {sid} || '.html' AS url, "
             f"{html} AS html FROM documents) ih_pages")
    hero_whens = "".join(
        f" WHEN {i} THEN '{hx}'"
        for i, hx in enumerate(_ROLE_HEADERS[1:], start=1)
    )
    store = f"""(
        SELECT {host} || '/g/l' || {sid} || '.jpg' AS img_url,
               CASE doc_id % 4{hero_whens}
                 ELSE '{_ROLE_HEADERS[0]}' END AS h
        FROM documents
        UNION ALL
        SELECT {host} || '/i/' || {sid} || '.png' AS img_url,
               '{_PIXEL_HDR}' AS h
        FROM documents
    )"""
    fmt, w, h = image_dims_sql("h")
    return f"""
        WITH ih_x AS ({extract_images_sql(pages)}),
        ih_j AS (
          SELECT x.url, x.img_url, x.alt, s.h
          FROM ih_x x JOIN {store} s ON x.img_url = s.img_url
        ), ih_d AS (
          SELECT url, img_url, alt, {fmt} AS fmt,
                 CAST({w} AS INT) AS width, CAST({h} AS INT) AS height
          FROM ih_j
        )
        SELECT url, img_url, alt, width, height,
               {image_role_sql()} AS role
        FROM ih_d
        WHERE ({image_role_sql()}) = 'content' AND alt IS NOT NULL
    """


def _host_lang_profile_oracle() -> str:
    """DuckDB replay of q_host_language_profile — chains the
    text_lang_id classifier fragment into host_language_profile_sql."""
    from dblp_crawler_spark.operators.hostdup import host_language_profile_sql

    lang_case = f"""CASE
        WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 THEN 'zh'
        WHEN len({_TOK}) > 0 AND
             len(list_filter({_TOK}, t -> list_contains(['{SW_LIST}'], t)))::DOUBLE
             / len({_TOK}) >= 0.05 THEN 'en'
        ELSE 'unk' END"""
    src = (f"(SELECT 'h' || CAST(doc_id % 8 AS VARCHAR) AS host, "
           f"{lang_case} AS lang FROM documents)")
    return host_language_profile_sql(src)


def _hreflang_oracle() -> str:
    """DuckDB replay of q_hreflang_alternates."""
    from dblp_crawler_spark.sources.webparse import hreflang_alternates_sql

    sid = "CAST(doc_id AS VARCHAR)"
    html = (
        f"'<link rel=\"alternate\" hreflang=\"en\" href=\"/en/p' || {sid}"
        f" || '.html\">'"
        f" || '<link href=''/de/p' || {sid}"
        f" || '.html'' hreflang=''DE'' rel=''alternate''>'"
        f" || CASE WHEN doc_id % 3 = 0 THEN"
        f" '<link hreflang=fr href=../fr/p' || {sid} || '.html>'"
        f" ELSE '' END"
        f" || '<link rel=\"stylesheet\" href=\"/css/m.css\">'"
    )
    src = f"""(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/en/p'
                 || {sid} || '.html' AS url,
               {html} AS html
        FROM documents
    ) ha_src"""
    return hreflang_alternates_sql(src)


def _frontier_plan_oracle() -> str:
    """DuckDB replay of q_pipeline_frontier_plan — chains
    robots_decide_sql, the trap-flag fragment, and
    politeness_timeline_sql."""
    from dblp_crawler_spark.functions.urlnorm import url_trap_flags_sql
    from dblp_crawler_spark.operators.scheduler import (
        politeness_timeline_sql,
        robots_decide_sql,
    )

    sid = "CAST(doc_id AS VARCHAR)"
    host = "'h' || CAST(doc_id % 10 AS VARCHAR) || '.org'"
    path = f"""CASE doc_id % 4
        WHEN 0 THEN '/p/' || {sid}
        WHEN 1 THEN '/private/sec' || {sid}
        WHEN 2 THEN '/private/pub' || {sid}
        ELSE '/a/b/a/b/a/b/' || {sid} END"""
    trap = url_trap_flags_sql("c.url")["is_trap"]
    timeline = politeness_timeline_sql("fp_adm", delay_us=250000)
    return f"""
        WITH fp_cand AS (
          SELECT 'https://' || {host} || {path} AS url, {host} AS host,
                 CAST(doc_id % 5 * 100000 AS BIGINT) AS ready_us
          FROM documents
        ), fp_hosts AS (
          SELECT DISTINCT host FROM fp_cand
        ), fp_rules AS (
          SELECT host, 'disallow' AS rule, '/private' AS pattern FROM fp_hosts
          UNION ALL
          SELECT host, 'allow' AS rule, '/private/pub' AS pattern FROM fp_hosts
        ), fp_dec AS (
          {robots_decide_sql('(SELECT url FROM fp_cand)', 'fp_rules')}
        ), fp_adm AS (
          SELECT c.host, c.url, c.ready_us
          FROM fp_cand c JOIN fp_dec d ON c.url = d.url
          WHERE d.allowed AND NOT ({trap})
        )
        SELECT host, url, k, start_us, finish_us FROM ({timeline}) fp_tl
    """


def _caption_locale_oracle() -> str:
    """DuckDB replay of q_caption_locale_gate — chains the
    url_locale_hint and lang_id fragments over the caption."""
    from dblp_crawler_spark.functions.urlnorm import url_locale_hint_sql

    tokc = "regexp_extract_all(lower(caption), '[0-9a-z_]+')"
    lang_case = f"""CASE
        WHEN length(regexp_replace(caption, '[^一-鿿]', '', 'g')) > 0 THEN 'zh'
        WHEN len({tokc}) > 0 AND
             len(list_filter({tokc}, t -> list_contains(['{SW_LIST}'], t)))::DOUBLE
             / len({tokc}) >= 0.05 THEN 'en'
        ELSE 'unk' END"""
    hint = url_locale_hint_sql("page_url")["lang_hint"]
    return f"""
        WITH cl_src AS (
          SELECT doc_id,
                 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org'
                   || CASE doc_id % 3 WHEN 0 THEN '/en' WHEN 1 THEN '/de'
                      ELSE '' END
                   || '/img/' || CAST(doc_id AS VARCHAR) || '.html' AS page_url,
                 CASE WHEN doc_id % 7 = 0
                      THEN '图片说明 ' || substring(text, 1, 40)
                      ELSE substring(text, 1, 120) END AS caption
          FROM documents
        ), cl_s AS (
          SELECT doc_id, {hint} AS lang_hint, {lang_case} AS caption_lang
          FROM cl_src
        )
        SELECT doc_id, lang_hint, caption_lang,
               lang_hint IS NOT NULL AND caption_lang <> 'unk'
                 AND lang_hint <> caption_lang AS locale_mismatch
        FROM cl_s
    """


def _zorder_key_oracle() -> str:
    """DuckDB replay of q_zorder_key."""
    from dblp_crawler_spark.functions.zorder import morton_key_sql

    day = "CAST(floor(epoch(ts) / 86400) AS BIGINT)"
    return f"""
        SELECT event_id, user_id, {day} AS day,
               {morton_key_sql('user_id', day)} AS zkey
        FROM events
    """


def _zorder_stats_oracle() -> str:
    """DuckDB replay of q_zorder_file_stats."""
    from dblp_crawler_spark.functions.zorder import zorder_file_stats_sql

    src = ("(SELECT user_id % 512 AS a, event_id % 512 AS b FROM events) "
           "zf_src")
    return zorder_file_stats_sql(src, "a", "b", n_files=16,
                                 total="(SELECT COUNT(*) FROM events)")


def _url_resolve_oracle() -> str:
    """DuckDB replay of q_url_resolve."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url_sql

    sid = "CAST(doc_id AS VARCHAR)"
    base = (f"'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/a/b/page' "
            f"|| {sid} || '.html'")
    href = f"""CASE doc_id % 9
        WHEN 0 THEN 'x' || {sid} || '.html'
        WHEN 1 THEN '../up' || {sid} || '.html'
        WHEN 2 THEN '../../../root' || {sid} || '.html'
        WHEN 3 THEN '/abs/' || {sid}
        WHEN 4 THEN '//cdn.org/i' || {sid} || '.png'
        WHEN 5 THEN '?q=' || {sid}
        WHEN 6 THEN 'javascript:void(0)'
        WHEN 7 THEN 'a/./b/../c' || {sid} || '.html#f'
        ELSE '#frag' END"""
    return f"""
        WITH ur_src AS (
          SELECT doc_id, {base} AS base, {href} AS href FROM documents
        )
        SELECT doc_id, base, href,
               {resolve_url_sql('base', 'href')} AS resolved
        FROM ur_src
    """


def _outlinks_oracle() -> str:
    """DuckDB replay of q_extract_outlinks."""
    from dblp_crawler_spark.sources.webparse import extract_outlinks_sql

    sid = "CAST(doc_id AS VARCHAR)"
    html = (
        f"'<a href=\"n' || {sid} || '.html\">a</a>'"
        f" || '<a href=''/abs/' || CAST(doc_id % 7 AS VARCHAR) || '''>b</a>'"
        f" || '<a href=../up' || CAST(doc_id % 5 AS VARCHAR) || '>c</a>'"
        f" || '<a href=\"javascript:void(0)\">d</a>'"
        f" || '<a href=\"#x\">e</a>'"
    )
    src = f"""(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/dir/p'
                 || {sid} || '.html' AS url,
               {html} AS html
        FROM documents
    ) ol_src"""
    return extract_outlinks_sql(src)


def _images_oracle() -> str:
    """DuckDB replay of q_extract_images."""
    from dblp_crawler_spark.sources.webparse import extract_images_sql

    sid = "CAST(doc_id AS VARCHAR)"
    html = (
        f"'<img srcset=\"s' || {sid} || '.jpg 320w, l' || {sid}"
        f" || '.jpg 1280w\" src=\"f' || {sid} || '.jpg\" alt=\"cap '"
        f" || CAST(doc_id % 5 AS VARCHAR) || '\">'"
        f" || '<img src=\"/i/' || {sid} || '.png\">'"
        f" || CASE WHEN doc_id % 3 = 0"
        f" THEN '<img srcset=\"lo.png 1x, hi.png 2x\" alt=bare>'"
        f" ELSE '' END"
    )
    src = f"""(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/g/p'
                 || {sid} || '.html' AS url,
               {html} AS html
        FROM documents
    ) ei_src"""
    return extract_images_sql(src)


def _figure_captions_oracle() -> str:
    """DuckDB replay of q_figure_captions."""
    from dblp_crawler_spark.sources.webparse import figure_captions_sql

    sid = "CAST(doc_id AS VARCHAR)"
    html = (
        f"'<figure><img src=\"/i/f' || {sid} || '.jpg\" alt=\"alt\">"
        f"<figcaption>Figure ' || {sid} || ': a <b>bold</b>' || chr(10)"
        f" || '  claim</figcaption></figure>'"
        f" || CASE WHEN doc_id % 3 = 0 THEN"
        f" '<figure><img src=\"bare' || {sid} || '.png\"></figure>'"
        f" ELSE '' END"
        f" || '<figure><figcaption>orphan</figcaption></figure>'"
    )
    src = f"""(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/g/p'
                 || {sid} || '.html' AS url,
               {html} AS html
        FROM documents
    ) fc_src"""
    return figure_captions_sql(src)


def _caption_election_oracle() -> str:
    """DuckDB replay of q_caption_election — same planted HTML, the
    fragment chains figcaption/og/alt extraction + the election."""
    from dblp_crawler_spark.sources.webparse import caption_election_sql

    sid = "CAST(doc_id AS VARCHAR)"
    html = (
        f"'<meta property=\"og:image\" content=\"/i/two' || {sid}"
        f" || '.jpg\"><meta property=\"og:image:alt\" content=\"og cap '"
        f" || {sid} || '\">'"
        f" || '<figure><img src=\"/i/one' || {sid}"
        f" || '.jpg\"><figcaption>fig cap ' || {sid}"
        f" || '</figcaption></figure>'"
        f" || '<img src=\"/i/one' || {sid} || '.jpg\" alt=\"alt one '"
        f" || {sid} || '\">'"
        f" || '<img src=\"/i/two' || {sid} || '.jpg\" alt=\"alt two '"
        f" || {sid} || '\">'"
        f" || CASE WHEN doc_id % 2 = 0 THEN"
        f" '<img src=\"/i/three' || {sid} || '.jpg\" alt=\"alt three '"
        f" || {sid} || '\">' ELSE '' END"
        f" || '<img src=\"/i/four' || {sid} || '.jpg\">'"
    )
    src = f"""(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/c/p'
                 || {sid} AS url,
               {html} AS html
        FROM documents
    ) ce_src"""
    return caption_election_sql(src)


def _data_uri_oracle() -> str:
    """DuckDB replay of q_data_uri_images — to_base64 of the same
    planted PNG header bytes."""
    from dblp_crawler_spark.sources.webparse import data_uri_images_sql

    sid = "CAST(doc_id AS VARCHAR)"
    b64 = f"to_base64(from_hex('{_DU_PNG_HEX}'))"
    html = (
        f"'<img src=\"data:image/png;base64,' || {b64} || '\">'"
        f" || CASE WHEN doc_id % 2 = 0 THEN"
        f" '<img src=\"data:image/gif;base64,' || {b64} || '\">'"
        f" ELSE '' END"
        f" || '<img src=\"https://cdn.ex.org/r' || {sid} || '.jpg\">'"
    )
    src = f"""(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/d/p'
                 || {sid} AS url,
               {html} AS html
        FROM documents
    ) du_src"""
    return data_uri_images_sql(src)


def _lazyload_oracle() -> str:
    """DuckDB replay of q_lazyload_images."""
    from dblp_crawler_spark.sources.webparse import lazyload_images_sql

    sid = "CAST(doc_id AS VARCHAR)"
    html = (
        f"'<img src=\"ph.gif\" data-src=\"/real' || {sid} || '.jpg\">'"
        f" || CASE doc_id % 4"
        f" WHEN 0 THEN '<img loading=\"lazy\" "
        f"src=\"data:image/gif;base64,R0lGODlhAQABAA==\">'"
        f" WHEN 1 THEN '<img data-srcset=\"/s' || {sid}"
        f" || '.jpg 320w, /l' || {sid} || '.jpg 1280w\" src=\"ph.gif\">'"
        f" WHEN 2 THEN '<img src=\"/eager' || {sid}"
        f" || '.png\" loading=\"eager\">'"
        f" ELSE '' END"
    )
    src = f"""(
        SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.org/l/p'
                 || {sid} AS url,
               {html} AS html
        FROM documents
    ) lz_src"""
    return lazyload_images_sql(src)


def _url_locale_oracle() -> str:
    """DuckDB replay of q_url_locale_hint."""
    from dblp_crawler_spark.functions.urlnorm import url_locale_hint_sql

    frags = url_locale_hint_sql("url")
    sel = ", ".join(f"{e} AS {name}" for name, e in frags.items())
    return f"""
        WITH ul AS (
          SELECT doc_id,
                 CASE doc_id % 5
                   WHEN 0 THEN 'https://shop.example.de/de/p/' || CAST(doc_id AS VARCHAR)
                   WHEN 1 THEN 'https://example.com/pt-BR/x' || CAST(doc_id AS VARCHAR)
                   WHEN 2 THEN 'https://example.org/page' || CAST(doc_id AS VARCHAR) || '?hl=fr'
                   WHEN 3 THEN 'https://news.example.fr/en/a' || CAST(doc_id AS VARCHAR) || '?lang=es'
                   ELSE 'https://example.com/p/' || CAST(doc_id AS VARCHAR) END AS url
          FROM documents
        )
        SELECT doc_id, {sel} FROM ul
    """


def _embedding_quality_oracle() -> str:
    """DuckDB replay of q_embedding_quality — same planted
    corruptions (DuckDB lambdas index 1-based where Spark's are
    0-based: i=4 plants the same element as Spark's i==3)."""
    from dblp_crawler_spark.operators.similarity import embedding_quality_sql

    src = """(
        SELECT vec_id,
               CASE vec_id % 6
                 WHEN 1 THEN list_transform(e, (x, i) ->
                   CASE WHEN i = 4 THEN 'NaN'::DOUBLE ELSE x END)
                 WHEN 2 THEN list_transform(e, x -> 0.0::DOUBLE)
                 WHEN 3 THEN e[1:32]
                 WHEN 4 THEN list_transform(e, x -> x * 1000000)
                 ELSE e END AS embedding
        FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    )"""
    return embedding_quality_sql(src, dim=64)


def _warc_corpus_oracle() -> str:
    """DuckDB replay of q_pipeline_warc_to_corpus: the same planted
    segments, then the chained warc_records_sql → html_to_text_sql →
    gate → dedup — the composed-pipeline verification."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.sources.webparse import (
        html_to_text_sql,
        warc_records_sql,
    )

    crlf = "chr(13) || chr(10)"
    html = (
        "'<html><head><script>var x = 1;</script></head>"
        "<body><h1>Corpus &amp; page</h1><!-- b --><p>' || raw"
        " || '&nbsp;&lt;end&gt;</p></body></html>'"
    )
    return f"""
        WITH f AS (
          SELECT d.doc_id, CAST(d.doc_id % 40 AS VARCHAR) AS hh,
                 CAST(d.doc_id AS VARCHAR) AS did,
                 CASE WHEN d.doc_id % 7 = 3 THEN substring(l.text, 1, 10)
                      ELSE substring(l.text, 1, 120) END AS raw
          FROM documents d JOIN documents l ON l.doc_id = d.doc_id - d.doc_id % 4
        ), pages AS (
          SELECT doc_id, hh, did, {html} AS html FROM f
        ), recs AS (
          SELECT 'h' || hh || '.org' AS host,
                 'WARC/1.0' || {crlf} || 'WARC-Type: response' || {crlf}
                 || 'WARC-Target-URI: http://h' || hh || '.org/page/' || did || {crlf}
                 || 'Content-Length: ' || CAST(length(html)
                      + CASE WHEN doc_id % 9 = 0 THEN 5 ELSE 0 END AS VARCHAR)
                 || {crlf} || {crlf} || html || {crlf} || {crlf} AS rec
          FROM pages
        ), warc_segments AS (
          SELECT host, string_agg(rec, '' ORDER BY rec) AS warc
          FROM recs GROUP BY host
        ), parsed AS (
          {warc_records_sql()}
        ), txt AS (
          SELECT uri, {html_to_text_sql('body')} AS text
          FROM parsed WHERE NOT truncated AND rec_type = 'response'
        ), gated AS (
          SELECT uri, text, CAST(length(text) AS BIGINT) AS n_chars
          FROM txt WHERE length(text) >= 40
        )
        SELECT MIN(uri) AS uri, {H('text')} AS text_hash, MIN(n_chars) AS n_chars
        FROM gated GROUP BY text
    """


def _dsir_oracle() -> str:
    """DuckDB replay of q_dsir_importance: the lm_bits gram replay
    (word_ngrams incl. short-text fallback) bucketed with
    hash60 % 2^14, target = the doc_id % 13 slice of the SAME gram
    frame, then dsir_importance_sql's count/bits algebra."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.operators.textstats import dsir_importance_sql

    nb, seed = 1 << 14, 11
    body = dsir_importance_sql("", "", n_buckets=nb, seed=seed).strip()
    return f"""
        WITH g0 AS (
          SELECT doc_id,
            CASE WHEN len(tk) >= 2 THEN
              list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
            ELSE [array_to_string(tk, ' ')] END AS grams
          FROM (SELECT doc_id, {_TOK} AS tk FROM documents)
        ), dsir_rg AS (
          SELECT doc_id, {H('gram', seed)} % {nb} AS b
          FROM (SELECT doc_id, unnest(grams) AS gram FROM g0)
        ), dsir_tg AS (
          SELECT b FROM dsir_rg WHERE doc_id % 13 = 0
        ), {body}
    """


def _adaptive_delay_oracle() -> str:
    """DuckDB replay of q_adaptive_crawl_delay: identical planted
    log projection, then adaptive_crawl_delay_sql (rank-exact p95,
    order-free streak, shift/clamp arithmetic)."""
    from dblp_crawler_spark.operators.scheduler import adaptive_crawl_delay_sql

    body = adaptive_crawl_delay_sql("fetch_log").strip()
    assert body.upper().startswith("WITH")
    return f"""
        WITH fetch_log AS (
          SELECT 'h' || (user_id % 25) || '.org' AS host,
                 CAST(floor(value * 100) AS BIGINT) AS latency_ms,
                 event_type <> 'error' AS ok,
                 ts
          FROM events
        ), {body[len('WITH '):]}
    """


def _cache_policy_oracle() -> str:
    """DuckDB replay of q_cache_policy: identical planted header
    blocks (CRLF via chr(13)||chr(10)), then cache_policy_sql (same
    regexes, precedence, and difference-only date arithmetic)."""
    from dblp_crawler_spark.operators.freshness import cache_policy_sql

    cases = []
    for i, v in enumerate(_CACHE_HEADER_VARIANTS):
        lit = " || chr(13) || chr(10) || ".join(
            "'" + part.replace("'", "''") + "'" for part in v.split("\r\n")
        )
        cases.append(f"WHEN doc_id % 10 = {i} THEN {lit}")
    body = cache_policy_sql("responses").strip()
    return f"""
        WITH responses AS (
          SELECT 'http://h' || (doc_id % 10) || '.org/p/' || doc_id AS url,
                 CASE {' '.join(cases)} END AS headers
          FROM documents WHERE doc_id < 40
        )
        {body}
    """


def _html_meta_oracle() -> str:
    """DuckDB replay of q_html_meta_directives: identical planted
    HTML variants, then html_meta_directives_sql (same RE2 patterns,
    token tests, canonicalization)."""
    from dblp_crawler_spark.sources.webparse import html_meta_directives_sql

    cases = []
    for i, v in enumerate(_META_HTML_VARIANTS):
        lit = " || (doc_id % 6) || ".join(
            "'" + part.replace("'", "''") + "'" for part in v.split("{i}")
        )
        cases.append(f"WHEN doc_id % 6 = {i} THEN {lit}")
    body = html_meta_directives_sql("html_pages").strip()
    return f"""
        WITH html_pages AS (
          SELECT 'http://h' || (doc_id % 6) || '.org/page/' || doc_id AS url,
                 CASE {' '.join(cases)} END AS html
          FROM documents WHERE doc_id < 36
        )
        {body}
    """


def _host_shard_oracle() -> str:
    """DuckDB replay of q_host_shard_assign: identical planted host
    list, identical hash60 rendezvous key and MAX fold
    (host_shards_sql)."""
    from dblp_crawler_spark.operators.scheduler import host_shards_sql

    body = host_shards_sql("shard_hosts", 8).strip()
    return f"""
        WITH shard_hosts AS (
          SELECT 'h' || (doc_id % 97) || '.example.org' AS host FROM documents
        )
        {body}
    """


def _robots_decide_oracle() -> str:
    """DuckDB replay of q_robots_decide: identical planted robots
    variants and path cases, then parse_robots_rules_sql (group
    windows + rule regex) feeding robots_decide_sql (regex build +
    MAX-key precedence fold)."""
    from dblp_crawler_spark.operators.scheduler import robots_decide_sql
    from dblp_crawler_spark.sources.webparse import parse_robots_rules_sql

    cases = []
    for i, v in enumerate(_ROBOTS_RULE_VARIANTS):
        lit = " || chr(10) || ".join(
            "'" + part.replace("'", "''") + "'" for part in v.split("\n")
        )
        cases.append(f"WHEN doc_id % 6 = {i} THEN {lit}")
    pcases = " ".join(
        f"WHEN doc_id // 6 = {i} THEN '{p}'"
        for i, p in enumerate(_ROBOTS_RULE_PATHS)
    )
    rules = parse_robots_rules_sql("robots_pages").strip()
    decide = robots_decide_sql("cand_urls", "robots_rules").strip()
    assert decide.upper().startswith("WITH")
    return f"""
        WITH robots_pages AS (
          SELECT 'h' || doc_id || '.org' AS host,
                 CASE {' '.join(cases)} END AS robots_txt
          FROM documents WHERE doc_id < 6
        ), cand_urls AS (
          SELECT 'http://h' || (doc_id % 6) || '.org' ||
                 CASE {pcases} END AS url
          FROM documents WHERE doc_id < 48
        ), robots_rules AS ({rules}),
        {decide[len('WITH '):]}
    """


def _sitemap_discover_oracle() -> str:
    """DuckDB replay of q_sitemap_discover: identical planted per-host
    urlset XML (string_agg ORDER BY blk == Spark's sort_array concat),
    webparse.sitemap_entries_sql for the parse, NOT IN for the
    canonical seen-set anti-join."""
    from dblp_crawler_spark.sources.webparse import sitemap_entries_sql

    ent = sitemap_entries_sql("sitemap_pages").strip()
    return f"""
        WITH blks AS (
          SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.org' AS host,
                 '<url><loc>HTTP://H' || CAST(doc_id % 40 AS VARCHAR)
                 || '.ORG:80/page/' || CAST(doc_id AS VARCHAR) || '/#frag</loc>'
                 || CASE WHEN doc_id % 5 <> 0 THEN
                      '<lastmod>2024-' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
                      || '-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '</lastmod>'
                    ELSE '' END
                 || '</url>' AS blk
          FROM documents
        ), sitemap_pages AS (
          SELECT host, '<urlset>' || string_agg(blk, '' ORDER BY blk) || '</urlset>' AS sitemap_xml
          FROM blks GROUP BY host
        ), ent AS (
          {ent}
        )
        SELECT url, host, lastmod FROM ent
        WHERE url NOT IN (
          SELECT 'http://h' || CAST(doc_id % 40 AS VARCHAR) || '.org/page/'
                 || CAST(doc_id AS VARCHAR)
          FROM documents WHERE doc_id % 3 = 0
        )
    """


def _robots_sitemaps_oracle() -> str:
    """DuckDB replay of q_robots_sitemap_lines: identical planted
    robots.txt variants (newlines via chr(10)), then
    webparse.robots_sitemaps_sql."""
    from dblp_crawler_spark.sources.webparse import robots_sitemaps_sql

    hh = "CAST(doc_id % 40 AS VARCHAR)"
    nl = "chr(10)"
    v0 = (f"'User-agent: *' || {nl} || 'Disallow: /x' || {nl} || "
          f"'Sitemap: HTTP://H' || {hh} || '.ORG:80/sitemap0.xml' || {nl}")
    v1 = (f"'Sitemap: http://h' || {hh} || '.org/sm_a.xml' || {nl} || "
          f"'User-agent: *' || {nl} || "
          f"'sitemap: http://h' || {hh} || '.org/sm_b.xml#frag' || {nl}")
    v2 = (f"'# no declarations here' || {nl} || 'User-agent: *' || {nl} || "
          f"'Disallow: /' || {nl}")
    v3 = f"'SITEMAP:http://h' || {hh} || '.org/deep/sm.xml  ' || {nl}"
    body = robots_sitemaps_sql("robots_pages").strip()
    return f"""
        WITH robots_pages AS (
          SELECT 'h' || {hh} || '.org' AS host,
                 CASE WHEN doc_id % 4 = 0 THEN {v0}
                      WHEN doc_id % 4 = 1 THEN {v1}
                      WHEN doc_id % 4 = 2 THEN {v2}
                      ELSE {v3} END AS robots_txt
          FROM documents WHERE doc_id < 40
        )
        {body}
    """


def _fetch_plan_oracle() -> str:
    """DuckDB replay of q_fetch_plan: the shared planted urlsets
    (same CTEs as the discover oracle), sitemap_entries_sql, then
    the state left join and action CASE."""
    from dblp_crawler_spark.sources.webparse import sitemap_entries_sql

    ent = sitemap_entries_sql("sitemap_pages").strip()
    return f"""
        WITH blks AS (
          SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.org' AS host,
                 '<url><loc>HTTP://H' || CAST(doc_id % 40 AS VARCHAR)
                 || '.ORG:80/page/' || CAST(doc_id AS VARCHAR) || '/#frag</loc>'
                 || CASE WHEN doc_id % 5 <> 0 THEN
                      '<lastmod>2024-' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
                      || '-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '</lastmod>'
                    ELSE '' END
                 || '</url>' AS blk
          FROM documents
        ), sitemap_pages AS (
          SELECT host, '<urlset>' || string_agg(blk, '' ORDER BY blk) || '</urlset>' AS sitemap_xml
          FROM blks GROUP BY host
        ), ent AS (
          {ent}
        ), state AS (
          SELECT 'http://h' || CAST(doc_id % 40 AS VARCHAR) || '.org/page/'
                 || CAST(doc_id AS VARCHAR) AS url,
                 CAST('2024-06-15' AS DATE) AS last_fetch
          FROM documents WHERE doc_id % 3 = 0
        )
        SELECT e.url, e.lastmod, s.last_fetch,
               CASE WHEN s.last_fetch IS NULL THEN 'fetch'
                    WHEN e.lastmod IS NULL THEN 'revalidate'
                    WHEN e.lastmod > s.last_fetch THEN 'fetch'
                    ELSE 'skip' END AS action
        FROM ent e LEFT JOIN state s ON e.url = s.url
    """


def _sitemap_index_oracle() -> str:
    """DuckDB replay of q_sitemap_index_expand: identical planted
    child urlsets + sitemapindex files, index parse via
    sitemap_index_urls_sql, canonical join against the page store,
    child parse via sitemap_entries_sql (lastmod projected out)."""
    from dblp_crawler_spark.sources.webparse import (
        sitemap_entries_sql,
        sitemap_index_urls_sql,
    )

    idx = sitemap_index_urls_sql("index_pages").strip()
    ent = sitemap_entries_sql("fetched").strip()
    return f"""
        WITH children AS (
          SELECT 'http://h' || CAST(doc_id % 40 AS VARCHAR) || '.org/sitemap'
                   || CAST(doc_id % 2 AS VARCHAR) || '.xml' AS url,
                 '<urlset>' || string_agg(
                   '<url><loc>HTTP://H' || CAST(doc_id % 40 AS VARCHAR)
                   || '.ORG:80/page/' || CAST(doc_id AS VARCHAR) || '/#f</loc></url>',
                   '' ORDER BY '<url><loc>HTTP://H' || CAST(doc_id % 40 AS VARCHAR)
                   || '.ORG:80/page/' || CAST(doc_id AS VARCHAR) || '/#f</loc></url>')
                 || '</urlset>' AS xml
          FROM documents GROUP BY 1
        ), index_pages AS (
          SELECT host, '<sitemapindex>' || string_agg(blk, '' ORDER BY blk) || '</sitemapindex>' AS sitemap_xml
          FROM (
            SELECT DISTINCT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.org' AS host,
                   '<sitemap><loc>HTTP://H' || CAST(doc_id % 40 AS VARCHAR)
                   || '.ORG:80/sitemap' || CAST(doc_id % 2 AS VARCHAR)
                   || '.xml</loc></sitemap>' AS blk
            FROM documents
          ) GROUP BY host
        ), idxu AS (
          {idx}
        ), fetched AS (
          SELECT i.host, c.xml AS sitemap_xml
          FROM idxu i JOIN children c ON i.sitemap_url = c.url
        ), ent AS (
          {ent}
        )
        SELECT host, url FROM ent
    """


def _warc_parse_oracle() -> str:
    """DuckDB replay of q_warc_parse: identical planted per-host WARC
    segments (CRLFs via chr(13)||chr(10); string_agg ORDER BY rec ==
    Spark's sort_array concat), then webparse.warc_records_sql."""
    from dblp_crawler_spark.sources.webparse import warc_records_sql

    crlf = "chr(13) || chr(10)"
    return f"""
        WITH f AS (
          SELECT CAST(doc_id % 40 AS VARCHAR) AS hh, CAST(doc_id AS VARCHAR) AS did,
                 substring(text, 1, 64) AS body,
                 length(substring(text, 1, 64))
                   + CASE WHEN doc_id % 9 = 0 THEN 5 ELSE 0 END AS cl
          FROM documents
        ), recs AS (
          SELECT 'h' || hh || '.org' AS host,
                 'WARC/1.0' || {crlf}
                 || 'WARC-Type: response' || {crlf}
                 || 'WARC-Target-URI: http://h' || hh || '.org/page/' || did || {crlf}
                 || 'Content-Length: ' || CAST(cl AS VARCHAR) || {crlf}
                 || {crlf} || body || {crlf} || {crlf} AS rec
          FROM f
        ), warc_segments AS (
          SELECT host, string_agg(rec, '' ORDER BY rec) AS warc
          FROM recs GROUP BY host
        )
        {warc_records_sql('warc_segments')}
    """


def _image_dims_oracle() -> str:
    """DuckDB replay of q_image_header_dims: identical printf-hex
    header construction (the hex string IS the 64-byte projection —
    all planted headers are shorter than 64 bytes), then the
    generated fmt/width/height expressions from sniff.image_dims_sql
    over the same offsets."""
    from dblp_crawler_spark.operators.sniff import image_dims_sql

    fmt, w, h = image_dims_sql("h")
    app0 = "FFE0" + "0010" + "4A46494600" + "00" * 9
    le2 = "printf('%02X%02X', {v} % 256, ({v} // 256) % 256)"
    le4 = ("printf('%02X%02X%02X%02X', {v} % 256, ({v} // 256) % 256, "
           "({v} // 65536) % 256, ({v} // 16777216) % 256)")
    return f"""
        WITH d AS (
          SELECT doc_id, doc_id % 900 + 100 AS w, (doc_id * 7) % 900 + 100 AS hh
          FROM documents
        ), p AS (
          SELECT doc_id,
            CASE
              WHEN doc_id % 4 = 0 THEN
                '89504E470D0A1A0A' || '0000000D49484452'
                || printf('%08X', w) || printf('%08X', hh) || '0806'
              WHEN doc_id % 4 = 1 THEN
                '474946383961' || {le2.format(v='w')} || {le2.format(v='hh')} || 'F70000'
              WHEN doc_id % 4 = 2 THEN
                '424D' || repeat('00', 16) || {le4.format(v='w')} || {le4.format(v='hh')} || repeat('00', 4)
              ELSE
                'FFD8' || '{app0}'
                || CASE WHEN doc_id % 8 = 7 THEN '{app0}' ELSE '' END
                || 'FFC0' || '0011' || '08' || printf('%04X', hh) || printf('%04X', w)
                || '03' || repeat('00', 9)
            END AS h
          FROM d
        )
        SELECT doc_id, {fmt} AS fmt, {w} AS width, {h} AS height FROM p
    """


def _html_text_oracle() -> str:
    """DuckDB replay of q_html_text_extract via html_to_text_sql
    over the identical planted markup."""
    from dblp_crawler_spark.sources.webparse import html_to_text_sql

    html = (
        "'<html><head><script>var x = 1;</script><style>.a{}</style></head>"
        "<body><h1>Doc &amp; ' || CAST(doc_id AS VARCHAR) || '</h1><!-- c --><p>'"
        " || text || '&nbsp;&lt;end&gt;</p></body></html>'"
    )
    t = html_to_text_sql(html)
    return f"""
        SELECT doc_id, {t} AS text, CAST(length({t}) AS BIGINT) AS n_chars
        FROM documents
    """


def _corpus_shuffle_oracle() -> str:
    """DuckDB replay of q_corpus_shuffle: one ROW_NUMBER over the
    identical portable permutation key — what the distributed
    two-pass prefix sum computes without a global window."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    return f"""
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY {H('doc_id', 17)} ASC, doc_id ASC) - 1 AS epoch_rank
        FROM documents
    """


def _lm_bits_oracle() -> str:
    """DuckDB replay of q_lm_bits_score: same bigrams (word_ngrams'
    short-text single-gram fallback included), hash60 gram hashes,
    corpus counts, and the per-doc mean of length(bin(count)) —
    bin() emits the identical binary literal in both engines, so
    the integer log2 is string-exact."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    return f"""
        WITH g0 AS (
          SELECT doc_id,
            CASE WHEN len(tk) >= 2 THEN
              list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
            ELSE [array_to_string(tk, ' ')] END AS grams
          FROM (SELECT doc_id, {_TOK} AS tk FROM documents)
        ), g AS (
          SELECT doc_id, {H('gram')} AS gh
          FROM (SELECT doc_id, unnest(grams) AS gram FROM g0)
        ), c AS (
          SELECT gh, COUNT(*) AS cnt FROM g GROUP BY gh
        )
        SELECT doc_id, COUNT(*) AS n_grams,
               CAST(SUM(length(bin(cnt))) AS BIGINT) AS sum_bits,
               ROUND(CAST(SUM(length(bin(cnt))) AS DOUBLE) / COUNT(*), 6) AS lm_bits
        FROM g JOIN c USING (gh) GROUP BY doc_id
    """


#: exact integer-L2 via the dot(a,a) − 2·dot(a,b) + dot(b,b) identity
#: (exact in double for fixed-point magnitudes)
_IVF_DIST = ("list_dot_product(b.qv, b.qv) - 2 * list_dot_product(b.qv, c.qc)"
             " + list_dot_product(c.qc, c.qc)")


def _ivf_assign_ctes(src: str, n_cells: int, seed: int, dim: int) -> str:
    """The shared CTE chain replaying ivf_index_quantized over
    relation `src`(vec_id, embedding): portable seeded init
    (smallest hash60(vec_id, seed)), one Lloyd round with exact
    integer-L2 argmin, floor-of-mean re-normalized centroids, final
    assignment. Ends with a2(vec_id, cell); raw(vec_id, e) and
    cents1(cell, qc) stay referencable. Cell membership is
    bit-identical to the Spark build — both the ANN probe oracle
    and the SemDeDup oracle build on this."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.operators.similarity import LSH_QUANT_SCALE

    dist = _IVF_DIST
    return f"""raw AS (
          SELECT vec_id, embedding::DOUBLE[] AS e,
                 -- l2 norm as the SAME left-to-right fold Spark runs
                 -- (identical partial sums -> identical quantized ints)
                 sqrt(list_reduce(list_prepend(0.0, list_transform(embedding::DOUBLE[], x -> x * x)),
                                  (a, b) -> a + b)) AS nrm
          FROM {src}
        ), base AS (
          SELECT vec_id, e,
                 list_transform(e, x -> floor(x / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END)
                                              * {float(LSH_QUANT_SCALE)!r})) AS qv
          FROM raw
        ), seeded AS (
          SELECT vec_id, qv,
                 ROW_NUMBER() OVER (ORDER BY {H('vec_id', seed)} ASC, vec_id ASC) AS rn
          FROM base
        ), cents0 AS (
          SELECT rn - 1 AS cell, qv AS qc FROM seeded WHERE rn <= {n_cells}
        ), a1 AS (
          SELECT vec_id, qv, cell FROM (
            SELECT b.vec_id, b.qv, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY {dist} ASC, c.cell ASC) AS rr
            FROM base b CROSS JOIN cents0 c
          ) WHERE rr = 1
        ), craw AS (
          SELECT cell, list(m ORDER BY i) AS qraw FROM (
            SELECT cell, i, CAST(floor(AVG(qv[i])) AS DOUBLE) AS m
            FROM a1 CROSS JOIN range(1, {dim + 1}) r(i)
            GROUP BY cell, i
          ) GROUP BY cell
        ), cents1 AS (
          -- re-normalize to unit fixed point (mirrors the Spark
          -- build; every value here is an exact small integer in
          -- double, so the fold and the floor replay bit-identically)
          SELECT cell,
                 list_transform(qraw, x -> floor(x / (CASE WHEN cn = 0 THEN 1.0 ELSE cn END)
                                              * {float(LSH_QUANT_SCALE)!r})) AS qc
          FROM (
            SELECT cell, qraw,
                   sqrt(list_reduce(list_prepend(0.0, list_transform(qraw, x -> x * x)),
                                    (a, b) -> a + b)) AS cn
            FROM craw
          )
        ), a2 AS (
          SELECT vec_id, cell FROM (
            SELECT b.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY {dist} ASC, c.cell ASC) AS rr
            FROM base b CROSS JOIN cents1 c
          ) WHERE rr = 1
        )"""


def _ann_pq_oracle() -> str:
    """DuckDB replay of q_ann_pq_adc's ENTIRE PQ pipeline: the
    shared fixed-point base quantization, subvector split, seeded
    codebook init, one Lloyd round (argmin = ORDER BY dist, c —
    exactly the int64 MIN-key fold), floor-of-mean update, encode,
    per-query distance tables, ADC sum, deterministic ranking.
    All-double arithmetic replays Spark's int64 exactly (every value
    < 2^53)."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.operators.similarity import LSH_QUANT_SCALE

    m, n_codes, seed, k, d_sub = 4, 8, 99, 10, 16

    def dist(a, b):
        return (
            f"list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
            f" + list_dot_product({b}, {b})"
        )

    return f"""
        WITH raw AS (
          SELECT vec_id, embedding::DOUBLE[] AS e,
                 sqrt(list_reduce(list_prepend(0.0, list_transform(embedding::DOUBLE[], x -> x * x)),
                                  (a, b) -> a + b)) AS nrm
          FROM embeddings
        ), base AS (
          SELECT vec_id,
                 list_transform(e, x -> floor(x / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END)
                                              * {float(LSH_QUANT_SCALE)!r})) AS qv
          FROM raw
        ), subs AS (
          SELECT vec_id, j, list_slice(qv, j * {d_sub} + 1, j * {d_sub} + {d_sub}) AS sv
          FROM base CROSS JOIN range({m}) t(j)
        ), seeded AS (
          SELECT vec_id, qv,
                 ROW_NUMBER() OVER (ORDER BY {H('vec_id', seed)} ASC, vec_id ASC) AS rn
          FROM base
        ), cb0 AS (
          SELECT j, rn - 1 AS c,
                 list_slice(qv, j * {d_sub} + 1, j * {d_sub} + {d_sub}) AS qcent
          FROM seeded CROSS JOIN range({m}) t(j) WHERE rn <= {n_codes}
        ), a1 AS (
          SELECT vec_id, j, c AS code, sv FROM (
            SELECT s.vec_id, s.j, c.c, s.sv,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j
                     ORDER BY {dist('s.sv', 'c.qcent')} ASC, c.c ASC) AS rr
            FROM subs s JOIN cb0 c ON s.j = c.j
          ) WHERE rr = 1
        ), cb1 AS (
          SELECT j, c, list(mv ORDER BY i) AS qcent FROM (
            SELECT j, code AS c, i, floor(AVG(sv[i])) AS mv
            FROM a1 CROSS JOIN range(1, {d_sub + 1}) r(i)
            GROUP BY j, code, i
          ) GROUP BY j, c
        ), a2 AS (
          SELECT vec_id, j, c AS code FROM (
            SELECT s.vec_id, s.j, c.c,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j
                     ORDER BY {dist('s.sv', 'c.qcent')} ASC, c.c ASC) AS rr
            FROM subs s JOIN cb1 c ON s.j = c.j
          ) WHERE rr = 1
        ), dt AS (
          SELECT q.vec_id AS q_id, q.j, c.c AS code,
                 {dist('q.sv', 'c.qcent')} AS d
          FROM subs q JOIN cb1 c ON q.j = c.j
          WHERE q.vec_id < 4
        ), scored AS (
          SELECT dt.q_id, a2.vec_id, CAST(SUM(dt.d) AS BIGINT) AS adc
          FROM a2 JOIN dt ON a2.j = dt.j AND a2.code = dt.code
          GROUP BY dt.q_id, a2.vec_id
        )
        SELECT q_id, vec_id, adc, CAST(rank AS INT) AS rank FROM (
          SELECT q_id, vec_id, adc,
                 ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc ASC, vec_id ASC) AS rank
          FROM scored
        ) WHERE rank <= {k}
    """


def _ann_ivf_oracle() -> str:
    """DuckDB replay of q_ann_ivf_topk's ENTIRE fixed-point IVF
    (the shared _ivf_assign_ctes chain) + nprobe-cell probe +
    float-cosine re-rank."""
    n_cells, seed, nprobe, k, dim = 8, 99, 4, 10, 64
    dist = _IVF_DIST
    return f"""
        WITH {_ivf_assign_ctes('embeddings', n_cells, seed, dim)}, probes AS (
          SELECT q_id, cell FROM (
            SELECT b.vec_id AS q_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY {dist} ASC, c.cell ASC) AS rr
            FROM base b CROSS JOIN cents1 c WHERE b.vec_id < 5
          ) WHERE rr <= {nprobe}
        ), cand AS (
          SELECT DISTINCT p.q_id, a.vec_id FROM probes p JOIN a2 a ON p.cell = a.cell
        ), scored AS (
          SELECT cand.q_id, cand.vec_id,
                 list_cosine_similarity(qe.e, ce.e) AS cosine,
                 ROW_NUMBER() OVER (PARTITION BY cand.q_id
                   ORDER BY list_cosine_similarity(qe.e, ce.e) DESC, cand.vec_id ASC) AS rank
          FROM cand
          JOIN base qe ON cand.q_id = qe.vec_id
          JOIN base ce ON cand.vec_id = ce.vec_id
        )
        SELECT q_id, vec_id, ROUND(cosine, 6) AS cosine, rank FROM scored WHERE rank <= {k}
    """


def _semdedup_oracle() -> str:
    """DuckDB replay of q_semdedup_drop_list: identical planted
    trios, the shared fixed-point-IVF assignment chain, in-cell
    cosine>=0.9 pairs, recursive-CTE transitive components, min-id
    representative drop list."""
    return f"""
        WITH RECURSIVE aug AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0
          UNION ALL
          SELECT vec_id + 2000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0
        ), {_ivf_assign_ctes('aug', 8, 99, 64)}, pairs AS (
          SELECT x.vec_id AS a, y.vec_id AS b
          FROM a2 x JOIN a2 y ON x.cell = y.cell AND x.vec_id < y.vec_id
          JOIN raw ex ON ex.vec_id = x.vec_id
          JOIN raw ey ON ey.vec_id = y.vec_id
          WHERE list_cosine_similarity(ex.e, ey.e) >= 0.9
        ), sym AS (
          SELECT a AS id, b AS nbr FROM pairs
          UNION
          SELECT b AS id, a AS nbr FROM pairs
        ), reach(id, comp) AS (
          SELECT id, id FROM sym
          UNION
          SELECT s.nbr, r.comp FROM reach r JOIN sym s ON s.id = r.id
          WHERE r.comp < s.nbr
        ), cc AS (
          SELECT id, MIN(comp) AS component FROM reach GROUP BY id
        )
        SELECT id AS vec_id, component AS keep_vec_id FROM cc WHERE id != component
    """


def _image_caption_oracle() -> str:
    """DuckDB replay of q_pipeline_image_caption: identical planted
    geometry, identical caption gates, identical bucket argmin, then
    the exact-integer per-bucket mix report (SUM cast BIGINT — DuckDB
    integer SUM is HUGEINT)."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.operators.multimodal import DEFAULT_ASPECT_BUCKETS

    vals = ", ".join(f"({i}, {bw}, {bh})" for i, (bw, bh) in enumerate(DEFAULT_ASPECT_BUCKETS))
    return f"""
        WITH pairs AS (
          SELECT doc_id,
                 CAST(256 + ({H('doc_id')} % 1024) AS INT) AS w,
                 CAST(256 + ({H('doc_id', 1)} % 1024) AS INT) AS h,
                 len(tk) AS n_cap,
                 CASE WHEN len(tk) > 0 THEN
                   len(list_filter(tk, t -> list_contains(['{SW_LIST}'], t)))::DOUBLE / len(tk)
                 ELSE 0.0 END AS swr
          FROM (SELECT doc_id, {_TOK} AS tk FROM documents)
        ), gated AS (
          SELECT * FROM pairs
          WHERE n_cap BETWEEN 5 AND 4096 AND swr >= 0.01
            AND w <= 4 * h AND h <= 4 * w
        ), scored AS (
          SELECT doc_id, n_cap, b.i, b.bw, b.bh,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY abs(w::DOUBLE / h::DOUBLE - bw::DOUBLE / bh::DOUBLE) ASC, b.i ASC) AS rn
          FROM gated CROSS JOIN (VALUES {vals}) b(i, bw, bh)
        )
        SELECT i AS bucket_id, bw AS target_w, bh AS target_h,
               COUNT(*) AS n_pairs,
               CAST(SUM(n_cap) AS BIGINT) AS total_caption_tokens,
               ROUND(SUM(n_cap)::DOUBLE / COUNT(*), 4) AS avg_caption_tokens
        FROM scored WHERE rn = 1
        GROUP BY i, bw, bh
    """


def _phash_dedup_oracle() -> str:
    """DuckDB replay of q_image_phash_dedup: identical planted
    phashes via hash60 (non-negative, so `>> 52` equals Spark's
    shiftrightunsigned(sh, 64-12)), identical block equi-join and
    xor/bit_count hamming verify."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    pid = "printf('img_%06d', doc_id)"
    return f"""
        WITH base AS (
          SELECT {pid} AS image_id, {H(pid)} AS phash FROM documents
        ), twins AS (
          SELECT {pid} || '_twin' AS image_id, xor({H(pid)}, 3) AS phash
          FROM documents WHERE doc_id % 8 = 0
        ), blocked AS (
          SELECT image_id, phash, phash >> 52 AS block
          FROM (SELECT * FROM base UNION ALL SELECT * FROM twins)
        )
        SELECT x.image_id AS a, y.image_id AS b,
               CAST(bit_count(xor(x.phash, y.phash)) AS INT) AS hamming
        FROM blocked x JOIN blocked y ON x.block = y.block
        WHERE x.image_id < y.image_id
          AND bit_count(xor(x.phash, y.phash)) <= 4
    """


def _hamming_pigeonhole_oracle() -> str:
    """DuckDB replay of q_dedup_hamming_pigeonhole: identical
    planted phashes (hash60 base + top-block and spread twins),
    identical block spans via hamming_block_spans, identical
    per-block equi-join + DISTINCT pair dedup."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.operators.dedup import hamming_near_dups_exact_sql

    pid = "printf('img_%06d', doc_id)"
    body = hamming_near_dups_exact_sql(
        "ph_all", "phash", "image_id", max_hamming=3, width=60
    ).strip()
    assert body.upper().startswith("WITH")
    return f"""
        WITH ph_all AS (
          SELECT {pid} AS image_id, {H(pid)} AS phash FROM documents
          UNION ALL
          SELECT {pid} || '_hi', xor({H(pid)}, {_PIGEON_HI}) FROM documents WHERE doc_id % 8 = 0
          UNION ALL
          SELECT {pid} || '_lo', xor({H(pid)}, {_PIGEON_LO}) FROM documents WHERE doc_id % 16 = 0
        ), {body[len('WITH '):]}
    """


def _phash_components_oracle() -> str:
    """DuckDB replay of q_image_phash_components: identical planted
    phashes (base + XOR-3 twin + XOR-60 twin2), identical blocked
    hamming pair join, then the same recursive min-reachable-id CTE
    used by dedup_components."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    pid = "printf('img_%06d', doc_id)"
    return f"""
        WITH RECURSIVE imgs AS (
          SELECT {pid} AS image_id, {H(pid)} AS phash FROM documents
          UNION ALL
          SELECT {pid} || '_twin', xor({H(pid)}, 3) FROM documents WHERE doc_id % 8 = 0
          UNION ALL
          SELECT {pid} || '_twin2', xor({H(pid)}, 60) FROM documents WHERE doc_id % 16 = 0
        ), blocked AS (
          SELECT image_id, phash, phash >> 52 AS block FROM imgs
        ), pairs AS (
          SELECT x.image_id AS a, y.image_id AS b
          FROM blocked x JOIN blocked y ON x.block = y.block
          WHERE x.image_id < y.image_id
            AND bit_count(xor(x.phash, y.phash)) <= 4
        ), sym AS (
          SELECT a AS id, b AS nbr FROM pairs
          UNION
          SELECT b AS id, a AS nbr FROM pairs
        ), reach(id, comp) AS (
          SELECT id, id FROM sym
          UNION
          SELECT s.nbr, r.comp FROM reach r JOIN sym s ON s.id = r.id
          WHERE r.comp < s.nbr
        )
        SELECT id AS image_id, MIN(comp) AS cluster_rep FROM reach GROUP BY id
    """


def _split_leakage_images_oracle() -> str:
    """DuckDB replay of q_split_leakage_images — the phash-components
    recursive CTE, the md5 hash_split, then the leakage rollup, all
    chained."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.operators.dedup import cluster_split_leakage_sql

    pid = "printf('img_%06d', doc_id)"
    threshold = f"{(10 * 0x10000) // 100:04x}"
    members = f"""(
        WITH RECURSIVE sli_imgs AS (
          SELECT {pid} AS image_id, {H(pid)} AS phash FROM documents
          UNION ALL
          SELECT {pid} || '_twin', xor({H(pid)}, 3) FROM documents WHERE doc_id % 8 = 0
          UNION ALL
          SELECT {pid} || '_twin2', xor({H(pid)}, 60) FROM documents WHERE doc_id % 16 = 0
        ), sli_blocked AS (
          SELECT image_id, phash, phash >> 52 AS block FROM sli_imgs
        ), sli_pairs AS (
          SELECT x.image_id AS a, y.image_id AS b
          FROM sli_blocked x JOIN sli_blocked y ON x.block = y.block
          WHERE x.image_id < y.image_id
            AND bit_count(xor(x.phash, y.phash)) <= 4
        ), sli_sym AS (
          SELECT a AS id, b AS nbr FROM sli_pairs
          UNION
          SELECT b AS id, a AS nbr FROM sli_pairs
        ), sli_reach(id, comp) AS (
          SELECT id, id FROM sli_sym
          UNION
          SELECT s.nbr, r.comp FROM sli_reach r JOIN sli_sym s ON s.id = r.id
          WHERE r.comp < s.nbr
        ), sli_cc AS (
          SELECT id AS image_id, MIN(comp) AS comp FROM sli_reach GROUP BY id
        )
        SELECT i.image_id,
               COALESCE(c.comp, i.image_id) AS cluster,
               CASE WHEN substr(md5(i.image_id), 1, 4) < '{threshold}'
                    THEN 'val' ELSE 'train' END AS split
        FROM sli_imgs i LEFT JOIN sli_cc c USING (image_id)
    )"""
    return cluster_split_leakage_sql(members, id_col="image_id")


def _joint_dedup_oracle() -> str:
    """DuckDB replay of q_joint_dedup_clusters: identical planted
    rows (phash twin with fresh caption, caption copy with far
    phash), blocked hamming pairs UNION caption star edges, then the
    recursive min-reachable-id CTE."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    pid = "printf('img_%06d', doc_id)"
    cap = "'cap ' || CAST(doc_id AS VARCHAR)"
    return f"""
        WITH RECURSIVE imgs AS (
          SELECT {pid} AS image_id, {H(pid)} AS phash, {cap} AS caption FROM documents
          UNION ALL
          SELECT {pid} || '_twin', xor({H(pid)}, 3),
                 'cap t' || CAST(doc_id AS VARCHAR)
          FROM documents WHERE doc_id % 8 = 0
          UNION ALL
          SELECT {pid} || '_cap', {H(pid, 5)}, {cap}
          FROM documents WHERE doc_id % 12 = 0
        ), blocked AS (
          SELECT image_id, phash, phash >> 52 AS block FROM imgs
        ), ipairs AS (
          SELECT x.image_id AS a, y.image_id AS b
          FROM blocked x JOIN blocked y ON x.block = y.block
          WHERE x.image_id < y.image_id
            AND bit_count(xor(x.phash, y.phash)) <= 4
        ), creps AS (
          SELECT caption, MIN(image_id) AS a
          FROM imgs GROUP BY caption HAVING COUNT(*) > 1
        ), cpairs AS (
          SELECT c.a, i.image_id AS b
          FROM imgs i JOIN creps c USING (caption)
          WHERE i.image_id <> c.a
        ), pairs AS (
          SELECT a, b FROM ipairs UNION SELECT a, b FROM cpairs
        ), sym AS (
          SELECT a AS id, b AS nbr FROM pairs
          UNION
          SELECT b AS id, a AS nbr FROM pairs
        ), reach(id, comp) AS (
          SELECT id, id FROM sym
          UNION
          SELECT s.nbr, r.comp FROM reach r JOIN sym s ON s.id = r.id
          WHERE r.comp < s.nbr
        )
        SELECT id AS image_id, MIN(comp) AS cluster_rep FROM reach GROUP BY id
    """


def _mixture_sample_oracle() -> str:
    """DuckDB replay of q_mixture_sample: identical planted skewed
    source map, identical exact-integer keep test (HUGEINT stands in
    for Spark's decimal(38,0))."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    u = f"({H('doc_id')} >> 30)"
    return f"""
        WITH sk AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 16 < 8 THEN 'big'
                      WHEN doc_id % 16 < 12 THEN 'mid'
                      ELSE 'tail' || CAST(doc_id % 16 AS VARCHAR) END AS source
          FROM documents
        ), c AS (
          SELECT source, COUNT(*) AS n_s FROM sk GROUP BY source
        ), m AS (
          SELECT MIN(n_s) AS n_min FROM c
        ), k AS (
          SELECT sk.source FROM sk JOIN c USING (source) CROSS JOIN m
          WHERE CAST({u} AS HUGEINT) * {u} * n_s
                < CAST(n_min AS HUGEINT) * 1152921504606846976
        ), kc AS (
          SELECT source, COUNT(*) AS n_kept FROM k GROUP BY source
        )
        SELECT c.source, c.n_s AS n_docs,
               CAST(COALESCE(kc.n_kept, 0) AS BIGINT) AS n_kept,
               ROUND(CAST(COALESCE(kc.n_kept, 0) AS DOUBLE) / c.n_s, 4) AS keep_rate
        FROM c LEFT JOIN kc USING (source)
    """


def _classifier_gate_oracle() -> str:
    """DuckDB replay of q_text_classifier_gate: same tokenization,
    same hash60-derived integer weights, integer-exact fold; SUM
    cast to BIGINT (DuckDB integer SUM is HUGEINT)."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    return f"""
        WITH s AS (
          SELECT source,
                 CAST(COALESCE(list_sum(list_transform({_TOK},
                      t -> ({H('t', 7)} % 2001) - 1000)), 0) AS BIGINT) AS score
          FROM documents
        )
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
               CAST(SUM(score) AS BIGINT) AS total_score,
               ROUND(CAST(SUM(score) AS DOUBLE) / COUNT(*), 4) AS avg_score
        FROM s GROUP BY source
    """


def _content_sniff_oracle() -> str:
    """DuckDB replay of q_content_sniff: identical planted class
    cycle, shift-by-one-on-doc_id%7 spoofing, magic||md5-tail blob
    construction via from_hex, and the CASE chain GENERATED from the
    same MAGIC_TABLE the Spark operator compiles its when-chain
    from."""
    from dblp_crawler_spark.operators.sniff import sniff_case_sql

    n = len(_SNIFF_CLASSES)
    decl = " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(_SNIFF_CLASSES)
    )
    mag = " ".join(
        f"WHEN {i} THEN '{_SNIFF_MAGICS[c]}'" for i, c in enumerate(_SNIFF_CLASSES)
    )
    return f"""
        WITH planted AS (
          SELECT CASE doc_id % {n} {decl} END AS declared,
                 from_hex(
                   (CASE (doc_id % {n} + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) % {n}
                         {mag} END)
                   || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS bytes
          FROM documents
        ), hx AS (
          -- DuckDB has no BLOB substring; hex-then-substr is the
          -- same 16-byte window as Spark's hex(substring(b,1,16))
          SELECT declared, substr(hex(bytes), 1, 32) AS h FROM planted
        ), sn AS (
          SELECT declared, {sniff_case_sql('h')} AS sniffed FROM hx
        )
        SELECT declared, sniffed, COUNT(*) AS n,
               CAST(SUM(CASE WHEN sniffed <> declared THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_mismatch
        FROM sn GROUP BY declared, sniffed
    """


def _image_linear_gate_oracle() -> str:
    """DuckDB replay of q_image_linear_gate: identical planted
    hash60 phashes and fmt cycle, the bit-weight sum written out
    term-by-term from the SAME _gate_bit_weights() list (zero
    weights elided exactly as the Spark operator elides them), and
    integer SUMs cast to BIGINT."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H

    pid = "printf('img_%06d', doc_id)"
    bits = " + ".join(
        f"((phash >> {k}) & 1) * ({w})"
        for k, w in enumerate(_gate_bit_weights())
        if w != 0
    )
    fmtw = " ".join(f"WHEN '{f}' THEN {w}" for f, w in _GATE_FMT_W.items())
    return f"""
        WITH imgs AS (
          SELECT {H(pid)} AS phash,
                 CASE doc_id % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
                      WHEN 2 THEN 'webp' ELSE 'gif' END AS fmt
          FROM documents
        ), scored AS (
          SELECT fmt,
                 {_GATE_BIAS} + {bits} + CASE fmt {fmtw} ELSE 0 END AS score
          FROM imgs
        )
        SELECT fmt, COUNT(*) AS n_images,
               CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
               CAST(SUM(score) AS BIGINT) AS total_score,
               CAST(MIN(score) AS BIGINT) AS min_score,
               CAST(MAX(score) AS BIGINT) AS max_score
        FROM scored GROUP BY fmt
    """


def _batch_assembly_oracle() -> str:
    """DuckDB replay of q_image_batch_assembly: identical planted
    geometry + bucket argmin, then per-bucket rank as a plain
    row_number (the engine's distributed prefix sum must equal it),
    full-batch filter, batch/slot arithmetic."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.operators.multimodal import DEFAULT_ASPECT_BUCKETS

    vals = ", ".join(f"({i}, {bw}, {bh})" for i, (bw, bh) in enumerate(DEFAULT_ASPECT_BUCKETS))
    return f"""
        WITH imgs AS (
          SELECT doc_id,
                 CAST(256 + ({H('doc_id')} % 1024) AS INT) AS w,
                 CAST(256 + ({H('doc_id', 1)} % 1024) AS INT) AS h
          FROM documents
        ), scored AS (
          SELECT doc_id, b.i, b.bw, b.bh,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY abs(w::DOUBLE / h::DOUBLE - bw::DOUBLE / bh::DOUBLE) ASC, b.i ASC) AS rn
          FROM imgs CROSS JOIN (VALUES {vals}) b(i, bw, bh)
        ), assigned AS (
          SELECT doc_id, i AS bucket_id, bw AS target_w, bh AS target_h
          FROM scored WHERE rn = 1
        ), ranked AS (
          SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY bucket_id ORDER BY doc_id) - 1 AS rk,
                 COUNT(*) OVER (PARTITION BY bucket_id) AS n_b
          FROM assigned
        )
        SELECT doc_id, bucket_id, target_w, target_h,
               CAST(rk // 8 AS INT) AS batch_id,
               CAST(rk % 8 AS INT) AS slot
        FROM ranked WHERE rk < n_b - n_b % 8
    """


def _aspect_bucket_oracle() -> str:
    """DuckDB replay of q_image_aspect_bucket: identical planted
    (w, h) via hash60, identical argmin over the same bucket ladder
    (integer-division doubles are deterministic in both engines)."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.operators.multimodal import DEFAULT_ASPECT_BUCKETS

    vals = ", ".join(f"({i}, {bw}, {bh})" for i, (bw, bh) in enumerate(DEFAULT_ASPECT_BUCKETS))
    return f"""
        WITH imgs AS (
          SELECT doc_id,
                 CAST(256 + ({H('doc_id')} % 1024) AS INT) AS w,
                 CAST(256 + ({H('doc_id', 1)} % 1024) AS INT) AS h
          FROM documents
        ), scored AS (
          SELECT doc_id, w, h, b.i, b.bw, b.bh,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY abs(w::DOUBLE / h::DOUBLE - bw::DOUBLE / bh::DOUBLE) ASC, b.i ASC) AS rn
          FROM imgs CROSS JOIN (VALUES {vals}) b(i, bw, bh)
        )
        SELECT doc_id, w, h, i AS bucket_id, bw AS target_w, bh AS target_h
        FROM scored WHERE rn = 1
    """


def oracle_sql() -> dict[str, str]:
    return {
        "pushdown_year_filter": """
            SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
            FROM lineitem WHERE year(l_shipdate) >= 2000 GROUP BY l_returnflag
        """,
        "keyword_cnf_filter": f"""
            SELECT lang, COUNT(*) AS n_matched FROM documents
            WHERE list_has_all({_TOK}, ['spark','join'])
               OR list_has_all({_TOK}, ['window','agg'])
            GROUP BY lang
        """,
        "keyword_weak_filter": f"""
            SELECT len(list_intersect({_TOK},
                       ['spark','join','window','agg'])) > 0 AS weak_match,
                   COUNT(*) AS n
            FROM documents GROUP BY 1
        """,
        "canonical_title_hash": """
            SELECT p_brand, COUNT(DISTINCT regexp_replace(lower(p_name), '[^0-9a-z]', '', 'g')) AS n_canon
            FROM part GROUP BY p_brand
        """,
        "url2doi": """
            WITH u AS (
              SELECT doc_id,
                CASE WHEN doc_id % 3 = 0
                     THEN 'https://doi.org/10.1234/' || doc_id
                     ELSE 'https://example.org/' || doc_id END AS url
              FROM documents)
            SELECT doc_id, regexp_replace(regexp_extract(url, '^https?://doi\\.org(/[^?#]*)', 1), '^/+', '') AS doi
            FROM u WHERE url LIKE 'https://doi.org/%'
        """,
        "journal_key_prefix": """
            WITH p AS (SELECT replace(p_type, ' ', '/') || '/' || p_brand AS path FROM part)
            SELECT regexp_extract(path, '^([^/]*/[^/]*)', 1) AS jkey, COUNT(*) AS n
            FROM p GROUP BY 1
        """,
        "dim_broadcast_lookup": """
            SELECT COALESCE(r.r_name, 'N') AS rank, COUNT(*) AS n
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            LEFT JOIN (SELECT * FROM region WHERE r_regionkey < 3) r
              ON n.n_regionkey = r.r_regionkey
            GROUP BY 1
        """,
        "frontier_antijoin": """
            SELECT n.n_name, COUNT(*) AS n_customers
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND year(o.o_orderdate) >= 1998)
            GROUP BY n.n_name
        """,
        "frontier_expand_join": """
            SELECT COUNT(*) AS n_new FROM (
              SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) >= 1997
            ) WHERE o_custkey % 7 <> 0
        """,
        "pair_cooccurrence": """
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS n
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        """,
        "degree_threshold": """
            SELECT l_partkey, COUNT(DISTINCT l_orderkey) AS n_orders
            FROM lineitem GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 8
        """,
        "politeness_window": """
            SELECT o_custkey, o_orderkey, rn FROM (
              SELECT o_custkey, o_orderkey,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders) WHERE rn <= 3
        """,
        "priority_pop": """
            SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "seen_set_union": """
            SELECT
              (SELECT COUNT(*) FROM (
                 SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
                 UNION SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')) AS n_union,
              (SELECT COUNT(*) FROM (
                 SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
                 EXCEPT SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')) AS n_minus
        """,
        "metrics_rollup": """
            SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "dedup_exact": """
            SELECT md5(substring(text, 1, 40)) AS text_hash, COUNT(*) AS n, MIN(doc_id) AS keep_id
            FROM documents GROUP BY 1 HAVING COUNT(*) > 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH toks AS (
              SELECT doc_id, source, {_TOK} AS tk FROM documents
            ), sh AS (
              SELECT doc_id, source,
                CASE WHEN len(tk) >= 3 THEN
                  list_distinct(list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                ELSE [array_to_string(tk, ' ')] END AS sh
              FROM toks
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE /
                         len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                  len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
        """,
        "dedup_editdist": """
            WITH base AS (
              SELECT doc_id, source, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, source,
                     substring(text, 1, 10) || '#' || substring(text, 12)
              FROM documents WHERE doc_id % 29 = 0
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(levenshtein(substring(a.text, 1, 80),
                                    substring(b.text, 1, 80)) AS BIGINT) AS dist
            FROM base a JOIN base b ON a.source = b.source AND a.doc_id < b.doc_id
            WHERE levenshtein(substring(a.text, 1, 80), substring(b.text, 1, 80)) <= 8
        """,
        "dedup_containment": f"""
            WITH base AS (
              SELECT doc_id, source, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, source, substring(text, 1, length(text) // 2)
              FROM documents WHERE doc_id % 17 = 3
            ), toks AS (
              SELECT doc_id, source, {_TOK} AS tk FROM base
            ), sh AS (
              SELECT doc_id, source,
                CASE WHEN len(tk) >= 3 THEN
                  list_distinct(list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                ELSE [array_to_string(tk, ' ')] END AS sh
              FROM toks
            ), pairs AS (
              SELECT a.doc_id AS a, b.doc_id AS b,
                     len(list_intersect(a.sh, b.sh))::DOUBLE AS ninter,
                     len(a.sh) AS na, len(b.sh) AS nb
              FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
            )
            SELECT a, b, ROUND(ninter / na, 6) AS cont_a,
                   ROUND(ninter / nb, 6) AS cont_b
            FROM pairs
            WHERE greatest(ninter / na, ninter / nb) >= 0.6
        """,
        "decontaminate": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK} AS tk FROM documents
            ), bsh AS (
              SELECT DISTINCT g FROM (
                SELECT unnest(
                  CASE WHEN len(sl) >= 8 THEN
                    list_transform(range(1, len(sl) - 6), i -> array_to_string(sl[i:i+7], ' '))
                  ELSE [array_to_string(sl, ' ')] END) AS g
                FROM (SELECT tk[5:24] AS sl FROM toks WHERE doc_id % 97 = 0 AND len(tk) >= 24))
            ), dsh AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id, unnest(
                  CASE WHEN len(tk) >= 8 THEN
                    list_transform(range(1, len(tk) - 6), i -> array_to_string(tk[i:i+7], ' '))
                  ELSE [array_to_string(tk, ' ')] END) AS g
                FROM toks)
            )
            SELECT d.doc_id, COUNT(*) AS n_hits
            FROM dsh d JOIN bsh b ON d.g = b.g
            GROUP BY d.doc_id HAVING COUNT(*) >= 1
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
        """,
        "embedding_near_dup_planted": """
            WITH aug AS (
              SELECT vec_id, embedding, label FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000 AS vec_id, embedding, label
              FROM embeddings WHERE vec_id % 10 = 0
            )
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
            FROM aug a JOIN aug b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.9
        """,
        "dedup_components": """
            WITH RECURSIVE pairs AS (
              SELECT a.vec_id AS a, b.vec_id AS b
              FROM embeddings a JOIN embeddings b
                ON a.label = b.label AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
            ), sym AS (
              SELECT a AS id, b AS nbr FROM pairs
              UNION
              SELECT b AS id, a AS nbr FROM pairs
            ), reach(id, comp) AS (
              SELECT id, id FROM sym
              UNION
              SELECT s.nbr, r.comp FROM reach r JOIN sym s ON s.id = r.id
              WHERE r.comp < s.nbr
            )
            SELECT id AS vec_id, MIN(comp) AS component FROM reach GROUP BY id
        """,
        "dedup_drop_list": """
            WITH RECURSIVE pairs AS (
              SELECT a.vec_id AS a, b.vec_id AS b
              FROM embeddings a JOIN embeddings b
                ON a.label = b.label AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
            ), sym AS (
              SELECT a AS id, b AS nbr FROM pairs
              UNION
              SELECT b AS id, a AS nbr FROM pairs
            ), reach(id, comp) AS (
              SELECT id, id FROM sym
              UNION
              SELECT s.nbr, r.comp FROM reach r JOIN sym s ON s.id = r.id
              WHERE r.comp < s.nbr
            ), cc AS (
              SELECT id, MIN(comp) AS component FROM reach GROUP BY id
            )
            SELECT id AS vec_id, component AS keep_vec_id FROM cc WHERE id != component
        """,
        "text_repetition": f"""
            WITH g AS (
              SELECT doc_id,
                CASE WHEN len(tk) >= 3 THEN
                  list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                ELSE [array_to_string(tk, ' ')] END AS grams
              FROM (SELECT doc_id, {_TOK} AS tk FROM documents)
            )
            SELECT doc_id,
                   ROUND(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 4) AS rep_ratio
            FROM g
        """,
        "text_top_ngrams": f"""
            WITH g AS (
              SELECT doc_id,
                CASE WHEN len(tk) >= 3 THEN
                  list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                ELSE [array_to_string(tk, ' ')] END AS grams
              FROM (SELECT doc_id, {_TOK} AS tk FROM documents)
            ), e AS (SELECT unnest(grams) AS gram FROM g)
            SELECT gram, COUNT(*) AS cnt FROM e
            GROUP BY gram ORDER BY cnt DESC, gram ASC LIMIT 20
        """,
        "pipeline_curation": f"""
            WITH m AS (
              SELECT doc_id, text, len(tk) AS n_tok,
                CASE WHEN length(text) > 0 THEN
                  length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))::DOUBLE / length(text)
                ELSE 0.0 END AS punct,
                CASE WHEN len(tk) > 0 THEN
                  len(list_filter(tk, t -> list_contains(['{SW_LIST}'], t)))::DOUBLE / len(tk)
                ELSE 0.0 END AS swr,
                CASE WHEN len(tk) >= 3 THEN
                  list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                ELSE [array_to_string(tk, ' ')] END AS grams,
                length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS n_cjk
              FROM (SELECT doc_id, text, {_TOK} AS tk FROM documents)
            ), q AS (
              SELECT doc_id, text, n_tok,
                ROUND((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)::DOUBLE
                    + (CASE WHEN punct <= 0.1 THEN 0.3 ELSE 0.0 END)
                    + (CASE WHEN swr >= 0.01 THEN 0.3 ELSE 0.0 END), 6) AS quality,
                ROUND(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 4) AS rep_ratio,
                CASE WHEN n_cjk > 0 THEN 'zh'
                     WHEN n_tok > 0 AND swr >= 0.05 THEN 'en'
                     ELSE 'unk' END AS lang_pred
              FROM m
            ), kept AS (
              SELECT * FROM q
              WHERE lang_pred = 'en' AND quality >= 0.7
                AND rep_ratio <= 0.6 AND n_tok >= 10
            )
            SELECT doc_id, n_tok AS n_tokens, quality, rep_ratio FROM kept
            WHERE doc_id IN (SELECT MIN(doc_id) FROM kept GROUP BY md5(text))
        """,
        "contrastive_hard_negatives": """
            SELECT q_id, vec_id, ROUND(cosine, 6) AS cosine, rank FROM (
              SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                     list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosine,
                     ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                                c.vec_id ASC) AS rank
              FROM (SELECT * FROM embeddings WHERE vec_id % 50 = 0) q
              JOIN embeddings c ON q.label <> c.label
            ) WHERE rank <= 5
        """,
        "ann_cosine_topk": """
            SELECT q_id, vec_id, ROUND(cosine, 6) AS cosine, rank FROM (
              SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                     list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosine,
                     ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                                c.vec_id ASC) AS rank
              FROM (SELECT * FROM embeddings WHERE vec_id < 5) q CROSS JOIN embeddings c
            ) WHERE rank <= 10
        """,
        "text_bpe_tokens": """
            WITH t AS (
              SELECT source,
                len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n
              FROM documents)
            SELECT source, CAST(SUM(n) AS BIGINT) AS total_bpe_tokens,
                   ROUND(SUM(n)::DOUBLE / COUNT(*), 4) AS avg_bpe_tokens
            FROM t GROUP BY source
        """,
        "text_token_count": f"""
            SELECT source, CAST(SUM(len({_TOK})) AS BIGINT) AS total_tokens,
                   ROUND(SUM(len({_TOK}))::DOUBLE / COUNT(*), 4) AS avg_tokens
            FROM documents GROUP BY source
        """,
        "text_quality": f"""
            WITH s AS (
              SELECT source,
                len({_TOK}) AS n_tok,
                CASE WHEN length(text) > 0 THEN
                  length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))::DOUBLE / length(text)
                ELSE 0.0 END AS punct,
                CASE WHEN len({_TOK}) > 0 THEN
                  len(list_filter({_TOK}, t -> list_contains(['{SW_LIST}'], t)))::DOUBLE / len({_TOK})
                ELSE 0.0 END AS swr
              FROM documents)
            SELECT source, COUNT(*) AS n_docs,
                   ROUND(AVG(ROUND((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
                       + (CASE WHEN punct <= 0.1 THEN 0.3 ELSE 0.0 END)
                       + (CASE WHEN swr >= 0.01 THEN 0.3 ELSE 0.0 END), 6)), 4) AS avg_quality,
                   ROUND(AVG(punct), 4) AS avg_punct
            FROM s GROUP BY source
        """,
        "gopher_quality_rules": f"""
            WITH p AS (
              SELECT source,
                text || CASE WHEN doc_id % 2 = 0 THEN '{_GOPHER_SW}' ELSE '' END
                     || CASE WHEN doc_id % 7 = 0 THEN '{_GOPHER_SYM}' ELSE '' END
                     || CASE WHEN doc_id % 3 = 0 THEN '{_GOPHER_NUM}' ELSE '' END
                     || CASE WHEN doc_id % 5 = 0 THEN {_GOPHER_BUL_SQL} ELSE '' END AS text
              FROM documents),
            s AS (
              SELECT source,
                {_TOK} AS toks,
                str_split(text, chr(10)) AS lines,
                (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
                (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell
              FROM p),
            r AS (
              SELECT source,
                len(toks)::BIGINT AS n,
                COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)::BIGINT AS sum_len,
                n_hash, n_ell,
                len(lines)::BIGINT AS m,
                len(list_filter(lines, l -> starts_with(ltrim(l), '- ')
                    OR starts_with(ltrim(l), '* ')
                    OR starts_with(ltrim(l), '•')))::BIGINT AS n_bullet,
                len(list_filter(lines, l -> ends_with(rtrim(l), '...')))::BIGINT AS n_ell_line,
                len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))::BIGINT AS n_alpha,
                len(list_intersect(list_distinct(toks),
                    ['and','be','have','of','that','the','to','with'])) AS n_sw
              FROM s),
            v AS (
              SELECT source,
                (n BETWEEN 50 AND 100000) AS r_words,
                (3*n <= sum_len AND sum_len <= 10*n) AS r_wlen,
                (10*(n_hash + n_ell) <= n) AS r_sym,
                (10*n_bullet <= 9*m) AS r_bullet,
                (10*n_ell_line <= 3*m) AS r_ell,
                (5*n_alpha >= 4*n) AS r_alpha,
                (n_sw >= 2) AS r_sw
              FROM r)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(r_words::INT) AS BIGINT) AS pass_word_count,
              CAST(SUM(r_wlen::INT) AS BIGINT) AS pass_mean_word_len,
              CAST(SUM(r_sym::INT) AS BIGINT) AS pass_symbol_ratio,
              CAST(SUM(r_bullet::INT) AS BIGINT) AS pass_bullet_lines,
              CAST(SUM(r_ell::INT) AS BIGINT) AS pass_ellipsis_lines,
              CAST(SUM(r_alpha::INT) AS BIGINT) AS pass_alpha_words,
              CAST(SUM(r_sw::INT) AS BIGINT) AS pass_stopwords,
              CAST(SUM((r_words AND r_wlen AND r_sym AND r_bullet
                        AND r_ell AND r_alpha AND r_sw)::INT) AS BIGINT) AS n_keep
            FROM v GROUP BY source
        """,
        "recrawl_schedule": """
            WITH f AS (
              SELECT 'https://dblp.org/pid/p' || CAST(user_id AS VARCHAR) AS url,
                     ts, event_type AS fp
              FROM events),
            m AS (
              SELECT url, ts, fp,
                CASE WHEN lag(fp) OVER (PARTITION BY url ORDER BY ts, fp) IS NOT NULL
                      AND lag(fp) OVER (PARTITION BY url ORDER BY ts, fp) <> fp
                     THEN 1 ELSE 0 END AS changed
              FROM f),
            a AS (
              SELECT url, COUNT(*) AS n_fetches,
                     CAST(SUM(changed) AS BIGINT) AS n_changes,
                     MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
              FROM m GROUP BY url),
            n AS (SELECT MAX(epoch_us(ts)) AS now_us FROM f)
            SELECT url, n_fetches, n_changes, last_us,
                   ROUND((n_changes * (now_us - last_us)) / (last_us - first_us), 6) AS priority
            FROM a, n
            WHERE last_us > first_us
            ORDER BY priority DESC NULLS LAST, url LIMIT 50
        """,
        "pipeline_source_cap": f"""
            WITH s AS (
              SELECT doc_id, source,
                ROUND((CASE WHEN len({_TOK}) BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
                  + (CASE WHEN (CASE WHEN length(text) > 0 THEN
                        length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))::DOUBLE / length(text)
                      ELSE 0.0 END) <= 0.1 THEN 0.3 ELSE 0.0 END)
                  + (CASE WHEN (CASE WHEN len({_TOK}) > 0 THEN
                        len(list_filter({_TOK}, t -> list_contains(['{SW_LIST}'], t)))::DOUBLE / len({_TOK})
                      ELSE 0.0 END) >= 0.01 THEN 0.3 ELSE 0.0 END), 6)::DOUBLE AS quality
              FROM documents)
            SELECT doc_id, source, quality, rk FROM (
              SELECT doc_id, source, quality,
                     ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC)::INTEGER AS rk
              FROM s)
            WHERE rk <= 25
        """,
        "pipeline_pack_shards": f"""
            SELECT doc_id, n_tokens,
                   CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard
            FROM (SELECT doc_id, len({_TOK})::BIGINT AS n_tokens FROM documents)
        """,
        "text_lang_id": f"""
            WITH s AS (
              SELECT CASE
                WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 THEN 'zh'
                WHEN len({_TOK}) > 0 AND
                     len(list_filter({_TOK}, t -> list_contains(['{SW_LIST}'], t)))::DOUBLE
                     / len({_TOK}) >= 0.05 THEN 'en'
                ELSE 'unk' END AS lang_pred
              FROM documents)
            SELECT lang_pred, COUNT(*) AS n FROM s GROUP BY lang_pred
        """,
        "pii_redaction": r"""
            WITH p AS (
              SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN
                  text || ' Contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com from 10.0.' || CAST(doc_id % 250 AS VARCHAR)
                       || '.' || CAST(doc_id % 11 AS VARCHAR)
                       || ' or +1 555-000-1234.'
                ELSE text END AS text
              FROM documents)
            SELECT doc_id,
              len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
              len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
              len(regexp_extract_all(text, '\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}')) AS n_phone,
              md5(regexp_replace(regexp_replace(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                  '\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}', '<PHONE>', 'g')) AS redacted_md5
            FROM p
        """,
        "tfidf_top_terms": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
            dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
            nn AS (SELECT COUNT(*) AS n FROM documents)
            SELECT doc_id, term, tf, df, rk,
                   ROUND(tf * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
            FROM (
              SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, nn.n,
                     ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                         ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rk
              FROM tf JOIN dfreq USING (term) CROSS JOIN nn)
            WHERE rk <= 3
        """,
        "content_sniff": _content_sniff_oracle(),
        "length_quantiles": """
            WITH r AS (
              SELECT source, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
                     COUNT(*) OVER (PARTITION BY source) AS n
              FROM documents)
            SELECT source, MAX(n) AS n,
                   MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars,
                   MAX(CASE WHEN rn = (1 * n + 1) // 2 THEN n_chars END) AS p50,
                   MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90,
                   MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN n_chars END) AS p99
            FROM r GROUP BY source
        """,
        "sketch_quantiles": """
            WITH b AS (
              SELECT source,
                     CASE WHEN n_chars >= 1 THEN length(bin(n_chars)) - 1
                          ELSE -1 END AS bucket,
                     COUNT(*) AS cnt
              FROM documents GROUP BY 1, 2),
            c AS (
              SELECT source, bucket,
                     SUM(cnt) OVER (PARTITION BY source ORDER BY bucket) AS cum,
                     SUM(cnt) OVER (PARTITION BY source) AS n
              FROM b),
            r AS (
              SELECT source, bucket, cum, n,
                     (1 * n + 1) // 2 AS r50,
                     (9 * n + 9) // 10 AS r90,
                     (99 * n + 99) // 100 AS r99
              FROM c),
            agg AS (
              SELECT source, CAST(MAX(n) AS BIGINT) AS n,
                     MIN(CASE WHEN cum >= r50 THEN bucket END) AS p50_bucket,
                     MIN(CASE WHEN cum >= r90 THEN bucket END) AS p90_bucket,
                     MIN(CASE WHEN cum >= r99 THEN bucket END) AS p99_bucket
              FROM r GROUP BY source)
            SELECT source, n, p50_bucket, p90_bucket, p99_bucket,
                   CASE WHEN p50_bucket >= 0
                        THEN (CAST(1 AS BIGINT) << CAST(p50_bucket + 1 AS INT)) - 1
                        ELSE 0 END AS p50_ub,
                   CASE WHEN p90_bucket >= 0
                        THEN (CAST(1 AS BIGINT) << CAST(p90_bucket + 1 AS INT)) - 1
                        ELSE 0 END AS p90_ub,
                   CASE WHEN p99_bucket >= 0
                        THEN (CAST(1 AS BIGINT) << CAST(p99_bucket + 1 AS INT)) - 1
                        ELSE 0 END AS p99_ub
            FROM agg
        """,
        "index_delta_update": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ), touched AS (
              SELECT DISTINCT term FROM toks
              WHERE doc_id % 17 = 0 OR (doc_id % 17 <> 0 AND doc_id % 13 = 0)
            ), tf AS (
              SELECT term, doc_id, COUNT(*) AS tf FROM toks
              WHERE (doc_id % 17 = 0 OR doc_id % 13 <> 0)
                AND term IN (SELECT term FROM touched)
              GROUP BY 1, 2
            ), dfreq AS (
              SELECT term, COUNT(*) AS df FROM tf GROUP BY 1 HAVING COUNT(*) >= 5
            )
            SELECT term, df, rk, doc_id, tf
            FROM (
              SELECT tf.term, dfreq.df, tf.doc_id, tf.tf,
                     ROW_NUMBER() OVER (PARTITION BY tf.term
                         ORDER BY tf.tf DESC, tf.doc_id ASC) AS rk
              FROM tf JOIN dfreq USING (term))
            WHERE rk <= 3
        """,
        "inverted_index": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
            dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1 HAVING COUNT(*) >= 5)
            SELECT term, df, rk, doc_id, tf
            FROM (
              SELECT tf.term, dfreq.df, tf.doc_id, tf.tf,
                     ROW_NUMBER() OVER (PARTITION BY tf.term
                         ORDER BY tf.tf DESC, tf.doc_id ASC) AS rk
              FROM tf JOIN dfreq USING (term))
            WHERE rk <= 3
        """,
        "index_search_and": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2)
            SELECT doc_id, COUNT(*) AS n_terms_hit,
                   CAST(SUM(tf) AS BIGINT) AS score
            FROM tf WHERE term IN ('spark', 'join', 'window')
            GROUP BY doc_id HAVING COUNT(*) = 3
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "index_search_bm25": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            lens AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
            stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                             CAST(SUM(dl) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS a
                      FROM lens),
            tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
                   WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
            dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
            scored AS (
              SELECT tf.doc_id,
                     CAST(length(bin(n // df)) AS BIGINT)
                       * ((20000000 * tf.tf * a) // (8 * a * tf.tf + 3 * a + 9 * dl)) AS comp
              FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
                   CAST(SUM(comp) AS BIGINT) AS score
            FROM scored GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "hash_split": """
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
                        THEN 'val' ELSE 'train' END AS split
            FROM documents
        """,
        "corpus_drift": f"""
            WITH counts AS (
              SELECT source AS grp, term, CAST(COUNT(*) AS BIGINT) AS c
              FROM (SELECT source, unnest({_TOK}) AS term FROM documents)
              GROUP BY 1, 2
            ), totals AS (
              SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY grp
            ), bc AS (
              SELECT term, c AS cb FROM counts WHERE grp = 'src0'
            ), bt AS (
              SELECT n AS nb FROM totals WHERE grp = 'src0'
            ), shared AS (
              SELECT counts.grp,
                     CAST(COUNT(*) AS BIGINT) AS n_shared_terms,
                     CAST(SUM(abs(counts.c * bt.nb - bc.cb * totals.n)) AS BIGINT) AS l1s,
                     CAST(SUM(counts.c) AS BIGINT) AS sca,
                     CAST(SUM(bc.cb) AS BIGINT) AS scb
              FROM counts JOIN bc USING (term)
                   JOIN totals ON counts.grp = totals.grp
                   CROSS JOIN bt
              GROUP BY counts.grp
            )
            SELECT t.grp AS source,
                   COALESCE(s.n_shared_terms, 0) AS n_shared_terms,
                   CAST(COALESCE(s.l1s, 0)
                        + (t.n - COALESCE(s.sca, 0)) * bt.nb
                        + (bt.nb - COALESCE(s.scb, 0)) * t.n AS BIGINT) AS l1_num,
                   t.n AS n_tokens,
                   ROUND((COALESCE(s.l1s, 0)
                          + (t.n - COALESCE(s.sca, 0)) * bt.nb
                          + (bt.nb - COALESCE(s.scb, 0)) * t.n)::DOUBLE
                         / (t.n * bt.nb), 6) AS drift
            FROM totals t CROSS JOIN bt LEFT JOIN shared s ON t.grp = s.grp
        """,
        "table_profile": "\n            UNION ALL ".join(
            f"SELECT '{c}' AS column, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM orders"
            for c in ("o_orderkey", "o_custkey", "o_orderstatus",
                      "o_totalprice", "o_orderdate", "o_orderpriority")
        ),
        "fetch_backoff": """
            WITH l AS (
              SELECT 'https://dblp.org/pid/p' || CAST(user_id AS VARCHAR) AS url,
                     epoch_us(ts) AS m, event_type <> 'error' AS ok
              FROM events
            ), w AS (
              SELECT url, m,
                     MAX(CASE WHEN ok THEN m END) OVER (PARTITION BY url) AS last_ok
              FROM l
            ), s AS (
              SELECT url,
                     CAST(SUM(CASE WHEN m > COALESCE(last_ok, -1) THEN 1 ELSE 0 END) AS BIGINT) AS n_fails,
                     CAST(MAX(m) AS BIGINT) AS last_ts_us
              FROM w GROUP BY url
            )
            SELECT url, n_fails, last_ts_us,
                   last_ts_us + CASE WHEN n_fails = 0 THEN 0
                     ELSE least(3600000000000, 1000000 *
                          (CAST(1 AS BIGINT) << CAST(least(n_fails - 1, 22) AS INTEGER)))
                   END AS next_eligible_us
            FROM s
        """,
        "fairness_gini": """
            WITH per AS (
              SELECT doc_id % 37 AS grp, CAST(SUM(length(text)) AS BIGINT) AS x
              FROM documents GROUP BY 1
            ), ranked AS (
              SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x, grp) AS BIGINT) AS i
              FROM per
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(x) AS BIGINT) AS total,
                   CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS BIGINT) AS gini_num,
                   CAST(COUNT(*) * SUM(x) AS BIGINT) AS gini_den,
                   ROUND((2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x))::DOUBLE
                         / (COUNT(*) * SUM(x)), 6) AS gini
            FROM ranked
        """,
        "alias_collapse": """
            WITH f AS (
              SELECT 'http://h' || CAST(d.doc_id % 40 AS VARCHAR) || '.org/page/'
                       || CAST(d.doc_id AS VARCHAR) AS url,
                     CASE WHEN d.doc_id % 23 = 0 THEN NULL ELSE md5(b.text) END AS fp,
                     'h' || CAST(d.doc_id % 40 AS VARCHAR) || '.org' AS host
              FROM documents d JOIN documents b
                ON b.doc_id = d.doc_id - (CASE WHEN d.doc_id % 4 = 1 THEN 1 ELSE 0 END)
            ), nn AS (
              SELECT * FROM f WHERE fp IS NOT NULL
            ), el AS (
              SELECT fp, MIN(url) AS canonical_url FROM nn GROUP BY fp
            ), am AS (
              SELECT nn.host FROM nn JOIN el USING (fp)
              WHERE nn.url <> el.canonical_url
            ), ph AS (
              SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages FROM nn GROUP BY host
            ), al AS (
              SELECT host, CAST(COUNT(*) AS BIGINT) AS n_aliases FROM am GROUP BY host
            )
            SELECT ph.host, ph.n_pages, COALESCE(al.n_aliases, 0) AS n_aliases,
                   ROUND(COALESCE(al.n_aliases, 0)::DOUBLE / ph.n_pages, 6) AS alias_rate
            FROM ph LEFT JOIN al USING (host)
        """,
        "snapshot_diff": """
            WITH o AS (
              SELECT 'http://h' || CAST(doc_id % 40 AS VARCHAR) || '.org/page/'
                       || CAST(doc_id AS VARCHAR) AS url,
                     CASE WHEN doc_id % 23 = 0 THEN NULL ELSE md5(text) END AS old_fp
              FROM documents WHERE doc_id % 19 <> 0
            ), n AS (
              SELECT 'http://h' || CAST(doc_id % 40 AS VARCHAR) || '.org/page/'
                       || CAST(doc_id AS VARCHAR) AS url,
                     CASE WHEN doc_id % 23 = 0 THEN NULL
                          WHEN doc_id % 7 = 0 THEN md5(text || '!')
                          ELSE md5(text) END AS new_fp
              FROM documents WHERE doc_id % 13 <> 0
            )
            SELECT COALESCE(o.url, n.url) AS url, old_fp, new_fp,
                   CASE WHEN o.url IS NULL THEN 'added'
                        WHEN n.url IS NULL THEN 'removed'
                        WHEN old_fp IS DISTINCT FROM new_fp THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM o FULL OUTER JOIN n ON o.url = n.url
        """,
        "split_leakage_free": """
            WITH base AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, upper(replace(text, ' ', '  '))
              FROM documents WHERE doc_id % 11 = 0
            )
            SELECT doc_id,
                   CASE WHEN substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))),
                                    1, 4) < '1999'
                        THEN 'val' ELSE 'train' END AS split
            FROM base
        """,
        "corpus_mix": f"""
            WITH s AS (
              SELECT source,
                CASE
                  WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 THEN 'zh'
                  WHEN len({_TOK}) > 0 AND
                       len(list_filter({_TOK}, t -> list_contains(['{SW_LIST}'], t)))::DOUBLE
                       / len({_TOK}) >= 0.05 THEN 'en'
                  ELSE 'unk' END AS lang_pred,
                len({_TOK})::BIGINT AS n_tok,
                ROUND((CASE WHEN len({_TOK}) BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
                  + (CASE WHEN (CASE WHEN length(text) > 0 THEN
                        length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))::DOUBLE / length(text)
                      ELSE 0.0 END) <= 0.1 THEN 0.3 ELSE 0.0 END)
                  + (CASE WHEN (CASE WHEN len({_TOK}) > 0 THEN
                        len(list_filter({_TOK}, t -> list_contains(['{SW_LIST}'], t)))::DOUBLE / len({_TOK})
                      ELSE 0.0 END) >= 0.01 THEN 0.3 ELSE 0.0 END), 6) AS q
              FROM documents)
            SELECT source, lang_pred, COUNT(*) AS n_docs,
                   CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
                   ROUND(AVG(q), 6) AS avg_quality
            FROM s GROUP BY source, lang_pred
        """,
        "events_windowed_agg": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value,
                   ROUND(AVG(value), 6) AS avg_value
            FROM events GROUP BY 1, 2
        """,
        "events_hypertable_rollup": """
            SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_range_join": """
            SELECT a.user_id AS user_id, a.event_id AS anchor_id, f.event_id AS follow_id,
                   epoch_ms(f.ts) - epoch_ms(a.ts) AS gap_ms
            FROM events a JOIN events f
              ON a.user_id = f.user_id
             AND a.event_type = 'click' AND f.event_type = 'purchase'
             AND epoch_ms(f.ts) > epoch_ms(a.ts)
             AND epoch_ms(f.ts) <= epoch_ms(a.ts) + 30 * 60 * 1000
        """,
        "events_asof_attribution": """
            SELECT user_id, event_id, ts_ms, src_event_id, src_ts_ms FROM (
              SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type,
                last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
                  OVER w AS src_event_id,
                last_value(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END IGNORE NULLS)
                  OVER w AS src_ts_ms
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            ) WHERE event_type = 'click'
        """,
        "events_sessionization": """
            WITH flagged AS (
              SELECT user_id, ts, event_id,
                CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w IS NULL
                       OR epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT user_id, ts,
                SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM flagged
            ), agg AS (
              SELECT user_id, session_id, MIN(ts) AS s, MAX(ts) AS e
              FROM sess GROUP BY user_id, session_id
            )
            SELECT user_id, COUNT(*) AS n_sessions,
                   -- exact integer SUM + one float divide (NOT AVG of
                   -- doubles): keeps the pre-round double identical to
                   -- Spark's regardless of summation order
                   ROUND(CAST(SUM(epoch_ms(e) - epoch_ms(s)) AS DOUBLE)
                         / (COUNT(*) * 1000.0), 3) AS avg_session_secs
            FROM agg GROUP BY user_id
        """,
        **_portable_hash_oracles(),
        "ip_politeness": _ip_politeness_oracle(),
        "caption_quality": _caption_quality_oracle(),
        "pmi_collocations": _pmi_collocations_oracle(),
        "stratified_sample": _stratified_sample_oracle(),
        "code_detect": _code_detect_oracle(),
        "exif_gps": _exif_gps_oracle(),
        "events_funnel": _events_funnel_oracle(),
        "events_retention": _events_retention_oracle(),
        "link_reciprocity": _link_reciprocity_oracle(),
        "sitemap_coverage": _sitemap_coverage_oracle(),
        "zipf_slope": _zipf_slope_oracle(),
        "svg_structure": _svg_structure_oracle(),
        "ico_structure": _ico_structure_oracle(),
        "jpeg_colorspace": _jpeg_colorspace_oracle(),
        "tiff_structure": _tiff_structure_oracle(),
        "png_animated": _png_animated_oracle(),
        "payload_complete": _payload_complete_oracle(),
        "pipeline_payload_admission": _pipeline_payload_admission_oracle(),
        "icc_profile": _icc_profile_oracle(),
        "webp_animation": _webp_animation_oracle(),
        "exif_strip": _exif_strip_oracle(),
        "xmp_license": _xmp_license_oracle(),
        "exif_camera_model": _exif_camera_model_oracle(),
        "feed_entries": _feed_entries_oracle(),
        "cloaking_detect": _cloaking_detect_oracle(),
        "url_param_significance": _url_param_significance_oracle(),
        "x_robots_tag": _x_robots_tag_oracle(),
        "retry_after": _retry_after_oracle(),
        "pipeline_header_policy": _pipeline_header_policy_oracle(),
        "hreflang_reciprocity": _hreflang_reciprocity_oracle(),
        "range_reassembly": _range_reassembly_oracle(),
        "revalidation_headers": _revalidation_headers_oracle(),
        "strip_boilerplate": _strip_boilerplate_oracle(),
        "pipeline_host_scorecard": _pipeline_host_scorecard_oracle(),
        "interleaved_segments": _interleaved_segments_oracle(),
        "pipeline_reputation_budget": _pipeline_reputation_budget_oracle(),
        "percent_normalize": _percent_normalize_oracle(),
        "sitemap_scope_check": _sitemap_scope_check_oracle(),
        "triangle_counts": _triangle_counts_oracle(),
        "events_transitions": _events_transitions_oracle(),
        "idn_homograph": _idn_homograph_oracle(),
        "homograph_pairs": _homograph_pairs_oracle(),
        "pipeline_recrawl_plan": _pipeline_recrawl_plan_oracle(),
        "host_kcore": _host_kcore_oracle(),
        "png_text_provenance": _png_text_provenance_oracle(),
        "mojibake_gate": _mojibake_gate_oracle(),
        "pagination_chains": _pagination_chains_oracle(),
        "robots_drift": _robots_drift_oracle(),
        "parallel_corpus_mine": _parallel_corpus_mine_oracle(),
        "variant_preference": _variant_preference_oracle(),
        "tokenizer_fertility": _tokenizer_fertility_oracle(),
        "image_density": _image_density_oracle(),
        "exif_thumbnail": _exif_thumbnail_oracle(),
        "pipeline_dedup_keep_best": _pipeline_dedup_keep_best_oracle(),
        "pipeline_image_provenance": _pipeline_image_provenance_oracle(),
        "pipeline_trap_quarantine": _pipeline_trap_quarantine_oracle(),
        "changefreq_audit": _changefreq_audit_oracle(),
        "politeness_compliance": _politeness_compliance_oracle(),
        "dns_churn": _dns_churn_oracle(),
        "temperature_mixture": _temperature_mixture_oracle(),
        "exif_software": _exif_software_oracle(),
        "sitemap_images": _sitemap_images_oracle(),
        "sitemap_videos": _sitemap_videos_oracle(),
        "outlink_profile": _outlink_profile_oracle(),
        "meta_refresh": _meta_refresh_oracle(),
        "pipeline_image_discovery": _pipeline_image_discovery_oracle(),
        "url_blocklist": _url_blocklist_oracle(),
        "text_url_mentions": _text_url_mentions_oracle(),
        "order_divergence": _order_divergence_oracle(),
        "byte_budget_admission": _byte_budget_admission_oracle(),
        "embedding_drift": _embedding_drift_oracle(),
        "seed_distance": _seed_distance_oracle(),
        "og_image_caption": _og_image_caption_oracle(),
        "pipeline_multilingual_budget": _pipeline_multilingual_budget_oracle(),
        "png_exif_orientation": _png_exif_orientation_oracle(),
        "invisible_chars": _invisible_chars_oracle(),
        "caption_diversity": _caption_diversity_oracle(),
        "pipeline_corpus_release": _pipeline_corpus_release_oracle(),
    }


def _pipeline_corpus_release_oracle() -> str:
    """DuckDB replay of q_pipeline_corpus_release — same plant, gate
    fragments, md5 dedup, portable shuffle key, and prefix-sum
    packing."""
    from dblp_crawler_spark.functions.hashing import hash60_sql as H
    from dblp_crawler_spark.operators.textstats import (
        invisible_chars_sql,
        mojibake_stats_sql,
    )

    src = f"""(
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 13 = 0 THEN b.text || ' {_MOJI_RESIDUE}'
                    WHEN d.doc_id % 13 = 1 THEN '{_INV_ZW}' || b.text
                    ELSE b.text END AS text
        FROM documents d JOIN documents b
          ON b.doc_id = d.doc_id
             - (CASE WHEN d.doc_id % 13 = 5 THEN 1 ELSE 0 END)
    )"""
    return f"""
        WITH cr_s AS MATERIALIZED ({f"SELECT * FROM {src} cr_in"}),
        cr_m AS (
          SELECT doc_id, mojibake_flag FROM ({mojibake_stats_sql("cr_s")})
        ), cr_i AS (
          SELECT doc_id, has_invisible FROM ({invisible_chars_sql("cr_s")})
        ), cr_g AS (
          SELECT s.doc_id, s.text
          FROM cr_s s JOIN cr_m USING (doc_id) JOIN cr_i USING (doc_id)
          WHERE NOT mojibake_flag AND NOT has_invisible
            AND len({_TOK}) >= 10
        ), cr_k AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   ROW_NUMBER() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) AS rn
            FROM cr_g
          ) WHERE rn = 1
        ), cr_r AS (
          SELECT doc_id, text,
                 ROW_NUMBER() OVER (ORDER BY {H('doc_id', 17)} ASC,
                                    doc_id ASC) - 1 AS epoch_rank
          FROM cr_k
        )
        SELECT doc_id, epoch_rank,
               CAST(len({_TOK}) AS BIGINT) AS n_tokens,
               CAST(FLOOR(COALESCE(SUM(len({_TOK})) OVER (ORDER BY epoch_rank
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    / 2000.0) AS BIGINT) AS shard
        FROM cr_r
    """


def _invisible_chars_oracle() -> str:
    """DuckDB replay of q_invisible_chars — same planted payloads
    (codepoint-built constants embedded as literals)."""
    from dblp_crawler_spark.operators.textstats import invisible_chars_sql

    src = f"""(
        SELECT doc_id,
               CASE WHEN doc_id % 6 = 0 THEN 'wm{_INV_ZW}' || text
                    WHEN doc_id % 11 = 1 THEN text || ' file{_INV_BIDI}'
                    ELSE text END AS text
        FROM documents
    )"""
    return invisible_chars_sql(src)


def _caption_diversity_oracle() -> str:
    """DuckDB replay of q_caption_diversity — same host/caption
    synthesis."""
    from dblp_crawler_spark.sources.webparse import caption_diversity_sql

    src = """(
        SELECT 'cap' || CAST(doc_id % 15 AS VARCHAR) || '.example' AS host,
               CASE WHEN (doc_id % 15) % 5 = 0 AND doc_id % 7 <> 3
                      THEN 'Beautiful Sunset Wallpaper HD'
                    WHEN (doc_id % 15) % 5 = 0
                      THEN 'beautiful sunset wallpaper hd '
                    WHEN doc_id % 9 = 4 THEN NULL
                    ELSE 'photo number ' || CAST(doc_id AS VARCHAR) END
                 AS caption
        FROM documents
    )"""
    return caption_diversity_sql(src)


def _png_exif_orientation_oracle() -> str:
    """DuckDB replay of q_png_exif_orientation — same planted hex
    through the chunk-hop + TIFF staging replay."""
    from dblp_crawler_spark.operators.sniff import (
        png_exif_orientation_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_PE_CASES[:-1]))
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_PE_CASES)}{whens}
                 ELSE '{_PE_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} pe_src)"
    return png_exif_orientation_sql(staged)


def _og_image_caption_oracle() -> str:
    """DuckDB replay of q_og_image_caption — same synthesized HTML."""
    from dblp_crawler_spark.sources.webparse import og_image_caption_sql

    d = "CAST(doc_id AS VARCHAR)"
    src = f"""(
        SELECT 'https://o' || CAST(doc_id % 9 AS VARCHAR) || '.org/p' || {d}
                 AS url,
               CASE doc_id % 4
                 WHEN 0 THEN '<meta property="og:title" content="Post ' || {d}
                   || '"><meta property="og:image" content="/img/' || {d}
                   || '.jpg"><meta property="og:image:alt" content="hero '
                   || {d} || '"><meta property="og:description" content="about '
                   || {d} || '">'
                 WHEN 1 THEN '<meta content=''https://cdn.example/' || {d}
                   || '.png'' name=''og:image''>'
                 WHEN 2 THEN '<meta property="og:image" content="first' || {d}
                   || '.jpg"><meta property="og:image" content="second.jpg">'
                 ELSE '<html>no og tags</html>' END AS html
        FROM documents
    )"""
    return og_image_caption_sql(src)


def _pipeline_multilingual_budget_oracle() -> str:
    """DuckDB replay of q_pipeline_multilingual_budget — the same
    fertility and mixture fragments joined on lang."""
    from dblp_crawler_spark.operators.textstats import (
        temperature_mixture_sql,
        tokenizer_fertility_sql,
    )

    return f"""
        WITH mb_f AS ({tokenizer_fertility_sql("documents")}),
        mb_m AS ({temperature_mixture_sql("documents", source_col="lang")})
        SELECT f.lang, f.n_docs, f.n_bpe_tokens, f.chars_per_bpe_token,
               m.temp_share, m.boost,
               CAST(floor(m.temp_share * 1000000) AS BIGINT) AS budget_tokens
        FROM mb_f f JOIN mb_m m ON m.source = f.lang
    """


def _seed_distance_oracle() -> str:
    """DuckDB replay of q_seed_distance — same bulk + planted chain
    and seed set through the unrolled rounds."""
    from dblp_crawler_spark.operators.hits import seed_distance_sql

    edges = """(
        SELECT 'h' || CAST(doc_id % 19 AS VARCHAR) AS src,
               'h' || CAST((doc_id * 5 + 2) % 19 AS VARCHAR) AS dst
        FROM documents
        UNION ALL
        SELECT CASE WHEN doc_id = 0 THEN 'h2'
                    ELSE 'far' || CAST(doc_id - 1 AS VARCHAR) END AS src,
               'far' || CAST(doc_id AS VARCHAR) AS dst
        FROM documents WHERE doc_id < 6
    )"""
    seeds = "(SELECT 'h0' AS id UNION ALL SELECT 'h5' AS id)"
    return seed_distance_sql(edges, seeds, rounds=12)


def _byte_budget_admission_oracle() -> str:
    """DuckDB replay of q_byte_budget_admission."""
    from dblp_crawler_spark.operators.budget import byte_budget_admission_sql

    cand = """(
        SELECT 'h' || CAST(doc_id % 13 AS VARCHAR) || '.org' AS host,
               '/p' || CAST(doc_id AS VARCHAR) AS url,
               doc_id * 7 % 101 AS priority,
               doc_id * 1717 % 90000 + 10000 AS bytes_est
        FROM documents
    )"""
    return byte_budget_admission_sql(cand, budget_bytes=200_000)


def _embedding_drift_oracle() -> str:
    """DuckDB replay of q_embedding_drift — same planted flip and
    even/odd split."""
    from dblp_crawler_spark.operators.similarity import embedding_drift_sql

    flipped = """
        SELECT vec_id, label,
               list_transform(embedding, v -> (CAST(v AS DOUBLE) + 0.5)
                 * CASE WHEN label % 7 = 0 AND vec_id % 2 = 1
                        THEN -1.0 ELSE 1.0 END) AS embedding
        FROM embeddings
    """
    a = f"(SELECT * FROM ({flipped}) ed_fa WHERE vec_id % 2 = 0)"
    b = f"(SELECT * FROM ({flipped}) ed_fb WHERE vec_id % 2 = 1)"
    return embedding_drift_sql(a, b)


def _url_blocklist_oracle() -> str:
    """DuckDB replay of q_url_blocklist — same URL synthesis and
    planted pattern dim."""
    from dblp_crawler_spark.operators.frontier import url_blocklist_sql

    urls = """(
        SELECT 'https://' ||
               CASE WHEN doc_id % 9 = 0
                    THEN 'sub' || CAST(doc_id % 3 AS VARCHAR) || '.bad7.example'
                    ELSE 's' || CAST(doc_id % 8 AS VARCHAR) || '.org' END ||
               CASE WHEN doc_id % 7 = 0 THEN '/private/p' ELSE '/p' END ||
               CAST(doc_id AS VARCHAR) ||
               CASE WHEN doc_id % 13 = 0 THEN '?utm_spy=1' ELSE '' END AS url
        FROM documents
    )"""
    rows = " UNION ALL ".join(
        f"SELECT '{k}' AS kind, '{p}' AS pattern" for k, p in _BL_PATTERNS)
    return url_blocklist_sql(urls, f"({rows})")


def _text_url_mentions_oracle() -> str:
    """DuckDB replay of q_text_url_mentions — same planted
    citations."""
    from dblp_crawler_spark.sources.webparse import text_url_mentions_sql

    cite = ("' see https://cite' || CAST(doc_id % 31 AS VARCHAR)"
            " || '.org/p' || CAST(doc_id % 17 AS VARCHAR) || '.'")
    src = f"""(
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN text || {cite}
                    WHEN doc_id % 5 = 1 THEN text || {cite} || {cite}
                    ELSE text END AS text
        FROM documents
    )"""
    return text_url_mentions_sql(src)


def _order_divergence_oracle() -> str:
    """DuckDB replay of q_order_divergence — same planted swap."""
    from dblp_crawler_spark.operators.audit import order_divergence_sql

    a = """(
        SELECT doc_id AS seq,
               'https://h' || CAST(doc_id % 9 AS VARCHAR) || '.org/p'
                 || CAST(doc_id AS VARCHAR) AS url
        FROM documents
    )"""
    b = """(
        SELECT doc_id AS seq,
               'https://h' || CAST(sw % 9 AS VARCHAR) || '.org/p'
                 || CAST(sw AS VARCHAR) AS url
        FROM (SELECT doc_id,
                     CASE doc_id WHEN 100 THEN 200 WHEN 200 THEN 100
                          ELSE doc_id END AS sw
              FROM documents)
    )"""
    return order_divergence_sql(a, b)


def _pipeline_image_discovery_oracle() -> str:
    """DuckDB replay of q_pipeline_image_discovery — same page/
    sitemap synthesis through the same operator fragments."""
    from dblp_crawler_spark.operators.scheduler import robots_decide_sql
    from dblp_crawler_spark.sources.webparse import (
        extract_images_sql,
        sitemap_images_sql,
    )

    d = "CAST(doc_id AS VARCHAR)"
    hh = "CAST(doc_id % 8 AS VARCHAR)"
    img = (f"'https://h' || {hh} || '.org' || "
           f"CASE WHEN doc_id % 6 = 0 THEN '/private' ELSE '' END"
           f" || '/i/' || {d} || '.jpg'")
    page_url = f"'https://h' || {hh} || '.org/g/' || {d}"
    pages = f"""(
        SELECT {page_url} AS url,
               '<img src="' || {img} || '" alt="alt text ' || {d} || '">'
               || CASE WHEN doc_id % 4 = 0
                       THEN '<img src="data:image/png;base64,xx">'
                       ELSE '' END AS html
        FROM documents
    )"""
    sm = f"""(
        SELECT 'h' || {hh} || '.org' AS host,
               '<urlset><url><loc>' || {page_url}
               || '</loc><image:image><image:loc>' || {img}
               || '</image:loc><image:caption>declared caption ' || {d}
               || '</image:caption></image:image></url></urlset>'
                 AS sitemap_xml
        FROM documents WHERE doc_id % 3 = 0
    )"""
    rules = """(
        SELECT DISTINCT 'h' || CAST(doc_id % 8 AS VARCHAR) || '.org' AS host,
               'disallow' AS rule, '/private' AS pattern
        FROM documents
    )"""
    urls = "(SELECT image_url AS url FROM id_best)"
    return f"""
        WITH id_dec AS (
          SELECT image_url, page_url, caption, 'sitemap' AS source
          FROM ({sitemap_images_sql(sm)})
        ), id_par AS (
          SELECT img_url AS image_url, url AS page_url, alt AS caption,
                 'html' AS source
          FROM ({extract_images_sql(pages)})
        ), id_cand AS (
          SELECT DISTINCT * FROM (
            SELECT * FROM id_dec UNION ALL SELECT * FROM id_par)
        ), id_best AS (
          SELECT image_url, page_url, caption, source FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY image_url
              ORDER BY CASE WHEN source = 'sitemap' THEN 1 ELSE 0 END DESC,
                       page_url, COALESCE(caption, '')) AS rn
            FROM id_cand
          ) WHERE rn = 1
        ), id_adm AS (
          SELECT url, allowed FROM ({robots_decide_sql(urls, rules)})
        )
        SELECT b.image_url, b.page_url, b.caption, b.source, a.allowed
        FROM id_best b JOIN id_adm a ON a.url = b.image_url
    """


def _exif_software_oracle() -> str:
    """DuckDB replay of q_exif_software."""
    from dblp_crawler_spark.operators.sniff import (
        exif_software_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_SW_CASES[:-1]))
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_SW_CASES)}{whens}
                 ELSE '{_SW_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} sw_src)"
    return exif_software_sql(staged)


def _sitemap_images_oracle() -> str:
    """DuckDB replay of q_sitemap_images — same synthesized XML."""
    from dblp_crawler_spark.sources.webparse import sitemap_images_sql

    d = "CAST(doc_id AS VARCHAR)"
    hh = "CAST(doc_id % 10 AS VARCHAR)"
    img_host = (f"CASE WHEN doc_id % 3 = 0 THEN 'https://cdn' || {hh} || '.net'"
                f" ELSE 'https://h' || {hh} || '.org' END")
    cap = (f"CASE WHEN doc_id % 2 = 0 THEN '<image:caption>photo number ' || {d}"
           f" || '</image:caption>' ELSE '' END")
    ttl = (f"CASE WHEN doc_id % 4 = 0 THEN '<image:title>t' || {d}"
           f" || '</image:title>' ELSE '' END")
    second = (f"CASE WHEN doc_id % 5 = 0 THEN '<image:image><image:loc>' || "
              f"{img_host} || '/i/' || {d} || "
              f"'b.jpg</image:loc></image:image>' ELSE '' END")
    src = f"""(
        SELECT 'h' || {hh} || '.org' AS host,
               '<urlset><url><loc>https://h' || {hh} || '.org/g/' || {d}
               || '</loc><image:image><image:loc>' || {img_host} || '/i/'
               || {d} || '.jpg</image:loc>' || {cap} || {ttl}
               || '</image:image>' || {second} || '</url></urlset>'
               AS sitemap_xml
        FROM documents
    )"""
    return sitemap_images_sql(src)


def _sitemap_videos_oracle() -> str:
    """DuckDB replay of q_sitemap_videos — same synthesized XML."""
    from dblp_crawler_spark.sources.webparse import sitemap_videos_sql

    d = "CAST(doc_id AS VARCHAR)"
    hh = "CAST(doc_id % 10 AS VARCHAR)"
    loc = (f"CASE WHEN doc_id % 3 = 0 THEN"
           f" '<video:player_loc allow_embed=\"yes\">https://play.ex' || {hh}"
           f" || '.com/e/' || {d} || '</video:player_loc>'"
           f" ELSE '<video:content_loc>https://cdn' || {hh} || '.net/v/'"
           f" || {d} || '.mp4</video:content_loc>' END")
    dur = (f"CASE WHEN doc_id % 5 = 0 THEN ''"
           f" WHEN doc_id % 4 = 0 THEN '<video:duration>99999</video:duration>'"
           f" ELSE '<video:duration>' || CAST((doc_id % 600) + 30 AS VARCHAR)"
           f" || '</video:duration>' END")
    src = f"""(
        SELECT 'h' || {hh} || '.org' AS host,
               '<urlset><url><loc>https://h' || {hh} || '.org/w/' || {d}
               || '</loc><video:video>' || {loc}
               || '<video:thumbnail_loc>https://cdn' || {hh} || '.net/t/'
               || {d} || '.jpg</video:thumbnail_loc><video:title>Clip '
               || {d} || '</video:title><video:description>about clip '
               || {d} || '</video:description>' || {dur}
               || '</video:video></url></urlset>' AS sitemap_xml
        FROM documents
    )"""
    return sitemap_videos_sql(src)


def _outlink_profile_oracle() -> str:
    """DuckDB replay of q_outlink_profile — same edge synthesis."""
    from dblp_crawler_spark.sources.webparse import outlink_profile_sql

    edges = """(
        SELECT 'https://site' || CAST(doc_id % 11 AS VARCHAR) || '.org/p'
               || CAST(doc_id % 7 AS VARCHAR) AS url,
               CASE WHEN doc_id % 11 = 0
                    THEN 'https://spam' || CAST(doc_id AS VARCHAR) || '.net/x'
                    WHEN doc_id % 24 < 20
                    THEN 'https://site' || CAST(doc_id % 11 AS VARCHAR)
                         || '.org/a' || CAST(doc_id AS VARCHAR)
                    ELSE 'https://ref' || CAST(doc_id % 24 AS VARCHAR)
                         || '.org/cite' END AS out_url
        FROM documents
    )"""
    return outlink_profile_sql(edges)


def _meta_refresh_oracle() -> str:
    """DuckDB replay of q_meta_refresh — same synthesized HTML."""
    from dblp_crawler_spark.sources.webparse import meta_refresh_sql

    d = "CAST(doc_id AS VARCHAR)"
    src = f"""(
        SELECT 'https://p' || CAST(doc_id % 13 AS VARCHAR) || '.org/x' || {d}
                 AS url,
               CASE doc_id % 5
                 WHEN 0 THEN '<html><meta http-equiv=''refresh'' content=''0; url=/n'
                        || {d} || '''></html>'
                 WHEN 1 THEN '<meta content="3;url=https://q.org/t' || {d}
                        || '" http-equiv="refresh">'
                 WHEN 2 THEN '<meta http-equiv=''refresh'' content=''300''>'
                 WHEN 3 THEN '<meta http-equiv=''refresh'' content=''30; url=slow'
                        || {d} || '.html''>'
                 ELSE '<html>no refresh</html>' END AS html
        FROM documents
    )"""
    return meta_refresh_sql(src)


def _politeness_compliance_oracle() -> str:
    """DuckDB replay of q_politeness_compliance."""
    from dblp_crawler_spark.operators.scheduler import politeness_compliance_sql

    log = """(
        SELECT 'h' || CAST(user_id % 11 AS VARCHAR) || '.org' AS host,
               '/e' || CAST(event_id AS VARCHAR) AS url,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us
        FROM events
    )"""
    return politeness_compliance_sql(log, delay_us=1_000_000_000)


def _dns_churn_oracle() -> str:
    """DuckDB replay of q_dns_churn — same bulk + planted flux."""
    from dblp_crawler_spark.operators.hostdup import dns_churn_sql

    src = """(
        SELECT 'h' || CAST(user_id % 9 AS VARCHAR) || '.org' AS host,
               '10.0.' || CAST(user_id % 2 AS VARCHAR) || '.'
                 || CAST(user_id % 3 AS VARCHAR) AS ip,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us
        FROM events
        UNION ALL
        SELECT 'flux.example', '66.0.0.' || CAST(event_id AS VARCHAR),
               event_id * 60000000
        FROM events WHERE event_id < 8
    )"""
    return dns_churn_sql(src)


def _temperature_mixture_oracle() -> str:
    """DuckDB replay of q_temperature_mixture."""
    from dblp_crawler_spark.operators.textstats import temperature_mixture_sql

    return temperature_mixture_sql("documents")


def _changefreq_audit_oracle() -> str:
    """DuckDB replay of q_changefreq_audit — same events-derived
    fetch log and enum cycle through changefreq_audit_sql."""
    from dblp_crawler_spark.operators.recrawl import changefreq_audit_sql

    url = ("'https://h' || CAST(user_id % 7 AS VARCHAR) || '.org/p'"
           " || CAST(user_id AS VARCHAR)")
    whens = " ".join(
        f"WHEN {i} THEN '{x}'" for i, x in enumerate(_CFA_ENUM))
    fetches = f"""(
        SELECT {url} AS url, ts, event_type AS fingerprint FROM events
    )"""
    declared = f"""(
        SELECT {url} AS url,
               CASE user_id % 7 {whens} END AS changefreq
        FROM (SELECT DISTINCT user_id FROM events)
    )"""
    return changefreq_audit_sql(fetches, declared)


def _pipeline_trap_quarantine_oracle() -> str:
    """DuckDB replay of q_pipeline_trap_quarantine — same link
    synthesis through pagination_chains_sql, same trap fragments and
    verdict precedence."""
    from dblp_crawler_spark.functions.urlnorm import url_trap_flags_sql
    from dblp_crawler_spark.operators.redirects import pagination_chains_sql

    cal = ("'https://cal.example/a/2023/' || CAST(doc_id + {o} AS VARCHAR)"
           " || '/2024/' || CAST(doc_id + {o} AS VARCHAR)")
    links = f"""(
        SELECT 'https://s' || CAST(doc_id % 37 AS VARCHAR)
                 || '.com/list?page=' || CAST(doc_id % 6 AS VARCHAR) AS url,
               'https://s' || CAST(doc_id % 37 AS VARCHAR)
                 || '.com/list?page=' || CAST(doc_id % 6 + 1 AS VARCHAR) AS next_url
        FROM documents WHERE doc_id % 6 < 5
        UNION ALL
        SELECT 'https://trap.example/p' || CAST(doc_id AS VARCHAR),
               'https://trap.example/p' || CAST(doc_id + 1 AS VARCHAR)
        FROM documents WHERE doc_id < 40
        UNION ALL
        SELECT 'https://cyc.example/p' || CAST(doc_id % 3 AS VARCHAR),
               'https://cyc.example/p' || CAST((doc_id + 1) % 3 AS VARCHAR)
        FROM documents WHERE doc_id < 3
        UNION ALL
        SELECT {cal.format(o=1)}, {cal.format(o=2)}
        FROM documents WHERE doc_id < 12
        UNION ALL
        SELECT 'https://s.example/p?sessionid=' || CAST(doc_id AS VARCHAR),
               'https://s.example/p?sessionid=' || CAST(doc_id + 1 AS VARCHAR)
        FROM documents WHERE doc_id < 6
    )"""
    trap = url_trap_flags_sql("url")["is_trap"]
    return f"""
        WITH tq_ch AS (
          SELECT url, complete, page_idx
          FROM ({pagination_chains_sql(links, rounds=5)})
        ), tq_f AS (
          SELECT url, complete, page_idx, {trap} AS is_trap FROM tq_ch
        )
        SELECT *, CASE WHEN NOT complete THEN 'chain_trap'
                       WHEN is_trap THEN 'heuristic_trap'
                       WHEN page_idx > 20 THEN 'deep_pagination'
                       ELSE 'admit' END AS verdict
        FROM tq_f
    """


def _pipeline_image_provenance_oracle() -> str:
    """DuckDB replay of q_pipeline_image_provenance — same planted
    bytes through all four *_sql readers, joined on doc_id, same
    integer majority verdicts."""
    from dblp_crawler_spark.operators.sniff import (
        exif_camera_model_sql,
        exif_thumbnail_sql,
        image_density_sql,
        png_text_chunk_sql,
        sniff_case_sql,
    )

    table = _ip_table()
    whens = " ".join(
        f"WHEN (doc_id % 12) % 3 = {c} AND doc_id % 3 = {i} THEN '{hx}'"
        for (c, i), hx in table.items() if (c, i) != (2, 2)
    )
    src = f"""(
        SELECT doc_id, CASE {whens} ELSE '{table[(2, 2)]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} ip_src)"
    return f"""
        WITH ip_cam AS (
          SELECT doc_id, camera_model FROM ({exif_camera_model_sql(staged)})
        ), ip_txt AS (
          SELECT doc_id, gen_hint FROM ({png_text_chunk_sql(staged)})
        ), ip_den AS (
          SELECT doc_id, dpi_x FROM ({image_density_sql(staged)})
        ), ip_thm AS (
          SELECT doc_id, has_thumbnail FROM ({exif_thumbnail_sql(staged)})
        ), ip_j AS (
          SELECT 'img' || CAST(c.doc_id % 12 AS VARCHAR) || '.example' AS host,
                 camera_model, gen_hint, dpi_x, has_thumbnail
          FROM ip_cam c
          JOIN ip_txt USING (doc_id)
          JOIN ip_den USING (doc_id)
          JOIN ip_thm USING (doc_id)
        ), ip_g AS (
          SELECT host, COUNT(*) AS n_images,
                 COUNT(CASE WHEN camera_model IS NOT NULL THEN 1 END) AS n_camera,
                 COUNT(CASE WHEN gen_hint THEN 1 END) AS n_gen,
                 COUNT(CASE WHEN dpi_x >= 300 THEN 1 END) AS n_highdpi,
                 COUNT(CASE WHEN has_thumbnail THEN 1 END) AS n_thumb
          FROM ip_j GROUP BY host
        )
        SELECT *, CASE WHEN n_gen * 2 >= n_images THEN 'synthetic'
                       WHEN (n_camera + n_thumb + n_highdpi) * 2 >= n_images
                         THEN 'archival'
                       ELSE 'mixed' END AS verdict
        FROM ip_g
    """


def _pipeline_dedup_keep_best_oracle() -> str:
    """DuckDB replay of q_pipeline_dedup_keep_best — same plant,
    prefix pairing, recursive-CTE components, quality scores, and
    keep_best_sql election."""
    from dblp_crawler_spark.operators.dedup import keep_best_sql

    quality = f"""CAST(ROUND(
        (CASE WHEN len({_TOK}) BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
        + (CASE WHEN (CASE WHEN length(text) > 0 THEN
             length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))::DOUBLE
               / length(text) ELSE 0.0 END) <= 0.1 THEN 0.3 ELSE 0.0 END)
        + (CASE WHEN (CASE WHEN len({_TOK}) > 0 THEN
             len(list_filter({_TOK}, t -> list_contains(['{SW_LIST}'], t)))::DOUBLE
               / len({_TOK}) ELSE 0.0 END) >= 0.01 THEN 0.3 ELSE 0.0 END), 6)
        AS DOUBLE)"""
    # no trailing aliases: keep_best_sql appends its own c/s aliases
    inner = keep_best_sql("(SELECT id, component FROM kb_cc)",
                          "(SELECT id, score FROM kb_sc)")
    return f"""
        WITH RECURSIVE kb_t AS (
          SELECT d.doc_id,
                 CASE WHEN d.doc_id % 8 IN (1, 4)
                      THEN b.text || '{_KB_PUNCT}' ELSE b.text END AS text
          FROM documents d JOIN documents b
            ON b.doc_id = d.doc_id
               - (CASE WHEN d.doc_id % 8 IN (1, 5) THEN 1 ELSE 0 END)
        ), kb_fp AS (
          SELECT doc_id, text, substring(text, 1, 64) AS fp FROM kb_t
        ), kb_pairs AS (
          SELECT a.doc_id AS a, b.doc_id AS b
          FROM kb_fp a JOIN kb_fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        ), kb_sym AS (
          SELECT a AS id, b AS nbr FROM kb_pairs
          UNION
          SELECT b AS id, a AS nbr FROM kb_pairs
        ), kb_reach(id, comp) AS (
          SELECT id, id FROM kb_sym
          UNION
          SELECT s.nbr, r.comp FROM kb_reach r JOIN kb_sym s ON s.id = r.id
          WHERE r.comp < s.nbr
        ), kb_cc AS (
          SELECT id, MIN(comp) AS component FROM kb_reach GROUP BY id
        ), kb_sc AS (
          SELECT doc_id AS id, {quality} AS score FROM kb_fp
        )
        SELECT id AS doc_id, keep_id AS keep_doc_id, score, keep_score
        FROM ({inner})
    """


def _exif_thumbnail_oracle() -> str:
    """DuckDB replay of q_exif_thumbnail — same planted hex through
    exif_thumbnail_sql's shared staging."""
    from dblp_crawler_spark.operators.sniff import (
        exif_thumbnail_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_THUMB_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_THUMB_CASES)}{whens}
                 ELSE '{_THUMB_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} et_src)"
    return exif_thumbnail_sql(staged)


def _variant_preference_oracle() -> str:
    """DuckDB replay of q_variant_preference — same quartet
    synthesis through variant_preference_sql."""
    from dblp_crawler_spark.operators.hostdup import variant_preference_sql

    src = """(
        SELECT CASE doc_id % 4 WHEN 0 THEN 'http://'
                 WHEN 1 THEN 'http://www.'
                 WHEN 2 THEN 'https://'
                 ELSE 'https://www.' END
               || 'v' || CAST(doc_id % 7 AS VARCHAR) || '.org/p'
               || CAST(doc_id % 11 AS VARCHAR) AS url
        FROM documents
    )"""
    return variant_preference_sql(src)


def _tokenizer_fertility_oracle() -> str:
    """DuckDB replay of q_tokenizer_fertility."""
    from dblp_crawler_spark.operators.textstats import tokenizer_fertility_sql

    return tokenizer_fertility_sql("documents")


def _image_density_oracle() -> str:
    """DuckDB replay of q_image_density — same planted hex through
    image_density_sql's staged walk."""
    from dblp_crawler_spark.operators.sniff import (
        image_density_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_DENSITY_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_DENSITY_CASES)}{whens}
                 ELSE '{_DENSITY_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} dn_src)"
    return image_density_sql(staged)


def _parallel_corpus_mine_oracle() -> str:
    """DuckDB replay of q_parallel_corpus_mine — same synthesized
    hreflang graph and doc texts through parallel_corpus_mine_sql."""
    from dblp_crawler_spark.sources.webparse import parallel_corpus_mine_sql

    en = ("'https://s' || CAST(doc_id % 31 AS VARCHAR) || '.org/en/p'"
          " || CAST(doc_id AS VARCHAR)")
    fr = ("'https://s' || CAST(doc_id % 31 AS VARCHAR) || '.org/fr/p'"
          " || CAST(doc_id AS VARCHAR)")
    alt = f"""(
        SELECT {en} AS url,
               CASE WHEN doc_id % 5 = 2 THEN 'it' ELSE 'fr' END AS hreflang,
               {fr} AS alt_url
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT {fr} AS url, 'en' AS hreflang, {en} AS alt_url
        FROM documents WHERE doc_id < 400 AND doc_id % 5 <> 4
    )"""
    docs = f"""(
        SELECT {en} AS url, 'en' AS lang, text
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT {fr} AS url, 'fr' AS lang,
               CASE WHEN doc_id % 5 = 3 THEN 'deux mots'
                    ELSE 'le ' || text END AS text
        FROM documents WHERE doc_id < 400
    )"""
    return parallel_corpus_mine_sql(alt, docs)


def _robots_drift_oracle() -> str:
    """DuckDB replay of q_robots_drift — same URL/rule synthesis
    through robots_drift_sql's dual decision."""
    from dblp_crawler_spark.operators.scheduler import robots_drift_sql

    urls = """(
        SELECT 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.org/'
               || CASE WHEN doc_id % 4 = 0 THEN 'private'
                       WHEN doc_id % 4 = 1 THEN 'pub'
                       WHEN doc_id % 4 = 2 THEN 'private/pub'
                       ELSE 'tmp' END
               || '/d' || CAST(doc_id % 50 AS VARCHAR) AS url
        FROM documents
    )"""
    hosts = """(
        SELECT DISTINCT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.org' AS host
        FROM documents
    )"""
    old = f"""(
        SELECT host, 'disallow' AS rule, '/tmp' AS pattern
        FROM {hosts} rdo_h WHERE host = 'h3.org'
    )"""
    new = f"""(
        SELECT host, 'disallow' AS rule, '/private' AS pattern
        FROM {hosts} rdn_h
        WHERE CAST(substring(host, 2, 1) AS INT) % 2 = 0
        UNION ALL
        SELECT host, 'allow' AS rule, '/private/pub*' AS pattern
        FROM {hosts} rdn_h2
        WHERE CAST(substring(host, 2, 1) AS INT) % 2 = 0
    )"""
    return robots_drift_sql(urls, old, new)


def _pagination_chains_oracle() -> str:
    """DuckDB replay of q_pagination_chains — same link synthesis
    through pagination_chains_sql's unrolled doubling."""
    from dblp_crawler_spark.operators.redirects import pagination_chains_sql

    links = """(
        SELECT 'https://s' || CAST(doc_id % 37 AS VARCHAR)
                 || '.com/list?page=' || CAST(doc_id % 6 AS VARCHAR) AS url,
               'https://s' || CAST(doc_id % 37 AS VARCHAR)
                 || '.com/list?page=' || CAST(doc_id % 6 + 1 AS VARCHAR) AS next_url
        FROM documents WHERE doc_id % 6 < 5
        UNION ALL
        SELECT 'https://trap.example/p' || CAST(doc_id AS VARCHAR),
               'https://trap.example/p' || CAST(doc_id + 1 AS VARCHAR)
        FROM documents WHERE doc_id < 40
        UNION ALL
        SELECT 'https://cyc.example/p' || CAST(doc_id % 3 AS VARCHAR),
               'https://cyc.example/p' || CAST((doc_id + 1) % 3 AS VARCHAR)
        FROM documents WHERE doc_id < 3
        UNION ALL
        SELECT 'https://self.example/p0', 'https://self.example/p0'
        FROM documents WHERE doc_id = 0
    )"""
    return pagination_chains_sql(links, rounds=5)


def _host_kcore_oracle() -> str:
    """DuckDB replay of q_host_kcore — same circulant + planted
    K5/chain synthesis through kcore_sql's unrolled peel."""
    from dblp_crawler_spark.operators.hits import kcore_sql

    s_whens = "".join(
        f" WHEN {i} THEN '{s}'" for i, (s, _) in enumerate(_KCORE_PLANTED[:-1]))
    d_whens = "".join(
        f" WHEN {i} THEN '{d}'" for i, (_, d) in enumerate(_KCORE_PLANTED[:-1]))
    edges = f"""(
        SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
               'h' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR) AS dst
        FROM documents
        UNION ALL
        SELECT CASE doc_id{s_whens} ELSE '{_KCORE_PLANTED[-1][0]}' END AS src,
               CASE doc_id{d_whens} ELSE '{_KCORE_PLANTED[-1][1]}' END AS dst
        FROM documents WHERE doc_id < {len(_KCORE_PLANTED)}
    )"""
    return kcore_sql(edges, k=2, rounds=6)


def _png_text_provenance_oracle() -> str:
    """DuckDB replay of q_png_text_provenance — same planted hex
    through png_text_chunk_sql's chunk-hop chain."""
    from dblp_crawler_spark.operators.sniff import (
        png_text_chunk_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_PNGTXT_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_PNGTXT_CASES)}{whens}
                 ELSE '{_PNGTXT_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} px_src)"
    return png_text_chunk_sql(staged)


def _mojibake_gate_oracle() -> str:
    """DuckDB replay of q_mojibake_gate — same planted residue
    (shared constants) through mojibake_stats_sql."""
    from dblp_crawler_spark.operators.textstats import mojibake_stats_sql

    src = f"""(
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' {_MOJI_RESIDUE}'
                    WHEN doc_id % 7 = 1 THEN '{_MOJI_REPL_DOC}'
                    ELSE text END AS text
        FROM documents
    )"""
    return mojibake_stats_sql(src)


def _exif_gps_oracle() -> str:
    """DuckDB replay of q_exif_gps: same planted payload hex (shared
    constants) through exif_gps_flag_sql's staged walk; fmt
    re-derived from the shared MAGIC_TABLE."""
    from dblp_crawler_spark.operators.sniff import (
        exif_gps_flag_sql,
        sniff_case_sql,
    )

    src = f"""(
        SELECT doc_id,
               CASE CAST(doc_id % 4 AS INT)
                 WHEN 0 THEN '{_GPS_JPEG}'
                 WHEN 1 THEN '{_GPS_TIFF}'
                 WHEN 2 THEN '{_EXIF_JPEG_PREFIX}' || '0100' || '{_EXIF_SUFFIX}'
                 ELSE '{_EXIF_PNG}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} eg_src)"
    return exif_gps_flag_sql(staged)


def _events_funnel_oracle() -> str:
    from dblp_crawler_spark.streaming.events import funnel_sql

    return funnel_sql("events")


def _events_retention_oracle() -> str:
    from dblp_crawler_spark.streaming.events import retention_cohorts_sql

    return retention_cohorts_sql("events")


def _link_reciprocity_oracle() -> str:
    """DuckDB replay of q_link_reciprocity: same synthetic graph
    (base + every-4th reversed plant), same swapped self-join."""
    from dblp_crawler_spark.operators.hits import link_reciprocity_sql

    edges = """(
        SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
               'h' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR) AS dst
        FROM documents
        UNION ALL
        SELECT 'h' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR) AS src,
               'h' || CAST(doc_id % 23 AS VARCHAR) AS dst
        FROM documents WHERE doc_id % 4 = 0
    )"""
    return link_reciprocity_sql(edges)


def _sitemap_coverage_oracle() -> str:
    """DuckDB replay of q_sitemap_coverage: same planted declared/
    fetched sets (partial overlap + undeclared extras)."""
    from dblp_crawler_spark.sources.webparse import sitemap_coverage_sql

    declared = """(
        SELECT 'h' || CAST(doc_id % 10 AS VARCHAR) AS host,
               'https://h' || CAST(doc_id % 10 AS VARCHAR)
               || '/p/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents WHERE doc_id % 3 <> 2
    )"""
    fetched = """(
        SELECT 'h' || CAST(doc_id % 10 AS VARCHAR) AS host,
               'https://h' || CAST(doc_id % 10 AS VARCHAR)
               || '/p/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents WHERE doc_id % 2 = 0 OR doc_id % 7 = 1
        UNION ALL
        SELECT 'h' || CAST(doc_id % 10 AS VARCHAR) AS host,
               'https://h' || CAST(doc_id % 10 AS VARCHAR)
               || '/p/' || CAST(doc_id AS VARCHAR) || '?session=1' AS url
        FROM documents WHERE doc_id % 9 = 0
    )"""
    return sitemap_coverage_sql(declared, fetched)


def _zipf_slope_oracle() -> str:
    from dblp_crawler_spark.operators.textstats import zipf_slope_sql

    return zipf_slope_sql("documents")


def _ip_politeness_oracle() -> str:
    """DuckDB replay of q_ip_politeness: the same synthetic
    pending/dns through ip_politeness_sql's single-window form
    (equivalent to the engine's salted two-level pop)."""
    from dblp_crawler_spark.operators.scheduler import ip_politeness_sql

    pending = """(
        SELECT 'http://h' || CAST(doc_id % 50 AS VARCHAR)
               || '/p' || CAST(doc_id AS VARCHAR) AS url,
               'h' || CAST(doc_id % 50 AS VARCHAR) AS host,
               CAST(doc_id % 97 AS BIGINT) AS priority
        FROM documents
    )"""
    dns = """(
        SELECT 'h' || CAST(r AS VARCHAR) AS host,
               'ip' || CAST(r % 12 AS VARCHAR) AS ip
        FROM range(40) t(r)
    )"""
    return ip_politeness_sql(pending, dns, budget=8)


def _caption_quality_oracle() -> str:
    """DuckDB replay of q_caption_quality: same planted junk classes
    through caption_quality_sql."""
    from dblp_crawler_spark.operators.multimodal import caption_quality_sql

    src = """(
        SELECT 'img_' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE CAST(doc_id % 8 AS INT)
                 WHEN 0 THEN 'IMG_' || CAST(doc_id AS VARCHAR)
                 WHEN 1 THEN 'see https://ex.org/g' || CAST(doc_id AS VARCHAR)
                             || ' for more'
                 WHEN 2 THEN 'mountain lake shutterstock stock photo'
                 WHEN 3 THEN 'image of a photo'
                 WHEN 4 THEN 'dog dog dog dog puppy dog'
                 WHEN 5 THEN 'ok'
                 ELSE substr(text, 1, 80) END AS caption
        FROM documents
    )"""
    return caption_quality_sql(src)


def _pmi_collocations_oracle() -> str:
    """DuckDB replay of q_pmi_collocations: same planted glued
    phrase, same tokenizer/arithmetic/cut."""
    from dblp_crawler_spark.operators.textstats import pmi_collocations_sql

    src = """(
        SELECT CASE WHEN doc_id % 11 = 3
                    THEN 'quantum entanglement beats noise. ' || text
                    ELSE text END AS text
        FROM documents
    )"""
    return pmi_collocations_sql(src, k=15, min_count=4)


def _stratified_sample_oracle() -> str:
    """DuckDB replay of q_stratified_sample: portable hash order,
    single-window form."""
    from dblp_crawler_spark.operators.textstats import stratified_sample_sql

    return stratified_sample_sql(
        "(SELECT doc_id, lang FROM documents)", k=7, stratum_col="lang", seed=3
    )


def _code_detect_oracle() -> str:
    """DuckDB replay of q_code_detect: same planted code rows, same
    linear score."""
    from dblp_crawler_spark.operators.textstats import code_prose_detect_sql

    src = """(
        SELECT doc_id,
               CASE WHEN doc_id % 6 = 2
                    THEN 'def f_' || CAST(doc_id AS VARCHAR)
                         || '(x): return [i*i for i in range(x) if i % 2 == 0];'
                    ELSE text END AS text
        FROM documents
    )"""
    return code_prose_detect_sql(src)


def _svg_structure_oracle() -> str:
    """DuckDB replay of q_svg_structure — same planted SVG strings,
    same shared patterns through svg_structure_sql."""
    from dblp_crawler_spark.sources.webparse import svg_structure_sql

    whens = "".join(
        f" WHEN {i} THEN '{s}'" for i, s in enumerate(_SVG_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_SVG_CASES)}{whens}
                 ELSE '{_SVG_CASES[-1]}' END AS svg_text
        FROM documents
    )"""
    return svg_structure_sql(src)


def _ico_structure_oracle() -> str:
    """DuckDB replay of q_ico_structure — same planted hex through
    ico_structure_sql's staged reads."""
    from dblp_crawler_spark.operators.sniff import (
        ico_structure_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_ICO_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_ICO_CASES)}{whens}
                 ELSE '{_ICO_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} ic_src)"
    return ico_structure_sql(staged)


def _jpeg_colorspace_oracle() -> str:
    """DuckDB replay of q_jpeg_colorspace — same planted hex through
    jpeg_colorspace_sql's linear CTE walk."""
    from dblp_crawler_spark.operators.sniff import (
        jpeg_colorspace_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_JCS_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_JCS_CASES)}{whens}
                 ELSE '{_JCS_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} jc_src)"
    return jpeg_colorspace_sql(staged)


def _tiff_structure_oracle() -> str:
    """DuckDB replay of q_tiff_structure — same planted hex through
    tiff_structure_sql's typed IFD scan."""
    from dblp_crawler_spark.operators.sniff import (
        sniff_case_sql,
        tiff_structure_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_TIFF_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_TIFF_CASES)}{whens}
                 ELSE '{_TIFF_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} tf_src)"
    return tiff_structure_sql(staged)


def _png_animated_oracle() -> str:
    """DuckDB replay of q_png_animated — same planted hex through
    png_animated_sql's linear CTE chunk walk."""
    from dblp_crawler_spark.operators.sniff import (
        png_animated_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_APNG_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_APNG_CASES)}{whens}
                 ELSE '{_APNG_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} pa_src)"
    return png_animated_sql(staged)


def _url_param_significance_oracle() -> str:
    """DuckDB replay of q_url_param_significance — same planted fetch
    log through url_param_significance_sql."""
    from dblp_crawler_spark.functions.urlnorm import url_param_significance_sql

    src = """(
        SELECT 's' || CAST(doc_id % 4 AS VARCHAR) || '.example' AS host,
               'https://s' || CAST(doc_id % 4 AS VARCHAR) || '.example/p'
                 || CAST(doc_id // 8 AS VARCHAR) || '?id='
                 || CAST(iv AS VARCHAR) || '&utm='
                 || CAST(doc_id % 5 AS VARCHAR) AS url,
               'h' || CAST(doc_id % 4 AS VARCHAR) || '-'
                 || CAST(doc_id // 8 AS VARCHAR) || '-'
                 || CAST(iv AS VARCHAR) AS content_hash
        FROM documents, (SELECT unnest([0, 1]) AS iv)
    ) up_src"""
    return url_param_significance_sql(src)


def _x_robots_tag_oracle() -> str:
    """DuckDB replay of q_x_robots_tag — same planted header blocks
    through x_robots_tag_sql. CRLFs are spelled chr(13)||chr(10) so
    the SQL literal carries REAL control bytes like the Spark lit."""
    from dblp_crawler_spark.sources.webparse import x_robots_tag_sql

    def sql_lit(s: str) -> str:
        return "'" + s.replace("'", "''").replace(
            "\r\n", "' || chr(13) || chr(10) || '") + "'"

    whens = "".join(
        f" WHEN {i} THEN {sql_lit(hx)}" for i, hx in enumerate(_XRT_CASES[:-1])
    )
    src = f"""(
        SELECT 'https://x.example/' || CAST(doc_id AS VARCHAR) AS url,
               CASE doc_id % {len(_XRT_CASES)}{whens}
                 ELSE {sql_lit(_XRT_CASES[-1])} END AS headers
        FROM documents
    ) xrt_src"""
    return x_robots_tag_sql(src)


def _retry_after_oracle() -> str:
    """DuckDB replay of q_retry_after — same planted (status, header)
    pairs through retry_after_sql (CRLFs as chr calls, the
    x_robots_tag discipline)."""
    from dblp_crawler_spark.operators.freshness import retry_after_sql

    def sql_lit(s: str) -> str:
        return "'" + s.replace("'", "''").replace(
            "\r\n", "' || chr(13) || chr(10) || '") + "'"

    s_whens = "".join(
        f" WHEN {i} THEN {s}" for i, (s, _) in enumerate(_RA_CASES[:-1])
    )
    h_whens = "".join(
        f" WHEN {i} THEN {sql_lit(hx)}" for i, (_, hx) in enumerate(_RA_CASES[:-1])
    )
    src = f"""(
        SELECT 'https://r.example/' || CAST(doc_id AS VARCHAR) AS url,
               CASE doc_id % {len(_RA_CASES)}{s_whens}
                 ELSE {_RA_CASES[-1][0]} END AS status,
               CASE doc_id % {len(_RA_CASES)}{h_whens}
                 ELSE {sql_lit(_RA_CASES[-1][1])} END AS headers
        FROM documents
    ) ra_src"""
    return retry_after_sql(src)


def _pipeline_header_policy_oracle() -> str:
    """DuckDB replay of q_pipeline_header_policy — same planted
    (status, headers) pairs through header_policy_sql's chained
    stage replays."""
    from dblp_crawler_spark.operators.freshness import header_policy_sql

    def sql_lit(s: str) -> str:
        return "'" + s.replace("'", "''").replace(
            "\r\n", "' || chr(13) || chr(10) || '") + "'"

    s_whens = "".join(
        f" WHEN {i} THEN {s}" for i, (s, _) in enumerate(_HP_CASES[:-1])
    )
    h_whens = "".join(
        f" WHEN {i} THEN {sql_lit(hx)}" for i, (_, hx) in enumerate(_HP_CASES[:-1])
    )
    src = f"""(
        SELECT 'https://hp.example/' || CAST(doc_id AS VARCHAR) AS url,
               CASE doc_id % {len(_HP_CASES)}{s_whens}
                 ELSE {_HP_CASES[-1][0]} END AS status,
               CASE doc_id % {len(_HP_CASES)}{h_whens}
                 ELSE {sql_lit(_HP_CASES[-1][1])} END AS headers
        FROM documents
    ) hp_src"""
    return header_policy_sql(src)


def _hreflang_reciprocity_oracle() -> str:
    """DuckDB replay of q_hreflang_reciprocity — same planted
    translation graph through hreflang_reciprocity_sql."""
    from dblp_crawler_spark.sources.webparse import hreflang_reciprocity_sql

    u = "'https://h.example/u' || CAST(doc_id // 5 AS VARCHAR)"
    src = f"""(
        SELECT CASE doc_id % 5
                 WHEN 0 THEN {u} || '.en' WHEN 1 THEN {u} || '.de'
                 WHEN 2 THEN {u} || '.en' WHEN 3 THEN {u} || '.fr'
                 ELSE {u} || '.fr' END AS url,
               CASE doc_id % 5 WHEN 0 THEN 'de' WHEN 1 THEN 'en'
                 WHEN 2 THEN 'it' WHEN 3 THEN 'de' ELSE 'fr' END AS hreflang,
               CASE doc_id % 5
                 WHEN 0 THEN {u} || '.de' WHEN 1 THEN {u} || '.en'
                 WHEN 2 THEN {u} || '.it' WHEN 3 THEN {u} || '.de'
                 ELSE {u} || '.fr' END AS alt_url
        FROM documents
    ) hr_src"""
    return hreflang_reciprocity_sql(src)


def _range_reassembly_oracle() -> str:
    """DuckDB replay of q_range_reassembly — same planted part grid
    through range_reassembly_sql's parser + window chain."""
    from dblp_crawler_spark.operators.freshness import range_reassembly_sql

    s_whens = "".join(
        f" WHEN {i} THEN {ps}" for i, (ps, _) in enumerate(_CR_PARTS[:-1])
    )
    e_whens = "".join(
        f" WHEN {i} THEN {pe}" for i, (_, pe) in enumerate(_CR_PARTS[:-1])
    )
    idx = "((doc_id // 4) % 4) * 4 + doc_id % 4"
    src = f"""(
        SELECT 'https://m.example/f' || CAST(doc_id // 4 AS VARCHAR) AS url,
               'Content-Range: bytes '
                 || CAST(CASE {idx}{s_whens} ELSE {_CR_PARTS[-1][0]} END
                         AS VARCHAR)
                 || '-'
                 || CAST(CASE {idx}{e_whens} ELSE {_CR_PARTS[-1][1]} END
                         AS VARCHAR)
                 || '/1000' AS headers
        FROM documents
    ) cr_src"""
    return range_reassembly_sql(src)


def _revalidation_headers_oracle() -> str:
    """DuckDB replay of q_revalidation_headers — same planted headers
    through revalidation_headers_sql (CRLFs as chr calls)."""
    from dblp_crawler_spark.operators.freshness import revalidation_headers_sql

    def sql_lit(s: str) -> str:
        return "'" + s.replace("'", "''").replace(
            "\r\n", "' || chr(13) || chr(10) || '") + "'"

    whens = "".join(
        f" WHEN {i} THEN {sql_lit(hx)}" for i, hx in enumerate(_RV_CASES[:-1])
    )
    src = f"""(
        SELECT 'https://v.example/' || CAST(doc_id AS VARCHAR) AS url,
               CASE doc_id % {len(_RV_CASES)}{whens}
                 ELSE {sql_lit(_RV_CASES[-1])} END AS headers
        FROM documents
    ) rv_src"""
    return revalidation_headers_sql(src)


def _strip_boilerplate_oracle() -> str:
    """DuckDB replay of q_strip_boilerplate — same planted pages
    through strip_boilerplate_sql."""
    from dblp_crawler_spark.sources.webparse import strip_boilerplate_sql

    src = """(
        SELECT CASE WHEN doc_id % 6 = 5
                    THEN 'solo' || CAST(doc_id AS VARCHAR)
                    ELSE 'b' || CAST(doc_id % 6 AS VARCHAR) || '.example'
               END AS host,
               '/p' || CAST(doc_id AS VARCHAR) AS url,
               'Home | About | b' || CAST(doc_id % 6 AS VARCHAR)
                 || chr(10) || 'body ' || CAST(doc_id AS VARCHAR)
                 || ' alpha' || chr(10) || chr(10)
                 || 'body ' || CAST(doc_id AS VARCHAR) || ' beta'
                 || chr(10) || '(c) 2026 host b'
                 || CAST(doc_id % 6 AS VARCHAR) AS text
        FROM documents
    ) sb_src"""
    return strip_boilerplate_sql(src)


def _pipeline_host_scorecard_oracle() -> str:
    """DuckDB replay of q_pipeline_host_scorecard — same three
    planted frames through host_scorecard_sql's chained replays."""
    from dblp_crawler_spark.operators.hostdup import host_scorecard_sql

    probe_src = """(
        SELECT 'c' || CAST(doc_id % 8 AS VARCHAR) AS host,
               '/u' || CAST(doc_id AS VARCHAR) AS url,
               ua_class,
               CASE WHEN doc_id % 8 IN (0, 1)
                    THEN 'h' || CAST(doc_id AS VARCHAR) || '-' || ua_class
                    ELSE 'h' || CAST(doc_id AS VARCHAR) END AS content_hash
        FROM documents, (SELECT unnest(['crawler', 'browser']) AS ua_class)
        WHERE NOT (doc_id % 8 = 6 AND ua_class = 'browser')
    )"""
    page_src = """(
        SELECT 'c' || CAST(doc_id % 8 AS VARCHAR) AS host,
               '/u' || CAST(doc_id AS VARCHAR) AS url,
               CASE WHEN doc_id % 8 IN (0, 2) AND (doc_id // 8) % 2 = 0
                    THEN 'TPL' || CAST(doc_id % 8 AS VARCHAR)
                    ELSE 'u' || CAST(doc_id AS VARCHAR) END AS content_hash
        FROM documents
    )"""
    payload_src = f"""(
        SELECT 'c' || CAST(doc_id % 8 AS VARCHAR) AS host,
               CASE WHEN doc_id % 8 = 3 AND (doc_id // 8) % 2 = 0
                      THEN '{_HSC_JPEG_CUT}'
                    WHEN doc_id % 8 = 3 THEN '{_HSC_JPEG_OK}'
                    WHEN doc_id % 8 = 4 THEN '{_HSC_BMP}'
                    ELSE '{_HSC_GIF_OK}' END AS h
        FROM documents
    )"""
    return host_scorecard_sql(probe_src, page_src, payload_src)


def _pipeline_reputation_budget_oracle() -> str:
    """DuckDB replay of q_pipeline_reputation_budget — the scorecard
    chain into the same largest-remainder apportionment."""
    sc = _pipeline_host_scorecard_oracle()
    return f"""
        WITH rb_sc AS ({sc}),
        rb_w AS (
          SELECT host, CASE WHEN flagged THEN 0
                            ELSE 1000 - score END AS weight
          FROM rb_sc
        ),
        rb_t AS (SELECT CAST(SUM(weight) AS BIGINT) AS w FROM rb_w),
        rb_q AS (
          SELECT host, weight,
                 (1000 * weight) // w AS base,
                 (1000 * weight) % w AS rem
          FROM rb_w, rb_t
        ),
        rb_k AS (SELECT 1000 - CAST(SUM(base) AS BIGINT) AS k FROM rb_q),
        rb_r AS (
          SELECT host, weight, base,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, host) AS rk
          FROM rb_q
        )
        SELECT host, CAST(weight AS BIGINT) AS weight,
               CAST(base + CASE WHEN rk <= (SELECT k FROM rb_k)
                                THEN 1 ELSE 0 END AS BIGINT) AS budget
        FROM rb_r
    """


def _interleaved_segments_oracle() -> str:
    """DuckDB replay of q_interleaved_segments — same planted HTML
    through interleaved_segments_sql."""
    from dblp_crawler_spark.sources.webparse import interleaved_segments_sql

    d = "CAST(doc_id AS VARCHAR)"
    src = f"""(
        SELECT 'https://i.ex/p' || {d} AS url,
               '<html><p>intro &amp; doc ' || {d}
                 || '</p><IMG src="https://i.ex/' || {d} || '-1.jpg">'
                 || CASE WHEN doc_id % 3 = 0
                      THEN '<img src="https://i.ex/' || {d} || '-2.png"/>'
                      ELSE '<p>mid</p>' END
                 || CASE WHEN doc_id % 4 = 0
                      THEN '<img data-x="no src">' ELSE '' END
                 || '<p>tail ' || {d} || '</p></html>' AS html
        FROM documents
    )"""
    return interleaved_segments_sql(src)


def _percent_normalize_oracle() -> str:
    """DuckDB replay of q_percent_normalize — same planted URLs
    through percent_normalize_sql's generated decode table."""
    from dblp_crawler_spark.functions.urlnorm import percent_normalize_sql

    whens = "".join(
        f" WHEN {i} THEN '{c}'" for i, c in enumerate(_PCT_CASES[:-1])
    )
    return f"""
        WITH pn_src AS (
          SELECT doc_id,
                 'https://p' || CAST(doc_id % 4 AS VARCHAR) || '.example'
                   || CASE doc_id % {len(_PCT_CASES)}{whens}
                      ELSE '{_PCT_CASES[-1]}' END AS url
          FROM documents
        )
        SELECT doc_id, url, {percent_normalize_sql('url')} AS normalized
        FROM pn_src
    """


def _sitemap_scope_check_oracle() -> str:
    """DuckDB replay of q_sitemap_scope_check — same planted entries
    through sitemap_scope_check_sql."""
    from dblp_crawler_spark.sources.webparse import sitemap_scope_check_sql

    s4 = "CAST(doc_id % 4 AS VARCHAR)"
    d = "CAST(doc_id AS VARCHAR)"
    src = f"""(
        SELECT doc_id,
               'https://s' || {s4} || '.example/news/sitemap.xml'
                 AS sitemap_url,
               CASE doc_id % 5
                 WHEN 0 THEN 'https://s' || {s4} || '.example/news/p' || {d}
                 WHEN 1 THEN 'https://s' || {s4} || '.example/news/sub/p' || {d}
                 WHEN 2 THEN 'https://S' || {s4} || '.EXAMPLE/news/p' || {d}
                 WHEN 3 THEN 'https://s' || {s4} || '.example/blog/p' || {d}
                 ELSE 'https://evil.example/news/p' || {d}
               END AS url
        FROM documents
    )"""
    return sitemap_scope_check_sql(src)


def _cloaking_detect_oracle() -> str:
    """DuckDB replay of q_cloaking_detect — same planted fetch log
    through cloaking_detect_sql."""
    from dblp_crawler_spark.operators.hostdup import cloaking_detect_sql

    src = """(
        SELECT 'c' || CAST(doc_id % 8 AS VARCHAR) AS host,
               '/u' || CAST(doc_id AS VARCHAR) AS url,
               ua_class,
               CASE WHEN doc_id % 8 IN (0, 1)
                      OR (doc_id % 8 = 7 AND (doc_id // 8) % 4 = 0)
                    THEN 'h' || CAST(doc_id AS VARCHAR) || '-' || ua_class
                    ELSE 'h' || CAST(doc_id AS VARCHAR) END AS content_hash
        FROM documents, (SELECT unnest(['crawler', 'browser']) AS ua_class)
        WHERE NOT (doc_id % 8 = 6 AND ua_class = 'browser')
    ) cd_src"""
    return cloaking_detect_sql(src)


def _feed_entries_oracle() -> str:
    """DuckDB replay of q_feed_entries — same planted XML synthesis
    through feed_entries_sql."""
    from dblp_crawler_spark.sources.webparse import feed_entries_sql

    rss_item = (
        "'<item><link>https://f' || CAST(doc_id % 7 AS VARCHAR)"
        " || '.example/p/' || CAST(doc_id AS VARCHAR)"
        " || '</link><pubDate>Tue, ' || CAST(doc_id % 27 + 1 AS VARCHAR)"
        " || ' Jun 2025 04:00:00 GMT</pubDate></item>"
        "<item><title>nolink</title></item>'"
    )
    rss_junk = (
        "'<item><link>https://f' || CAST(doc_id % 7 AS VARCHAR)"
        " || '.example/j/' || CAST(doc_id AS VARCHAR)"
        " || '</link><pubDate>Tue, 5 Foo 2025 04:00:00 GMT</pubDate></item>'"
    )
    atom_entry = (
        "'<entry><link rel=\"self\" href=\"https://f'"
        " || CAST(doc_id % 7 AS VARCHAR) || '.example/a/'"
        " || CAST(doc_id AS VARCHAR)"
        " || '\"/><updated>2025-11-'"
        " || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')"
        " || 'T00:00:00Z</updated></entry>'"
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN '<rss><channel>' || {rss_item} || '</channel></rss>'
                 WHEN 1 THEN '<rss><channel>' || {rss_junk} || '</channel></rss>'
                 WHEN 2 THEN '<feed>' || {atom_entry} || '</feed>'
                 ELSE '<rss><channel>' || {rss_item}
                      || '</channel></rss><feed>' || {atom_entry} || '</feed>'
               END AS feed_xml
        FROM documents
    ) fe_pages"""
    return feed_entries_sql(src, keep="doc_id")


def _payload_complete_oracle() -> str:
    """DuckDB replay of q_payload_complete — same planted hex through
    payload_complete_sql's trailer/declared-size checks."""
    from dblp_crawler_spark.operators.sniff import (
        payload_complete_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_PAYLOAD_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_PAYLOAD_CASES)}{whens}
                 ELSE '{_PAYLOAD_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} pc_src)"
    return payload_complete_sql(staged)


def _icc_profile_oracle() -> str:
    """DuckDB replay of q_icc_profile — same planted hex through
    icc_profile_sql's unrolled APP2 walk."""
    from dblp_crawler_spark.operators.sniff import (
        icc_profile_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_ICC_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_ICC_CASES)}{whens}
                 ELSE '{_ICC_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} icc_src)"
    return icc_profile_sql(staged)


def _webp_animation_oracle() -> str:
    """DuckDB replay of q_webp_animation — same planted hex through
    webp_animation_sql's linear CTE chunk walk."""
    from dblp_crawler_spark.operators.sniff import (
        sniff_case_sql,
        webp_animation_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_WA_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_WA_CASES)}{whens}
                 ELSE '{_WA_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} wa_src)"
    return webp_animation_sql(staged)


def _exif_strip_oracle() -> str:
    """DuckDB replay of q_exif_strip — same planted hex through
    exif_strip_sql's walk + hex-string surgery."""
    from dblp_crawler_spark.operators.sniff import (
        exif_strip_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_ES_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_ES_CASES)}{whens}
                 ELSE '{_ES_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} es_src)"
    return exif_strip_sql(staged)


def _exif_camera_model_oracle() -> str:
    """DuckDB replay of q_exif_camera_model — same planted hex
    through exif_camera_model_sql's shared staging."""
    from dblp_crawler_spark.operators.sniff import (
        exif_camera_model_sql,
        sniff_case_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_CAM_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_CAM_CASES)}{whens}
                 ELSE '{_CAM_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} cm_src)"
    return exif_camera_model_sql(staged)


def _xmp_license_oracle() -> str:
    """DuckDB replay of q_xmp_license — same planted hex through
    xmp_license_sql's walk + packet decode."""
    from dblp_crawler_spark.operators.sniff import (
        sniff_case_sql,
        xmp_license_sql,
    )

    whens = "".join(
        f" WHEN {i} THEN '{hx}'" for i, hx in enumerate(_XMP_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_XMP_CASES)}{whens}
                 ELSE '{_XMP_CASES[-1]}' END AS h
        FROM documents
    )"""
    staged = f"(SELECT doc_id, h, {sniff_case_sql('h')} AS fmt FROM {src} xl_src)"
    return xmp_license_sql(staged)


def _pipeline_payload_admission_oracle() -> str:
    """DuckDB replay of q_pipeline_payload_admission — same planted
    (hex, declared) pairs through payload_admission_sql's chained
    fragments."""
    from dblp_crawler_spark.operators.sniff import payload_admission_sql

    h_whens = "".join(
        f" WHEN {i} THEN '{hx}'"
        for i, (hx, _) in enumerate(_ADMIT_CASES[:-1])
    )
    d_whens = "".join(
        f" WHEN {i} THEN '{dc}'"
        for i, (_, dc) in enumerate(_ADMIT_CASES[:-1])
    )
    src = f"""(
        SELECT doc_id,
               CASE doc_id % {len(_ADMIT_CASES)}{h_whens}
                 ELSE '{_ADMIT_CASES[-1][0]}' END AS h,
               CASE doc_id % {len(_ADMIT_CASES)}{d_whens}
                 ELSE '{_ADMIT_CASES[-1][1]}' END AS declared
        FROM documents
    ) adm_src"""
    return payload_admission_sql(src, declared_col="declared")


def _triangle_counts_oracle() -> str:
    """DuckDB replay of q_triangle_counts — same circulant + planted
    K4 edge synthesis through triangle_counts_sql."""
    from dblp_crawler_spark.operators.hits import triangle_counts_sql

    s_whens = "".join(
        f" WHEN {i} THEN '{s}'" for i, (s, _) in enumerate(_TRI_K4[:-1]))
    d_whens = "".join(
        f" WHEN {i} THEN '{d}'" for i, (_, d) in enumerate(_TRI_K4[:-1]))
    edges = f"""(
        SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
               'h' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR) AS dst
        FROM documents
        UNION ALL
        SELECT CASE doc_id{s_whens} ELSE '{_TRI_K4[-1][0]}' END AS src,
               CASE doc_id{d_whens} ELSE '{_TRI_K4[-1][1]}' END AS dst
        FROM documents WHERE doc_id < {len(_TRI_K4)}
    )"""
    return triangle_counts_sql(edges)


def _events_transitions_oracle() -> str:
    """DuckDB replay of q_events_transitions."""
    from dblp_crawler_spark.streaming.events import transition_matrix_sql

    return transition_matrix_sql("events")


def _idn_homograph_oracle() -> str:
    """DuckDB replay of q_idn_homograph."""
    from dblp_crawler_spark.operators.hostdup import idn_homograph_sql

    return idn_homograph_sql(_homograph_hosts_sql())


def _homograph_pairs_oracle() -> str:
    """DuckDB replay of q_homograph_pairs."""
    from dblp_crawler_spark.operators.hostdup import homograph_pairs_sql

    return homograph_pairs_sql(_homograph_hosts_sql())


def _pipeline_recrawl_plan_oracle() -> str:
    """DuckDB replay of q_pipeline_recrawl_plan — chains the
    recrawl_priorities fragment, the per-host cap, and
    politeness_timeline_sql."""
    from dblp_crawler_spark.operators.scheduler import politeness_timeline_sql

    timeline = politeness_timeline_sql("rp_wave", delay_us=500000)
    return f"""
        WITH rp_f AS (
          SELECT 'https://h' || CAST(user_id % 7 AS VARCHAR)
                   || '.org/p' || CAST(user_id AS VARCHAR) AS url,
                 ts, event_type AS fp
          FROM events
        ), rp_m AS (
          SELECT url, ts, fp,
            CASE WHEN lag(fp) OVER (PARTITION BY url ORDER BY ts, fp) IS NOT NULL
                  AND lag(fp) OVER (PARTITION BY url ORDER BY ts, fp) <> fp
                 THEN 1 ELSE 0 END AS changed
          FROM rp_f
        ), rp_a AS (
          SELECT url, CAST(SUM(changed) AS BIGINT) AS n_changes,
                 MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
          FROM rp_m GROUP BY url
        ), rp_n AS (SELECT MAX(epoch_us(ts)) AS now_us FROM rp_f),
        rp_pr AS (
          SELECT url,
                 ROUND((n_changes * (now_us - last_us)) / (last_us - first_us),
                       6) AS priority
          FROM rp_a, rp_n WHERE last_us > first_us
        ), rp_cand AS (
          SELECT url, regexp_extract(url, '^https://([^/]+)/', 1) AS host,
                 priority
          FROM rp_pr WHERE priority IS NOT NULL
        ), rp_adm AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY host
                   ORDER BY priority DESC, url ASC) AS rk
            FROM rp_cand)
          WHERE rk <= 5
        ), rp_wave AS (
          SELECT host, url, priority, CAST(0 AS BIGINT) AS ready_us FROM rp_adm
        )
        SELECT host, url, priority, k, start_us, finish_us
        FROM ({timeline})
    """
