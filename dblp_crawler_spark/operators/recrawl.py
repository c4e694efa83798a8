"""Adaptive recrawl scheduling: estimate each URL's change rate from
its fetch history and prioritize re-fetches by expected staleness
(the Cho & Garcia-Molina freshness model, applied as a batch operator).

The reference hard-codes one TTL per URL *class* (person pages 30 d,
venue indexes 30 d, volumes forever — /root/reference/dblp_crawler/
downloader.py:34-49): every page of a class is re-fetched on the same
fixed cadence regardless of how often it actually changes. This
operator generalizes that to a *measured* per-URL cadence: pages that
changed often and were fetched long ago float to the top of the
recrawl queue; pages that never changed sink.

Portability discipline: the change detector and all aggregates are
integer-exact (micro-second epochs, change counts); the only float is
ONE final division, so the scores are bit-identical in any engine —
same rule as the crawl's priority arithmetic.

Scale shape: one window + one hash agg, both keyed on url (a single
shuffle; AQE reuses the exchange), then a broadcast 1-row join for
the deterministic "now". Top-k consumers plan as
TakeOrderedAndProject — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_history(fetches: DataFrame, url_col: str = "url",
                   ts_col: str = "ts", fp_col: str = "fingerprint") -> DataFrame:
    """Mark each fetch with whether the content changed since the
    previous fetch of the SAME url (first fetch = no change — it is
    a discovery, not an observed change). Deterministic tie-break:
    fetches are ordered by (ts, fingerprint) within a url.

    Returns the input plus a `changed` int column (0/1).
    """
    w = Window.partitionBy(url_col).orderBy(ts_col, fp_col)
    prev = F.lag(F.col(fp_col)).over(w)
    changed = (prev.isNotNull() & (prev != F.col(fp_col))).cast("int")
    return fetches.withColumn("changed", changed)


def recrawl_priorities(fetches: DataFrame, url_col: str = "url",
                       ts_col: str = "ts", fp_col: str = "fingerprint") -> DataFrame:
    """Per-url recrawl priority from the fetch log.

    For each url with >= 2 fetches:
        rate     = n_changes / span        (changes per unit time)
        priority = rate * age = n_changes * age_us / span_us

    where span_us is the observed fetch window, age_us the time since
    the last fetch, and "now" is the deterministic reference instant
    max(ts) over the whole log (so replays and other engines score
    identically). Single-fetch urls have no observable rate: priority
    NULL (a production scheduler gives them an exploration prior;
    keeping them NULL keeps this operator exact and total).

    Returns (url, n_fetches, n_changes, last_ts, priority) with
    priority rounded to 6 — the one float, produced by one division
    of exact integers.
    """
    marked = change_history(fetches, url_col, ts_col, fp_col)
    per_url = marked.groupBy(url_col).agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum("changed").cast("long").alias("n_changes"),
        F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("__first_us"),
        F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("__last_us"),
        F.max(F.col(ts_col)).alias("last_ts"),
    )
    now = fetches.agg(F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("__now_us"))
    span = F.col("__last_us") - F.col("__first_us")
    age = F.col("__now_us") - F.col("__last_us")
    prio = F.when(
        span > 0, F.round((F.col("n_changes") * age) / span, 6)
    ).otherwise(F.lit(None).cast("double"))
    return (
        per_url.join(F.broadcast(now))
        .select(url_col, "n_fetches", "n_changes", "last_ts", prio.alias("priority"))
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str = "url",
                  fp_col: str = "fingerprint") -> DataFrame:
    """Crawl-snapshot delta: one full-outer equi-join of two
    (url, content-fingerprint) snapshots → one row per url present in
    either, classified added / removed / changed / unchanged — the
    batch complement of :func:`recrawl_priorities` (that estimates
    WHEN to refetch; this reports WHAT a refetch wave actually
    changed, and its 'changed' rows are the fetch log entries the
    change-rate estimator consumes next round).

    Fingerprint comparison is null-safe: a NULL fingerprint on both
    sides (fetch failed twice) is 'unchanged' — only a real
    fingerprint transition counts as change. Scale shape: ONE
    key-partitioned shuffle join, no skew risk beyond the key
    distribution itself (urls are near-unique); at snapshot scale
    both sides stream through hash partitions — nothing is
    broadcast, nothing collected.
    """
    o = old.select(F.col(key_col).alias("url"), F.col(fp_col).alias("old_fp"))
    n = new.select(F.col(key_col).alias("url"), F.col(fp_col).alias("new_fp"))
    in_old = F.lit(True)
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        o.withColumn("__in_old", in_old)
        .join(n.withColumn("__in_new", F.lit(True)), "url", "full_outer")
        .select("url", "old_fp", "new_fp", status.alias("status"))
    )


def fetch_plan(discovered: DataFrame, state: DataFrame,
               url_col: str = "url", lastmod_col: str = "lastmod",
               fetched_col: str = "last_fetch") -> DataFrame:
    """Discovery-side freshness triage: join discovered URLs (e.g.
    :func:`~dblp_crawler_spark.sources.webparse.sitemap_entries`
    output, with its optional lastmod DATE) against the fetch state
    (url, last_fetch DATE) and emit one action per URL:

      * ``fetch``       — never fetched, or lastmod > last_fetch
                          (the sitemap says it changed);
      * ``revalidate``  — fetched before but the sitemap carries no
                          lastmod: only a conditional GET
                          (If-Modified-Since/ETag) can tell;
      * ``skip``        — lastmod ≤ last_fetch: provably fresh,
                          zero bytes spent.

    The skip tier is the whole point: at web scale most sitemap
    entries are unchanged since the last wave, and this prune
    happens BEFORE scheduling — politeness budget is spent only on
    `fetch` + `revalidate`. ONE url-keyed left join; no state is
    mutated here (the fetch log updates state downstream).
    """
    s = state.select(
        F.col(url_col).alias("url"), F.col(fetched_col).alias("__lf")
    )
    d = discovered.select(F.col(url_col).alias("url"), F.col(lastmod_col).alias("lastmod"))
    action = (
        F.when(F.col("__lf").isNull(), F.lit("fetch"))
        .when(F.col("lastmod").isNull(), F.lit("revalidate"))
        .when(F.col("lastmod") > F.col("__lf"), F.lit("fetch"))
        .otherwise(F.lit("skip"))
    )
    return d.join(s, "url", "left").select(
        "url", "lastmod", F.col("__lf").alias("last_fetch"), action.alias("action")
    )


def canonical_election(fetches: DataFrame, url_col: str = "url",
                       fp_col: str = "fingerprint",
                       host_col: str | None = "host") -> tuple:
    """Duplicate-content URL-alias collapse: the same page served
    under many URLs (tracking params the canonicalizer doesn't know,
    mirrors, print views) wastes fetch budget and poisons dedup
    stats. Group fetched pages by content fingerprint, ELECT the
    lexicographically smallest URL as canonical, and emit:

      * alias_map (url, canonical_url) for every non-canonical alias
        — feed it to the frontier as extra seen-keys so aliases are
        never refetched;
      * host_report (host, n_pages, n_aliases, alias_rate) — a host
        serving heavy duplicate content under distinct URLs is a
        trap/mirror signal for the scheduler (rate is the only
        float, rounded).

    Two hash aggregations (fingerprint-keyed election with map-side
    partials, then the host rollup); NULL fingerprints (failed
    fetches) are excluded — no content, no election.
    """
    f = fetches.filter(F.col(fp_col).isNotNull())
    elected = (
        f.groupBy(F.col(fp_col).alias("fp"))
        .agg(F.min(url_col).alias("canonical_url"),
             F.count(F.lit(1)).alias("n_urls"))
    )
    alias_map = (
        f.select(F.col(url_col).alias("url"), F.col(fp_col).alias("fp"),
                 *([F.col(host_col).alias("host")] if host_col else []))
        .join(elected, "fp")
        .filter(F.col("url") != F.col("canonical_url"))
    )
    host_report = None
    if host_col:
        per_host = f.select(F.col(host_col).alias("host")).groupBy("host").agg(
            F.count(F.lit(1)).alias("n_pages")
        )
        aliases = alias_map.groupBy("host").agg(F.count(F.lit(1)).alias("n_aliases"))
        host_report = (
            per_host.join(aliases, "host", "left")
            .select(
                "host", "n_pages",
                F.coalesce("n_aliases", F.lit(0)).cast("long").alias("n_aliases"),
                F.round(
                    F.coalesce("n_aliases", F.lit(0)) / F.col("n_pages"), 6
                ).alias("alias_rate"),
            )
        )
    return alias_map.select("url", "canonical_url"), host_report


# ---- declared-vs-observed changefreq audit -----------------------------------
#
# Sitemap <changefreq> is a publisher CLAIM; the fetch log is the
# measurement. Sites chronically over-declare ("hourly" on pages
# that change yearly — bait for crawl budget) and sometimes
# under-declare (busy feeds marked monthly); a scheduler that trusts
# claims wastes exactly the budget politeness saved. The audit joins
# the spec's nominal interval against the observed mean change
# interval (span / n_changes, exact integers) with a 2x tolerance
# band on each side — all comparisons cross-multiplied so no float
# ever decides. 'always' (nominal 0) is honest only when every
# revisit changed. URLs without two fetches, without any observed
# change, or declaring 'never'/junk give no_signal — unverifiable,
# not wrong (the scheduler falls back to observed-rate priorities).

def changefreq_audit(fetches: DataFrame, declared: DataFrame,
                     url_col: str = "url", ts_col: str = "ts",
                     fp_col: str = "fingerprint",
                     cf_col: str = "changefreq") -> DataFrame:
    """(url, changefreq, declared_s, n_fetches, n_changes, span_s,
    verdict) per url in both inputs; verdict in {over_declared,
    under_declared, accurate, no_signal}."""
    from ..sources.webparse import CHANGEFREQ_SECONDS

    marked = change_history(fetches, url_col, ts_col, fp_col)
    per_url = marked.groupBy(F.col(url_col).alias("url")).agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum("changed").cast("long").alias("n_changes"),
        (F.max(F.unix_seconds(F.col(ts_col).cast("timestamp")))
         - F.min(F.unix_seconds(F.col(ts_col).cast("timestamp"))))
        .alias("span_s"),
    )
    cf = F.lower(F.col(cf_col))
    ds = F.lit(None).cast("long")
    for name, secs in CHANGEFREQ_SECONDS.items():
        ds = F.when(cf == name, F.lit(secs).cast("long")).otherwise(ds)
    d = declared.select(F.col(url_col).alias("url"), cf.alias("changefreq"),
                        ds.alias("declared_s"))
    j = d.join(per_url, "url")
    no_signal = (F.col("declared_s").isNull() | (F.col("n_fetches") < 2)
                 | (F.col("n_changes") == 0))
    always_ok = F.col("n_changes") == F.col("n_fetches") - 1
    verdict = (
        F.when(no_signal, "no_signal")
        .when(F.col("declared_s") == 0,
              F.when(always_ok, "accurate").otherwise("over_declared"))
        .when(F.col("declared_s") * 2 * F.col("n_changes") < F.col("span_s"),
              "over_declared")
        .when(F.col("declared_s") * F.col("n_changes") > 2 * F.col("span_s"),
              "under_declared")
        .otherwise("accurate")
    )
    return j.select("url", "changefreq", "declared_s", "n_fetches",
                    "n_changes", "span_s", verdict.alias("verdict"))


def changefreq_audit_sql(fetches: str, declared: str) -> str:
    """DuckDB replay of :func:`changefreq_audit` over relations
    ``fetches(url, ts, fingerprint)`` and ``declared(url,
    changefreq)`` — same lag marking, integer bands, and enum
    table."""
    from ..sources.webparse import CHANGEFREQ_SECONDS

    ds = " ".join(f"WHEN '{n}' THEN {s}" for n, s in CHANGEFREQ_SECONDS.items())
    return f"""
        WITH ca_m AS (
          SELECT url, ts, fingerprint,
                 CASE WHEN lag(fingerprint) OVER
                        (PARTITION BY url ORDER BY ts, fingerprint)
                      IS NOT NULL
                      AND lag(fingerprint) OVER
                        (PARTITION BY url ORDER BY ts, fingerprint)
                      <> fingerprint
                 THEN 1 ELSE 0 END AS changed
          FROM {fetches}
        ), ca_u AS (
          SELECT url, CAST(COUNT(*) AS BIGINT) AS n_fetches,
                 CAST(SUM(changed) AS BIGINT) AS n_changes,
                 CAST(floor(epoch(MAX(CAST(ts AS TIMESTAMP))))
                      - floor(epoch(MIN(CAST(ts AS TIMESTAMP)))) AS BIGINT)
                   AS span_s
          FROM ca_m GROUP BY url
        ), ca_d AS (
          SELECT url, lower(changefreq) AS changefreq,
                 CAST(CASE lower(changefreq) {ds} END AS BIGINT) AS declared_s
          FROM {declared}
        )
        SELECT d.url, d.changefreq, d.declared_s, u.n_fetches, u.n_changes,
               u.span_s,
               CASE WHEN d.declared_s IS NULL OR u.n_fetches < 2
                         OR u.n_changes = 0 THEN 'no_signal'
                    WHEN d.declared_s = 0 THEN
                      CASE WHEN u.n_changes = u.n_fetches - 1
                           THEN 'accurate' ELSE 'over_declared' END
                    WHEN d.declared_s * 2 * u.n_changes < u.span_s
                      THEN 'over_declared'
                    WHEN d.declared_s * u.n_changes > 2 * u.span_s
                      THEN 'under_declared'
                    ELSE 'accurate' END AS verdict
        FROM ca_d d JOIN ca_u u USING (url)
    """
