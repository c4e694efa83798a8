"""Frontier scheduling: priority pop, per-host politeness, robots,
global crawl-order sequencing (SURVEY.md T3/O5/O6).

Reference analogs: the year/venue filters ARE the priorities
(__main__.py:37-40, parser.py:124-129); concurrency control is one
global semaphore (downloader.py:25-27); there is no robots.txt. The
explicit queue/politeness/robots here are the north_rule upgrades,
with semantics pinned by the oracle (oracle.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def politeness_pop(
    pending: DataFrame,
    host_budget: int | None,
    host_budgets: DataFrame | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Per-host budgeted pop: within each host, highest (priority,
    url) first, at most budget rows; rest stay pending.

    The budget is the tighter of the global `host_budget` and the
    host's entry in `host_budgets` (host, budget) — the latter is how
    robots crawl-delay becomes a politeness window: with a wave
    modeled as `wave_ms` of wall time, a host allowing one request
    per `crawl_delay_ms` gets max(1, floor(wave_ms / delay)) slots
    (plans/crawl.py builds that dim; it is tiny and broadcast).

    Scale shape — salted two-level top-k. A single
    `Window.partitionBy(host)` would sort the hot host's ENTIRE
    pending set in one task (85% of a 10^10-URL frontier on dblp.org
    → one ~10^10-row sort) before cutting at the budget. Instead:

      1. salt each row by url hash into `n_salts` sub-partitions and
         take the per-(host, salt) top-`budget` — parallel local
         sorts, each cut at the budget;
      2. re-rank only the ≤ n_salts × budget survivors per host —
         the second window's input is bounded by the budget, not by
         the frontier.

    Exactly equivalent to the single window: every global top-budget
    row of a host ranks ≤ budget within its own salt, so level 1
    never discards a winner. Hosts with NO budget (neither global
    nor dim) bypass both windows entirely — no cut, no sort.
    """
    if host_budget is None and host_budgets is None:
        return pending
    out = pending
    budget = F.lit(host_budget).cast("long") if host_budget is not None else F.lit(None).cast("long")
    if host_budgets is not None:
        out = out.join(
            F.broadcast(host_budgets.select("host", F.col("budget").alias("__hb"))), "host", "left"
        )
        budget = F.least(F.coalesce(budget, F.col("__hb")), F.coalesce(F.col("__hb"), budget))
    unbudgeted = out.filter(budget.isNull()).drop("__hb")
    salted = out.filter(budget.isNotNull()).withColumn(
        "__salt", F.pmod(F.xxhash64("url"), F.lit(n_salts))
    )
    order = [F.desc("priority"), F.asc("url")]
    w1 = Window.partitionBy("host", "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= budget)
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    final = (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= budget)
        .drop("__salt", "__rn1", "__rn", "__hb")
    )
    return final.unionByName(unbudgeted).select(*pending.columns)


def global_sequence(df: DataFrame, start: int, order_cols: list, out_type: str = "int") -> DataFrame:
    """Assign contiguous seq numbers following a total order.

    Fully JVM-side two-pass plan (no global Window, which would
    funnel the whole batch through one partition, and no RDD
    zipWithIndex, which would round-trip every row through Python):

      1. range-repartition + sort on the order columns — rows land in
         partition p iff they sort before every row of partition p+1;
      2. per-partition row_number (window keyed by the *partition id*,
         so each task ranks only its own rows in parallel);
      3. add the exclusive prefix-sum of partition counts (a
         #partitions-row aggregate, broadcast back).

    The scheduled batch is budget-bounded, but at 10^10-URL scale a
    wave can still be millions of rows — this keeps sequencing
    parallel and entirely inside whole-stage codegen. Deterministic
    because the order columns form a total order (url is unique).

    Branch consistency is ENFORCED by a lazy localCheckpoint of the
    partitioned frame, not assumed from ReuseExchange: the counts
    branch and the main branch MUST see the identical partitioning,
    but independently materialized copies of the same
    repartitionByRange are NOT guaranteed identical — Spark's range
    partitioner seeds its reservoir sampling with the RDD id, so a
    re-executed exchange can draw different boundaries. ReuseExchange
    usually dedupes the two branches, but Catalyst's column pruning
    can specialize their exchanges into non-canonical twins and
    defeat it (observed: misaligned seq under local[8] when the
    caller consumed the result through two differently-pruned paths).
    The checkpoint materializes the exchange once (to executor-local
    storage — the batch was being shuffled anyway) and both branches
    read the same frozen blocks. Trade-off (same as the
    connected_components rounds): lineage is truncated, so an
    executor loss mid-query fails the job instead of recomputing —
    on a cluster where that matters, swap for a reliable
    checkpoint dir or an intermediate table; what is NOT acceptable
    is two branches numbering rows under different partitionings.
    """
    cols = df.columns
    n_part = max(2, df.sparkSession.sparkContext.defaultParallelism)
    d = (
        df.repartitionByRange(n_part, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"))
        .select("__pid", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"))
    )
    w_rn = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        d.join(F.broadcast(offsets), "__pid")
        .withColumn("seq", (F.lit(start) + F.col("__off") + F.row_number().over(w_rn) - 1).cast(out_type))
        .select(*cols, "seq")
    )


def robots_status(df: DataFrame, robots: DataFrame) -> DataFrame:
    """Stamp status='disallowed' on urls matching a host's disallow
    prefixes; broadcast dim join (robots is tiny at any scale)."""
    r = robots.select("host", "disallow_prefixes")
    joined = df.join(F.broadcast(r), "host", "left")
    disallowed = F.when(
        F.col("disallow_prefixes").isNotNull()
        & F.exists("disallow_prefixes", lambda p: F.col("url").startswith(p)),
        F.lit("disallowed"),
    ).otherwise(F.col("status"))
    return joined.withColumn("status", disallowed).drop("disallow_prefixes")


#: slot modulus for host_shards: slot * n_shards + s must stay < 2^63,
#: so slots take 45 bits and n_shards may go to 2^17.
_HRW_SLOT_MOD = 1 << 45


def host_shards(hosts: DataFrame, n_shards: int, host_col: str = "host",
                seed: int = 0) -> DataFrame:
    """Rendezvous (highest-random-weight) host → shard assignment:
    shard = argmax over s ∈ [0, n_shards) of hash(host, s). The
    property hash-mod placement lacks: when the shard count grows
    n → m, a host moves ONLY if some NEW shard s ≥ n wins its
    rendezvous — expected fraction n/m of hosts keep their shard
    (hash-mod reshuffles all but 1/m). That is exactly what a
    politeness-partitioned frontier wants at a cluster resize: a
    host's fetch state, bloom-bank bucket, and delay budget live
    with its shard, and N→4N executors should relocate ~3/4 of
    hosts, not ~15/16.

    Engine-portable argmax without a window: per (host, s) the key
    ``(hash60 % 2^45) * n_shards + s`` folds slot-then-s precedence
    into one int64, so MAX(key) picks the winning slot with larger
    s breaking exact slot ties deterministically; shard = key % n.
    Plan: explode s (n_shards rows per host, map-side), one hash agg
    back to host grain — partial aggregation collapses the fan-out
    before the shuffle.
    """
    if not 0 < n_shards <= (1 << 17):
        raise ValueError("n_shards must be in (0, 2^17]")
    from dblp_crawler_spark.functions.hashing import hash60

    s = F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("s")
    ex = hosts.select(F.col(host_col).alias("host")).distinct().select("host", s)
    h = hash60(
        F.concat(F.col("host"), F.lit(":"), F.col("s").cast("string")), seed
    )
    key = F.pmod(h, F.lit(_HRW_SLOT_MOD)) * n_shards + F.col("s")
    return ex.groupBy("host").agg(
        F.pmod(F.max(key), F.lit(n_shards)).cast("int").alias("shard")
    )


def host_shards_sql(src: str, n_shards: int, host_col: str = "host",
                    seed: int = 0) -> str:
    """DuckDB replay of :func:`host_shards` over ``src(host)`` —
    same hash60 rendezvous key, same MAX fold."""
    from dblp_crawler_spark.functions.hashing import hash60_sql

    h = hash60_sql(f"{host_col} || ':' || CAST(s AS VARCHAR)", seed)
    return f"""
        SELECT host, CAST(MAX(({h}) % {_HRW_SLOT_MOD} * {n_shards} + s)
                          % {n_shards} AS INT) AS shard
        FROM (SELECT DISTINCT {host_col} AS host FROM {src})
             CROSS JOIN range({n_shards}) t(s)
        GROUP BY host
    """


def _robots_rule_cols(rules: DataFrame) -> DataFrame:
    """(host, rule, pattern) → + (is_allow, spec, lit_prefix, rx):
    the per-rule derived columns robots_decide matches with. Computed
    ONCE on the rules side (dozens of rows per host) so the per-URL
    work is a prefix guard plus one regex test.

    Pattern → regex (RFC 9309 §2.2.2/2.2.3): '*' matches any char
    sequence, a trailing '$' anchors the end, everything else is
    literal; the match is anchored at the start of the path. A '$'
    anywhere but the end is literal (escaped with the other regex
    metachars)."""
    pat = F.col("pattern")
    ends = F.substring(pat, -1, 1) == "$"
    body = F.when(ends, F.substring(pat, F.lit(1), F.length(pat) - 1)).otherwise(pat)
    # escape every Java-regex metachar except '*' (replacement \\$1 =
    # literal backslash + group), then '*' -> '.*'
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    rx = F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(ends, F.lit("$")).otherwise(F.lit("")),
    )
    return rules.select(
        "host",
        "pattern",
        (F.col("rule") == "allow").cast("int").alias("is_allow"),
        F.length(pat).alias("spec"),
        # literal prefix before the first '*': a cheap JVM startswith
        # guard implied by the regex, so most non-matching rules never
        # reach the per-row regex engine
        F.substring_index(body, "*", 1).alias("lit_prefix"),
        rx.alias("rx"),
    )


def robots_decide(urls: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """RFC 9309 §2.2.2 access decision per distinct URL: among all of
    the host's Allow/Disallow rules that match the URL's path, the
    MOST SPECIFIC (longest pattern) wins; an Allow and a Disallow of
    equal length tie in favor of Allow; a URL no rule matches — or
    whose host has no rules — is allowed. Wildcards '*' and the '$'
    end anchor are honored (what `robots_status`'s prefix list cannot
    express: Allow overrides like ``Allow: /private/pub*`` under
    ``Disallow: /private``).

    Returns (url, allowed boolean). Plan shape: one host-keyed join
    of urls × per-host rules (rules fan-out is bounded by robots.txt
    size), one hash agg back to URL grain. The winner is folded into
    a single int64 key ``spec*2 + is_allow`` so MAX() alone resolves
    longest-match-then-allow precedence — no window, engine-portable.

    Reference has no robots handling at all (downloader.py fetches
    unconditionally); this is the north_rule's robots semantics.
    """
    from dblp_crawler_spark.functions.urlnorm import url_host, url_path

    r = _robots_rule_cols(rules)
    u = urls.select(
        F.col(url_col).alias("url"),
        url_host(url_col).alias("host"),
        url_path(url_col).alias("path"),
    )
    j = u.join(r, "host", "left")
    matched = (
        F.col("rx").isNotNull()
        & F.col("path").startswith(F.col("lit_prefix"))
        & F.expr("path rlike rx")
    )
    key = F.when(matched, F.col("spec") * 2 + F.col("is_allow"))
    return j.groupBy("url").agg(
        (F.max(key).isNull() | (F.max(key) % 2 == 1)).alias("allowed")
    )


def robots_decide_sql(urls: str = "cand_urls", rules: str = "robots_rules") -> str:
    """DuckDB replay of :func:`robots_decide` over relations
    ``urls(url)`` and ``rules(host, rule, pattern)`` — same regex
    construction (RE2 '\\\\1' backref + 'g' flag where Java uses
    '$1'-with-global-default), same MAX-key precedence fold."""
    from dblp_crawler_spark.functions.urlnorm import url_host_sql, url_path_sql

    host = url_host_sql("url")
    path = url_path_sql("url")
    return f"""
        WITH rd_rules AS (
          SELECT host, pattern,
                 CASE WHEN rule = 'allow' THEN 1 ELSE 0 END AS is_allow,
                 length(pattern) AS spec,
                 CASE WHEN pattern LIKE '%$'
                      THEN substr(pattern, 1, length(pattern) - 1)
                      ELSE pattern END AS body
          FROM {rules}
        ), rd_rx AS (
          SELECT host, is_allow, spec,
                 '^' || replace(regexp_replace(body,
                        '([.^$+?(){{}}\\[\\]|\\\\])', '\\\\\\1', 'g'), '*', '.*')
                     || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS rx
          FROM rd_rules
        ), rd_urls AS (
          SELECT url, {host} AS host, {path} AS path FROM {urls}
        )
        SELECT url,
               (MAX(CASE WHEN regexp_matches(path, rx)
                         THEN spec * 2 + is_allow END) IS NULL
                OR MAX(CASE WHEN regexp_matches(path, rx)
                            THEN spec * 2 + is_allow END) % 2 = 1) AS allowed
        FROM rd_urls u LEFT JOIN rd_rx r USING (host)
        GROUP BY url
    """


def fetch_backoff(log: DataFrame, url_col: str = "url", ts_col: str = "ts",
                  ok_col: str = "ok", base_ms: int = 1000,
                  cap_ms: int = 3_600_000, max_exp: int = 22) -> DataFrame:
    """Exponential-backoff retry schedule from the fetch log: per
    URL, the trailing consecutive-failure streak `s` (fetches after
    the last success) gates the earliest next attempt at
    ``last_ts + min(cap, base * 2^(s-1))``; a URL whose latest fetch
    succeeded is immediately eligible (delay 0). The schedule a
    steady-state fetcher runs alongside ``recrawl_priorities`` —
    that ranks what's WORTH refetching, this says what is ALLOWED to
    be retried yet, without hammering a host that keeps failing.

    Integer-exact end to end (epoch micros, shifted-power-of-two
    delays with the exponent clamped at `max_exp` — base 1 s caps at
    ~70 min of shift headroom long before int64 matters), so the
    schedule is bit-identical in any engine. Scale shape: ONE
    url-keyed exchange shared by the last-success window and the
    collapse aggregation (the quantiles-operator discipline).
    """
    base_us, cap_us = base_ms * 1000, cap_ms * 1000
    # NTZ-safe: cast first (the recrawl-operator convention — UTC
    # session tz makes it match DuckDB's epoch_us on the same values)
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(url_col)
    rows = log.select(
        F.col(url_col).alias("url"), m.alias("__m"), F.col(ok_col).alias("__ok")
    ).withColumn("__last_ok", F.max(F.when(F.col("__ok"), F.col("__m"))).over(w))
    per_url = rows.groupBy("url").agg(
        F.sum(
            F.when(F.col("__m") > F.coalesce(F.col("__last_ok"), F.lit(-1)), 1).otherwise(0)
        ).cast("long").alias("n_fails"),
        F.max("__m").alias("last_ts_us"),
    )
    delay = F.when(F.col("n_fails") == 0, F.lit(0).cast("long")).otherwise(
        F.least(
            F.lit(cap_us).cast("long"),
            F.lit(base_us)
            * F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(least(n_fails - 1, {max_exp}) AS INT))"),
        )
    )
    return per_url.select(
        "url", "n_fails", "last_ts_us",
        (F.col("last_ts_us") + delay).alias("next_eligible_us"),
    )


def adaptive_crawl_delay(log: DataFrame, host_col: str = "host",
                         lat_col: str = "latency_ms", ok_col: str = "ok",
                         ts_col: str = "ts", base_ms: int = 500,
                         min_ms: int = 250, max_ms: int = 600_000,
                         streak_cap: int = 6) -> DataFrame:
    """AIMD-style per-host politeness from OBSERVED behavior — the
    adaptive tier above robots crawl-delay (which most hosts don't
    set): a slow host gets a delay proportional to its service time
    (Heritrix's delay-factor rule: never occupy more than ~half a
    host's capacity → 2 × p95 latency), and a failing host backs
    off multiplicatively (2^streak on the trailing consecutive-
    failure streak, the congestion signal).

        delay_ms = clamp(min_ms, max_ms,
                         max(base_ms, 2 * p95_latency) << min(streak, cap))

    Everything is exact integer work: the p95 is the rank-exact
    value at ceil(19n/20) (the quantiles-operator arithmetic — no
    interpolation, engine-portable), the streak is an order-free
    count of fetches with ts strictly after the last success, and
    the shift/clamps are int64. ONE host-keyed exchange shared by
    the rank window, the host-wide windows, and the collapse agg.

    Output (host, n, p95_ms, fail_streak, delay_ms) plugs into
    `politeness_pop(host_budgets=...)` as budget ≈ wave_ms / delay.
    """
    w = Window.partitionBy(host_col)
    wo = Window.partitionBy(host_col).orderBy(F.asc(lat_col))
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    rows = log.select(
        F.col(host_col).alias("host"),
        F.col(lat_col).cast("long").alias("__lat"),
        F.col(ok_col).alias("__ok"),
        m.alias("__m"),
    ).select(
        "host", "__lat", "__ok", "__m",
        F.row_number().over(wo.partitionBy("host").orderBy(F.asc("__lat"))).alias("__rn"),
        F.count(F.lit(1)).over(w.partitionBy("host")).alias("__n"),
        F.max(F.when(F.col("__ok"), F.col("__m"))).over(w.partitionBy("host")).alias("__last_ok"),
    )
    per_host = rows.groupBy("host").agg(
        F.max("__n").alias("n"),
        F.max(
            F.when(F.col("__rn") == F.expr("(19 * __n + 19) DIV 20"), F.col("__lat"))
        ).alias("p95_ms"),
        F.sum(
            F.when(F.col("__m") > F.coalesce(F.col("__last_ok"), F.lit(-1)), 1).otherwise(0)
        ).cast("long").alias("fail_streak"),
    )
    svc = F.greatest(F.lit(base_ms).cast("long"), 2 * F.col("p95_ms"))
    shifted = svc * F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(least(fail_streak, {streak_cap}) AS INT))"
    )
    delay = F.least(
        F.lit(max_ms).cast("long"), F.greatest(F.lit(min_ms).cast("long"), shifted)
    )
    return per_host.select("host", "n", "p95_ms", "fail_streak", delay.alias("delay_ms"))


def adaptive_crawl_delay_sql(src: str = "fetch_log", base_ms: int = 500,
                             min_ms: int = 250, max_ms: int = 600_000,
                             streak_cap: int = 6) -> str:
    """DuckDB replay of :func:`adaptive_crawl_delay` over
    ``src(host, latency_ms, ok, ts)`` — same rank-exact p95, same
    order-free streak, same shift/clamp arithmetic."""
    return f"""
        WITH acd_rows AS (
          SELECT host, CAST(latency_ms AS BIGINT) AS lat, ok,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS m,
                 ROW_NUMBER() OVER (PARTITION BY host ORDER BY latency_ms ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY host) AS n,
                 MAX(CASE WHEN ok THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
                   OVER (PARTITION BY host) AS last_ok
          FROM {src}
        ), acd_host AS (
          SELECT host, MAX(n) AS n,
                 MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN lat END) AS p95_ms,
                 CAST(SUM(CASE WHEN m > coalesce(last_ok, -1) THEN 1 ELSE 0 END) AS BIGINT)
                   AS fail_streak
          FROM acd_rows GROUP BY host
        )
        SELECT host, n, p95_ms, fail_streak,
               least(CAST({max_ms} AS BIGINT), greatest(CAST({min_ms} AS BIGINT),
                 greatest(CAST({base_ms} AS BIGINT), 2 * p95_ms)
                 * (CAST(1 AS BIGINT) << CAST(least(fail_streak, {streak_cap}) AS INT))
               )) AS delay_ms
        FROM acd_host
    """


# ---- starvation-free priority aging -----------------------------------------

#: default aging step: 2^46 per wave of queue age. The CCF class
#: occupies bits 48+ (functions/priority.py), so one class level =
#: 2^48 = 4 aging steps — a bottom-class URL starved ~13 waves
#: outranks a fresh top-class one (3*2^48 + year/depth bits < 13*2^46
#: + its own year bits). Rate and cap are per-deployment knobs; the
#: cap bounds the term at cap*rate so int64 never overflows
#: (64 * 2^46 = 2^52, far under the 2^63 ceiling even stacked on a
#: max priority of ~2^50).
AGING_RATE = 1 << 46
AGING_CAP = 64


def aged_priority(priority: Column | str, enqueue_wave: Column | str,
                  current_wave: int, rate: int = AGING_RATE,
                  age_cap: int = AGING_CAP) -> Column:
    """Effective pop priority with linear queue-age boost — the
    starvation guard a pure static priority lacks: under sustained
    pressure from high-class hosts, a static queue never schedules
    the tail (the reference crawls one site and cannot starve; a
    10^10-URL frontier with per-host budgets starves whole TLDs).
    eff = priority + min(age, cap)*rate guarantees any URL's rank
    deficit closes at `rate` per wave, so every URL is scheduled
    within O(cap + backlog/capacity) waves. Pure int64 expressions."""
    p = F.col(priority) if isinstance(priority, str) else priority
    w = F.col(enqueue_wave) if isinstance(enqueue_wave, str) else enqueue_wave
    age = F.greatest(F.lit(0).cast("long"),
                     F.lit(current_wave).cast("long") - w.cast("long"))
    return p.cast("long") + F.least(age, F.lit(age_cap).cast("long")) * F.lit(rate).cast("long")


def aging_order(frontier: DataFrame, current_wave: int,
                rate: int = AGING_RATE, age_cap: int = AGING_CAP) -> DataFrame:
    """Deterministic aged pop order for a frontier batch
    ``(url, priority, enqueue_wave, ...)`` → adds ``age``,
    ``eff_priority`` and the contiguous ``pop_rank`` (0 = first).
    Rank uses the two-pass distributed prefix sum (global_sequence),
    never a single-partition window; ties break on url so re-runs
    and other engines derive the identical order."""
    eff = aged_priority("priority", "enqueue_wave", current_wave, rate, age_cap)
    d = frontier.withColumns(
        {
            "age": F.greatest(
                F.lit(0).cast("long"),
                F.lit(current_wave).cast("long") - F.col("enqueue_wave").cast("long"),
            ),
            "eff_priority": eff,
        }
    )
    ranked = global_sequence(
        d, start=0,
        order_cols=[F.col("eff_priority").desc(), F.col("url").asc()],
        out_type="long",
    )
    return ranked.withColumnRenamed("seq", "pop_rank")


def aging_order_sql(src: str, current_wave: int, rate: int = AGING_RATE,
                    age_cap: int = AGING_CAP) -> str:
    """DuckDB replay of :func:`aging_order` over ``src`` exposing
    (url, priority, enqueue_wave)."""
    return f"""
        WITH ag AS (
          SELECT *,
                 GREATEST(0, {current_wave} - CAST(enqueue_wave AS BIGINT)) AS age,
                 CAST(priority AS BIGINT)
                   + LEAST(GREATEST(0, {current_wave} - CAST(enqueue_wave AS BIGINT)),
                           {age_cap}) * CAST({rate} AS BIGINT) AS eff_priority
          FROM {src}
        )
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY eff_priority DESC, url ASC) - 1
                       AS BIGINT) AS pop_rank
        FROM ag
    """


# ---- politeness fetch timeline -----------------------------------------------

def politeness_timeline(batch: DataFrame, delay_us: int | None = None,
                        host_col: str = "host", url_col: str = "url",
                        ready_col: str = "ready_us",
                        delay_col: str = "delay_us") -> DataFrame:
    """Exact fetch start/finish times for a scheduled wave under
    per-host politeness delays — the wave-planning question ("when
    does host X's queue drain, how long does the wave tail run")
    answered BEFORE fetching.

    Semantics: per host, fetches run in the deterministic pop order
    (rank by ready, then url); fetch i starts at
    ``start_i = max(ready_i, start_{i-1} + delay)`` — a sequential
    recurrence, which is exactly why naive simulators are
    driver-side loops.  The closed form makes it ONE window:
    ``start_i = delay·k_i + running_max_{j≤i}(ready_j − delay·k_j)``
    (k = 0-based rank; subtracting the per-slot delay converts the
    recurrence into a prefix maximum).  All int64 microseconds —
    bit-identical in any engine.

    ``delay_us`` is the constant per-host gap, or pass rows with a
    per-host ``delay_col`` (e.g. adaptive_crawl_delay's output
    joined in) and leave ``delay_us=None``.

    Plan: one host-keyed exchange shared by the rank and the
    running-max window.  Returns (host, url, k, start_us,
    finish_us); a per-host drain report is ``groupBy(host).
    agg(max(finish_us))``."""
    d = F.lit(delay_us).cast("long") if delay_us is not None else F.col(delay_col).cast("long")
    w = Window.partitionBy(host_col).orderBy(
        F.col(ready_col).asc(), F.col(url_col).asc()
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        batch.withColumn("k", (F.row_number().over(w) - 1).cast("long"))
        .withColumn("__adj", F.col(ready_col).cast("long") - d * F.col("k"))
        .withColumn("start_us", d * F.col("k") + F.max("__adj").over(wrun))
        .withColumn("finish_us", F.col("start_us") + d)
        .drop("__adj")
    )
    return out


def politeness_timeline_sql(src: str, delay_us: int | None = None,
                            host_col: str = "host", url_col: str = "url",
                            ready_col: str = "ready_us",
                            delay_col: str = "delay_us") -> str:
    """DuckDB replay of :func:`politeness_timeline` — same rank,
    same prefix-max closed form."""
    d = str(delay_us) if delay_us is not None else f"CAST({delay_col} AS BIGINT)"
    return f"""
        WITH pt AS (
          SELECT *,
                 CAST(ROW_NUMBER() OVER (PARTITION BY {host_col}
                   ORDER BY {ready_col} ASC, {url_col} ASC) - 1 AS BIGINT) AS k
          FROM {src}
        ), pt2 AS (
          SELECT *,
                 {d} * k + MAX(CAST({ready_col} AS BIGINT) - {d} * k) OVER (
                   PARTITION BY {host_col}
                   ORDER BY {ready_col} ASC, {url_col} ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS start_us
          FROM pt
        )
        SELECT *, start_us + {d} AS finish_us FROM pt2
    """


# ---- robots availability policy (RFC 9309 §2.3.1) ----------------------------

#: RFC 9309 §2.3.1.4: a crawler MAY treat robots.txt as unavailable
#: (allow-all) once it has been unreachable for more than 30 days.
ROBOTS_STALE_US = 30 * 86400 * 1_000_000


def robots_availability(fetch_log: DataFrame, host_col: str = "host",
                        ts_col: str = "ts_us", status_col: str = "status",
                        stale_us: int = ROBOTS_STALE_US) -> DataFrame:
    """Per-host robots.txt ACCESS policy from the robots fetch log —
    the status tier ABOVE rule evaluation (robots_decide), per
    RFC 9309 §2.3.1: a 2xx body yields rules (``use_rules``); 4xx
    means the file does not exist → crawl unrestricted
    (``allow_all``); 5xx/network-unreachable means the server cannot
    say → assume COMPLETE DISALLOW (``disallow_all``), except that a
    host unreachable for more than 30 days MAY be treated as
    unavailable again (``allow_all``).  Getting 4xx-vs-5xx backwards
    either ignores every robots.txt behind a flaky server or
    blacklists every host without one — the two classic crawler
    bugs this tri-state exists to prevent.

    Input: one row per robots.txt fetch attempt (host, ts_us,
    status; status NULL or 0 = network error, treated as 5xx).  The
    verdict uses the LATEST attempt; the 30-day clock runs from the
    start of the trailing unreachable streak (the fetch_backoff
    trailing-streak shape: attempts after the last non-5xx — an
    order-free count, no sort dependence).  One host-keyed exchange
    shared by both windows and the collapse.  Returns (host,
    last_status, streak_start_us, mode)."""
    s = F.coalesce(F.col(status_col), F.lit(0))
    is_5xx = (s >= 500) | (s == 0)
    d = fetch_log.select(
        F.col(host_col).alias("host"),
        F.col(ts_col).cast("long").alias("__ts"),
        s.cast("int").alias("__status"),
        is_5xx.alias("__u"),
    )
    w = Window.partitionBy("host")
    # start of the trailing unreachable streak: min ts among attempts
    # AFTER the last non-5xx attempt (all-5xx hosts: the first attempt)
    last_ok_ts = F.max(F.when(~F.col("__u"), F.col("__ts"))).over(w)
    streak_min = F.min(
        F.when(F.col("__u") & (F.col("__ts") > F.coalesce(last_ok_ts, F.lit(-(1 << 62)))),
               F.col("__ts"))
    ).over(w)
    latest = F.max(F.col("__ts")).over(w)
    enriched = d.withColumns(
        {
            "__streak0": streak_min,
            "__latest": latest,
        }
    ).filter(F.col("__ts") == F.col("__latest"))
    mode = (
        F.when(~F.col("__u") & (F.col("__status") >= 200) & (F.col("__status") < 300), "use_rules")
        .when(~F.col("__u"), "allow_all")  # 3xx/4xx latest: unavailable
        .when(F.col("__ts") - F.col("__streak0") > stale_us, "allow_all")
        .otherwise("disallow_all")
    )
    return enriched.select(
        "host",
        F.col("__status").alias("last_status"),
        F.col("__streak0").alias("streak_start_us"),
        mode.alias("mode"),
    )


def robots_availability_sql(src: str, host_col: str = "host",
                            ts_col: str = "ts_us", status_col: str = "status",
                            stale_us: int = ROBOTS_STALE_US) -> str:
    """DuckDB replay of :func:`robots_availability` — same windows,
    same tri-state CASE, same 30-day streak clock."""
    return f"""
        WITH ra0 AS (
          SELECT {host_col} AS host, CAST({ts_col} AS BIGINT) AS ts,
                 CAST(COALESCE({status_col}, 0) AS INT) AS status,
                 (COALESCE({status_col}, 0) >= 500 OR COALESCE({status_col}, 0) = 0) AS u
          FROM {src}
        ), ra1 AS (
          SELECT *,
                 MAX(CASE WHEN NOT u THEN ts END) OVER (PARTITION BY host) AS last_ok,
                 MAX(ts) OVER (PARTITION BY host) AS latest
          FROM ra0
        ), ra2 AS (
          SELECT *,
                 MIN(CASE WHEN u AND ts > COALESCE(last_ok, {-(1 << 62)})
                          THEN ts END) OVER (PARTITION BY host) AS streak0
          FROM ra1
        )
        SELECT host, status AS last_status, streak0 AS streak_start_us,
               CASE WHEN NOT u AND status >= 200 AND status < 300 THEN 'use_rules'
                    WHEN NOT u THEN 'allow_all'
                    WHEN ts - streak0 > {stale_us} THEN 'allow_all'
                    ELSE 'disallow_all' END AS mode
        FROM ra2
        WHERE ts = latest
    """


def ip_politeness_pop(
    pending: DataFrame,
    dns: DataFrame,
    budget: int,
    n_salts: int = 16,
) -> DataFrame:
    """Per-server-IP budgeted pop: hosts that resolve to the same IP
    share ONE politeness budget (virtual-hosting collapse).

    Per-host budgets alone under-throttle shared infrastructure: ten
    thousand vhosts behind one server IP each get their own window,
    so the SERVER sees 10^4 × budget requests per wave. The
    reference never meets this (dblp.org is one host on one IP), but
    RFC 9309-era crawler practice keys the politeness clock on the
    connection target. `dns` is a `(host, ip)` dimension (one row
    per host — tiny relative to the frontier, broadcast). Hosts with
    NO dns row fall back to a private per-host key (`host:<host>`),
    i.e. unresolved hosts degrade to ordinary per-host politeness
    rather than being dropped or pooled together.

    Scale shape: one broadcast join stamps the collapse key, then the
    pop is :func:`politeness_pop`'s salted two-level top-k keyed on
    it — a hot shared IP (a CDN edge serving 85% of the frontier) is
    sorted in `n_salts` bounded pieces, never one task. Output keeps
    the pending columns plus `ip_key` so the fetch stage can also
    rate-limit per connection target.
    """
    cols = pending.columns
    keyed = (
        pending.withColumnRenamed("host", "__host")
        .join(F.broadcast(dns.select(F.col("host").alias("__host"), "ip")), "__host", "left")
        .withColumn(
            "host",
            F.coalesce(F.col("ip"), F.concat(F.lit("host:"), F.col("__host"))),
        )
        .drop("ip")
    )
    popped = politeness_pop(keyed, budget, n_salts=n_salts)
    return popped.select(
        *[F.col("__host").alias("host") if c == "host" else F.col(c) for c in cols],
        F.col("host").alias("ip_key"),
    )


def ip_politeness_sql(pending: str, dns: str, budget: int) -> str:
    """DuckDB replay of :func:`ip_politeness_pop` — single window
    over the collapse key (the salted two-level form is plan shape,
    not semantics; equivalence is politeness_pop's proven contract)."""
    return f"""
        WITH ipk AS (
          SELECT p.*, COALESCE(d.ip, 'host:' || p.host) AS ip_key
          FROM {pending} p LEFT JOIN {dns} d USING (host)
        ), ipr AS (
          SELECT *, row_number() OVER (
                   PARTITION BY ip_key ORDER BY priority DESC, url ASC) AS rn
          FROM ipk
        )
        SELECT * EXCLUDE (rn) FROM ipr WHERE rn <= {budget}
    """


def politeness_timeline_parallel(batch: DataFrame, nconn: int = 2,
                                 delay_us: int | None = None,
                                 host_col: str = "host", url_col: str = "url",
                                 ready_col: str = "ready_us",
                                 delay_col: str = "delay_us") -> DataFrame:
    """:func:`politeness_timeline` generalized to ``nconn`` parallel
    connections per host — the HTTP/1.1 "a polite crawler keeps 1-2
    connections" regime. Policy is DETERMINISTIC round-robin: fetch
    k (per-host pop order) runs on lane k mod nconn, and each lane
    enforces the per-connection delay independently via the same
    prefix-max closed form, now keyed by (host, lane). Round-robin
    is a defined schedule, not the greedy earliest-available one —
    with equal ready times they coincide, and with skewed ready
    times round-robin upper-bounds the greedy drain; the point is an
    exact, engine-portable plan, and ``nconn=1`` degenerates to the
    serial operator (pinned).

    Plan: the host-keyed rank and the (host, lane)-keyed running max
    — two exchanges, both slim (no payloads). Returns
    (host, url, k, lane, start_us, finish_us)."""
    d = (F.lit(delay_us).cast("long") if delay_us is not None
         else F.col(delay_col).cast("long"))
    w = Window.partitionBy(host_col).orderBy(
        F.col(ready_col).asc(), F.col(url_col).asc()
    )
    ranked = (
        batch.withColumn("k", (F.row_number().over(w) - 1).cast("long"))
        .withColumn("lane", (F.col("k") % nconn).cast("int"))
        .withColumn("j", F.expr(f"k div {nconn}"))
    )
    wl = Window.partitionBy(host_col, "lane").orderBy(F.col("k").asc())
    wrun = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        ranked.withColumn("__adj", F.col(ready_col).cast("long") - d * F.col("j"))
        .withColumn("start_us", d * F.col("j") + F.max("__adj").over(wrun))
        .withColumn("finish_us", F.col("start_us") + d)
        .drop("__adj", "j")
    )
    return out


def politeness_timeline_parallel_sql(src: str, nconn: int = 2,
                                     delay_us: int | None = None,
                                     host_col: str = "host",
                                     url_col: str = "url",
                                     ready_col: str = "ready_us",
                                     delay_col: str = "delay_us") -> str:
    """DuckDB replay of :func:`politeness_timeline_parallel`."""
    d = (str(delay_us) if delay_us is not None
         else f"CAST({delay_col} AS BIGINT)")
    return f"""
        WITH ptp AS (
          SELECT *,
                 CAST(ROW_NUMBER() OVER (PARTITION BY {host_col}
                   ORDER BY {ready_col} ASC, {url_col} ASC) - 1 AS BIGINT) AS k
          FROM {src}
        ), ptp1 AS (
          SELECT *, CAST(k % {nconn} AS INT) AS lane, k // {nconn} AS j
          FROM ptp
        ), ptp2 AS (
          SELECT *,
                 {d} * j + MAX(CAST({ready_col} AS BIGINT) - {d} * j) OVER (
                   PARTITION BY {host_col}, lane ORDER BY k ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS start_us
          FROM ptp1
        )
        SELECT * EXCLUDE (j), start_us + {d} AS finish_us FROM ptp2
    """


# ---- robots.txt drift --------------------------------------------------------
#
# robots.txt is a LIVE contract: sites tighten it after traffic
# spikes and loosen it after redesigns, and a frontier that queued a
# million URLs under last month's rules needs to know which of them
# just flipped. Complements robots_availability (is our copy stale?)
# with the semantic question (what does the NEW copy change?): both
# rule sets run through the full RFC 9309 longest-match decision —
# wildcards, '$' anchors, allow-tie precedence — and each URL gets a
# four-way verdict. newly_blocked URLs must leave the queue (keeping
# them is a compliance bug); newly_allowed ones are re-seed
# candidates. Two robots_decide passes + one url-keyed join; the
# rules side stays tiny per host, so the plan is two host-keyed
# joins + two hash aggs over the frontier — nothing new shuffles.

def robots_drift(urls: DataFrame, rules_old: DataFrame,
                 rules_new: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, allowed_old, allowed_new, verdict) for every distinct
    URL, verdict in {newly_blocked, newly_allowed, still_allowed,
    still_blocked} under old vs new (host, rule, pattern) sets."""
    old = robots_decide(urls, rules_old, url_col) \
        .withColumnRenamed("allowed", "allowed_old")
    new = robots_decide(urls, rules_new, url_col) \
        .withColumnRenamed("allowed", "allowed_new")
    o, n = F.col("allowed_old"), F.col("allowed_new")
    verdict = (
        F.when(o & ~n, "newly_blocked")
        .when(~o & n, "newly_allowed")
        .when(o & n, "still_allowed")
        .otherwise("still_blocked")
    )
    return old.join(new, "url").select(
        "url", "allowed_old", "allowed_new", verdict.alias("verdict"))


def robots_drift_sql(urls: str = "cand_urls",
                     rules_old: str = "robots_rules_old",
                     rules_new: str = "robots_rules_new") -> str:
    """DuckDB replay of :func:`robots_drift` — robots_decide_sql on
    each rule set (scoped WITHs inside subqueries), same verdict
    CASE."""
    return f"""
        SELECT o.url, o.allowed AS allowed_old, n.allowed AS allowed_new,
               CASE WHEN o.allowed AND NOT n.allowed THEN 'newly_blocked'
                    WHEN NOT o.allowed AND n.allowed THEN 'newly_allowed'
                    WHEN o.allowed AND n.allowed THEN 'still_allowed'
                    ELSE 'still_blocked' END AS verdict
        FROM ({robots_decide_sql(urls, rules_old)}) o
        JOIN ({robots_decide_sql(urls, rules_new)}) n USING (url)
    """


# ---- politeness compliance audit ---------------------------------------------
#
# The scheduler PLANS polite fetches (politeness_window/timeline);
# this audits what actually HAPPENED — a fetch log is the ground
# truth, and violations mean a worker ignored its window, a retry
# path bypassed the scheduler, or two shards fetched one host
# concurrently (the exact bug salted pops exist to prevent). Also
# the operator you run over a THIRD-party crawler's log before
# whitelisting it. Per host: consecutive-fetch gaps under the
# host's delay are violations; first fetches have no gap. One lag
# window per host + one hash agg, all int64 microseconds; the delay
# is a constant or a per-host column (adaptive_crawl_delay's output
# plugs in, same as politeness_timeline).

def politeness_compliance(log: DataFrame, delay_us: int | None = None,
                          host_col: str = "host", ts_col: str = "ts_us",
                          url_col: str = "url") -> DataFrame:
    """(host, n_fetches, n_violations, min_gap_us, delay_us,
    compliant) per host.  `delay_us` literal, or NULL to read a
    per-host ``delay_us`` column from the log.  min_gap_us is NULL
    for single-fetch hosts (no gap exists — vacuously compliant)."""
    from pyspark.sql import Window

    d = F.lit(delay_us).cast("long") if delay_us is not None \
        else F.col("delay_us")
    w = Window.partitionBy(host_col).orderBy(ts_col, url_col)
    gap = F.col(ts_col) - F.lag(F.col(ts_col)).over(w)
    marked = log.select(
        F.col(host_col).alias("host"),
        gap.alias("gap"),
        d.alias("d"),
    )
    g = marked.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.count(F.when(F.col("gap") < F.col("d"), 1)).alias("n_violations"),
        F.min("gap").alias("min_gap_us"),
        F.max("d").alias("delay_us"),
    )
    return g.withColumn("compliant", F.col("n_violations") == 0)


def politeness_compliance_sql(src: str, delay_us: int | None = None,
                              host_col: str = "host", ts_col: str = "ts_us",
                              url_col: str = "url") -> str:
    """DuckDB replay of :func:`politeness_compliance` — same lag
    window, counts, and NULL-gap semantics."""
    d = str(delay_us) if delay_us is not None else "delay_us"
    return f"""
        WITH pc_m AS (
          SELECT {host_col} AS host,
                 {ts_col} - lag({ts_col}) OVER
                   (PARTITION BY {host_col}
                    ORDER BY {ts_col}, {url_col}) AS gap,
                 CAST({d} AS BIGINT) AS d
          FROM {src}
        ), pc_g AS (
          SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches,
                 CAST(COUNT(CASE WHEN gap < d THEN 1 END) AS BIGINT)
                   AS n_violations,
                 MIN(gap) AS min_gap_us,
                 MAX(d) AS delay_us
          FROM pc_m GROUP BY host
        )
        SELECT *, n_violations = 0 AS compliant FROM pc_g
    """
