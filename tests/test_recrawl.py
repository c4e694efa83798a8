"""Adaptive recrawl scheduling (operators/recrawl.py): change
detection over a per-url fetch log and the staleness priority
n_changes * age / span. Hand-built fixture with known change counts;
the DuckDB value parity for the driver entry runs via
tools/check_oracle.py and the driver's own gate."""

from datetime import datetime

from pyspark.sql import functions as F

from dblp_crawler_spark.operators import recrawl as RC


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour, 0, 0)


def _log(spark):
    # url A: fetched days 1,2,3,4 with content v1,v1,v2,v3 -> 2 changes,
    #        span 3 d, last fetch day 4
    # url B: fetched days 1,2,3,4,10 never changing -> 0 changes
    # url C: fetched once (day 1) -> no observable rate
    # url D: fetched days 1,10, changed -> 1 change, span 9 d, stale since day 10
    rows = [
        ("A", _ts(1), "v1"), ("A", _ts(2), "v1"), ("A", _ts(3), "v2"), ("A", _ts(4), "v3"),
        ("B", _ts(1), "x"), ("B", _ts(2), "x"), ("B", _ts(3), "x"),
        ("B", _ts(4), "x"), ("B", _ts(10), "x"),
        ("C", _ts(1), "y"),
        ("D", _ts(1), "p"), ("D", _ts(10), "q"),
    ]
    return spark.createDataFrame(rows, "url string, ts timestamp, fingerprint string")


def test_change_history_marks_transitions(spark):
    m = RC.change_history(_log(spark))
    got = {(r.url, r.ts.day): r.changed for r in m.collect()}
    # first fetch of every url is a discovery, not a change
    assert got[("A", 1)] == 0 and got[("B", 1)] == 0 and got[("C", 1)] == 0
    assert got[("A", 2)] == 0 and got[("A", 3)] == 1 and got[("A", 4)] == 1
    assert all(got[("B", d)] == 0 for d in (2, 3, 4, 10))
    assert got[("D", 10)] == 1


def test_recrawl_priorities_staleness_ranking(spark):
    pr = {r.url: r for r in RC.recrawl_priorities(_log(spark)).collect()}
    day = 86400.0  # seconds; micros cancel in the ratio
    # now = day 10 (global max ts)
    # A: 2 changes / 3 d span, 6 d stale -> 2*6/3 = 4.0
    assert pr["A"].n_fetches == 4 and pr["A"].n_changes == 2
    assert abs(pr["A"].priority - 4.0) < 1e-9
    # B: never changed -> 0 regardless of staleness
    assert pr["B"].n_changes == 0 and pr["B"].priority == 0.0
    # C: single fetch, span 0 -> no observable rate
    assert pr["C"].n_fetches == 1 and pr["C"].priority is None
    # D: 1 change / 9 d span, fetched at "now" -> age 0 -> 0.0
    assert pr["D"].n_changes == 1 and pr["D"].priority == 0.0
    # ranking: the frequently-changing stale page outranks everything
    ranked = [
        r.url
        for r in RC.recrawl_priorities(_log(spark))
        .filter(F.col("priority").isNotNull())
        .orderBy(F.desc("priority"), "url")
        .collect()
    ]
    assert ranked[0] == "A"


def test_recrawl_single_url_shuffle(spark):
    """Window and groupBy share the url partitioning: exactly one
    url-keyed exchange feeds both (plus the 1-row broadcast for the
    deterministic now)."""
    plan = RC.recrawl_priorities(_log(spark))._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_snapshot_diff_classification(spark):
    from dblp_crawler_spark.operators.recrawl import snapshot_diff

    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "a"), ("u3", "a"), ("u4", None), ("u5", None)],
        "url string, fingerprint string")
    new = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u4", None), ("u5", "x"), ("u6", "c")],
        "url string, fingerprint string")
    got = {r.url: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u4": "unchanged",   # NULL fp both sides: no observed transition
        "u5": "changed",     # NULL -> real fingerprint IS a transition
        "u6": "added",
    }


def test_snapshot_diff_single_join_plan(spark):
    from dblp_crawler_spark.operators.recrawl import snapshot_diff

    old = spark.createDataFrame([("u1", "a")], "url string, fingerprint string")
    new = spark.createDataFrame([("u1", "b")], "url string, fingerprint string")
    plan = snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FullOuter") == 1 and plan.count("Exchange") == 2


def test_fetch_backoff_schedule(spark):
    import datetime

    from dblp_crawler_spark.operators.scheduler import fetch_backoff

    def t(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # u1: ok, fail, fail -> streak 2 -> delay 1000ms * 2^1 = 2s
        ("u1", t(0), True), ("u1", t(10), False), ("u1", t(20), False),
        # u2: last fetch ok -> eligible immediately
        ("u2", t(0), False), ("u2", t(5), True),
        # u3: never ok, 3 fails -> delay 4s
        ("u3", t(1), False), ("u3", t(2), False), ("u3", t(3), False),
    ]
    log = spark.createDataFrame(rows, "url string, ts timestamp, ok boolean")
    got = {r.url: r for r in fetch_backoff(log, base_ms=1000).collect()}
    us = lambda s: int(datetime.datetime(2024, 1, 1, 0, 0, s,
                       tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert got["u1"].n_fails == 2 and got["u1"].next_eligible_us == us(20) + 2_000_000
    assert got["u2"].n_fails == 0 and got["u2"].next_eligible_us == us(5)
    assert got["u3"].n_fails == 3 and got["u3"].next_eligible_us == us(3) + 4_000_000


def test_fetch_backoff_cap_and_single_exchange(spark):
    import datetime

    from dblp_crawler_spark.operators.scheduler import fetch_backoff

    rows = [("u", datetime.datetime(2024, 1, 1, 0, 0, i), False) for i in range(30)]
    log = spark.createDataFrame(rows, "url string, ts timestamp, ok boolean")
    out = fetch_backoff(log, base_ms=1000, cap_ms=3_600_000)
    # plan BEFORE collect: post-execution AQE toString dumps initial
    # + final plans and double-counts exchanges
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    r = out.collect()[0]
    # 30 failures would be 2^29 s uncapped; the cap clamps to 1 h
    assert r.n_fails == 30
    assert r.next_eligible_us - r.last_ts_us == 3_600_000 * 1000


def test_fetch_plan_triage(spark):
    import datetime

    from dblp_crawler_spark.operators.recrawl import fetch_plan

    d = datetime.date
    discovered = spark.createDataFrame(
        [("u_new", d(2024, 7, 1)), ("u_changed", d(2024, 7, 1)),
         ("u_fresh", d(2024, 5, 1)), ("u_same_day", d(2024, 6, 15)),
         ("u_nolastmod", None)],
        "url string, lastmod date")
    state = spark.createDataFrame(
        [("u_changed", d(2024, 6, 15)), ("u_fresh", d(2024, 6, 15)),
         ("u_same_day", d(2024, 6, 15)), ("u_nolastmod", d(2024, 6, 15))],
        "url string, last_fetch date")
    got = {r.url: r.action for r in fetch_plan(discovered, state).collect()}
    assert got == {
        "u_new": "fetch",          # never fetched
        "u_changed": "fetch",      # sitemap says newer
        "u_fresh": "skip",         # provably fresh
        "u_same_day": "skip",      # lastmod == last_fetch: not newer
        "u_nolastmod": "revalidate",  # only a conditional GET can tell
    }


def test_canonical_election_aliases_and_report(spark):
    from dblp_crawler_spark.operators.recrawl import canonical_election

    rows = [
        ("http://a.org/1", "X", "a.org"),   # canonical (min url) of X
        ("http://b.org/7", "X", "b.org"),   # mirror alias of X
        ("http://b.org/2", "Y", "b.org"),   # unique content
        ("http://b.org/9", None, "b.org"),  # failed fetch: excluded
        ("http://a.org/0", "X", "a.org"),   # an even smaller url wins
    ]
    f = spark.createDataFrame(rows, "url string, fingerprint string, host string")
    amap, report = canonical_election(f)
    aliases = {(r.url, r.canonical_url) for r in amap.collect()}
    assert aliases == {("http://a.org/1", "http://a.org/0"),
                       ("http://b.org/7", "http://a.org/0")}
    rep = {r.host: (r.n_pages, r.n_aliases, r.alias_rate) for r in report.collect()}
    assert rep["a.org"] == (2, 1, 0.5)
    assert rep["b.org"] == (2, 1, 0.5)  # the NULL-fp fetch never counts
