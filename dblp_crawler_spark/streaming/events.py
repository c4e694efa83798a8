"""Event-stream operators: windowed aggregation and gap
sessionization, written once and usable both as batch transforms
(DuckDB-oracle-able) and under Structured Streaming.

The reference is pure batch (SURVEY.md §2.7) — these are the
training-pipeline/streaming additions. For streaming, pair
`windowed_counts_streaming` with a watermark so late events beyond
the horizon drop deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, granularity: str = "hour") -> DataFrame:
    """Tumbling-window counts/avg per event_type (batch form —
    date_trunc keys so DuckDB can oracle it)."""
    return (
        events.groupBy(
            F.date_trunc(granularity, F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def windowed_counts_streaming(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Streaming form: event-time tumbling window + watermark for
    late data. Same aggregate semantics as windowed_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    from the previous event exceeds `gap_minutes`. Classic two-window
    plan (lag → cumulative sum) — one shuffle on user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # millisecond precision so batch and oracle agree exactly
    # (cast: the parquet column is TIMESTAMP_NTZ; session TZ is UTC)
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gap_ms = ms - F.lag(ms).over(w)
    with_flag = events.withColumn(
        "new_session",
        F.when(gap_ms.isNull() | (gap_ms > gap_minutes * 60 * 1000), F.lit(1)).otherwise(F.lit(0)),
    )
    with_id = with_flag.withColumn("session_id", F.sum("new_session").over(w))
    return with_id.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def sessionize_stateful(
    events: DataFrame, gap_minutes: int = 30, idle_timeout: bool = False
) -> DataFrame:
    """Gap sessionization as a CUSTOM STATEFUL streaming operator
    (`applyInPandasWithState`) — the unbounded-stream form of
    `sessionize`. The batch plan (lag + cumulative-sum windows) needs
    a user's whole history per query; here per-group state is O(1):
    only the OPEN session (start, last_ts, n, sum) survives between
    micro-batches. Closed sessions are emitted as soon as a gap >
    `gap_minutes` is observed; an idle session is flushed by state
    timeout. Arrow-batched; the in-batch session split is vectorized
    pandas (cumsum over gap flags), not per-row Python.

    Emits CLOSED sessions only — each user's currently-open session
    is in state, not in the sink (tests compare against the batch
    result minus each user's final session).

    Ordering contract: events must arrive in event-time order ACROSS
    micro-batches per user (in-batch disorder is fine — each batch is
    sorted). Late events need the watermark/buffer machinery of
    Spark's built-in session_window; this operator is the custom-
    state-API form for ordered streams.

    `idle_timeout=True` additionally flushes an idle user's open
    session WITHOUT a follow-up event from that user, via
    EventTimeTimeout: a 0-delay watermark is stamped on `ts` and
    each open session arms a timeout at `last_ts + gap`; when OTHER
    users' events advance the event-time watermark past that point,
    the next micro-batch fires the timeout and emits the closed
    session. Event-time is the correct clock here — the flush means
    "no event can close this gap any more", which a wall clock
    cannot know. (ProcessingTimeTimeout was tried first and is
    unusable under `availableNow` on Spark 4.1.2: with a pending
    processing-time timer the drained query busy-loops timeout-only
    micro-batches — hundreds of state-store commits, never
    terminates. Event-time timeouts only fire when data moves the
    watermark, so the drain terminates normally.) Timeouts use the
    watermark as of the PREVIOUS batch, so a flush lands one
    data-carrying micro-batch after the watermark passes it.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000
    uid_dt = events.schema["user_id"].dataType.simpleString()
    out_schema = (
        f"user_id {uid_dt}, session_start timestamp, session_end timestamp, "
        "n_events long, sum_value double"
    )
    state_schema = "start long, last long, n long, sv double"

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        open_start, open_last, open_n, open_sv = (
            state.get if state.exists else (None, None, 0, 0.0)
        )
        if state.hasTimedOut:
            # idle flush: the open session closes with no new events
            state.remove()
            if open_start is not None:
                yield pd.DataFrame(
                    {
                        "user_id": [user],
                        "session_start": [pd.to_datetime(open_start, unit="ms")],
                        "session_end": [pd.to_datetime(open_last, unit="ms")],
                        "n_events": [open_n],
                        "sum_value": [open_sv],
                    }
                )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        rows = rows.sort_values(["ts", "event_id"], ignore_index=True)
        ms = rows["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
        prev = ms.shift(1)
        if open_last is not None:
            prev.iloc[0] = open_last
        new_flag = prev.isna() | ((ms - prev) > gap_ms)
        sess_id = new_flag.cumsum()  # first in-batch session is 0 iff it continues the open one
        sessions = (
            pd.DataFrame({"sid": sess_id, "ms": ms, "value": rows["value"].astype(float)})
            .groupby("sid")
            .agg(start=("ms", "min"), last=("ms", "max"), n=("ms", "size"), sv=("value", "sum"))
            .reset_index()
            .sort_values("sid", ignore_index=True)
        )
        parts = []
        if open_start is not None:
            if new_flag.iloc[0]:
                # batch opens a NEW session → the open one is closed now
                parts.append(
                    pd.DataFrame(
                        {"start": [open_start], "last": [open_last], "n": [open_n], "sv": [open_sv]}
                    )
                )
            else:
                # merge the first in-batch session into the open one
                sessions.loc[0, "start"] = open_start
                sessions.loc[0, "n"] += open_n
                sessions.loc[0, "sv"] += open_sv
        parts.append(sessions.iloc[:-1][["start", "last", "n", "sv"]])
        closed = pd.concat(parts, ignore_index=True)
        tail = sessions.iloc[-1]
        state.update((int(tail["start"]), int(tail["last"]), int(tail["n"]), float(tail["sv"])))
        if idle_timeout:
            # must be strictly past the current watermark or Spark
            # rejects it; an already-overdue session then fires on
            # the very next watermark advance
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(int(tail["last"]) + gap_ms, wm + 1))
        if len(closed):
            yield pd.DataFrame(
                {
                    "user_id": user,
                    "session_start": pd.to_datetime(closed["start"], unit="ms"),
                    "session_end": pd.to_datetime(closed["last"], unit="ms"),
                    "n_events": closed["n"].astype("int64"),
                    "sum_value": closed["sv"].round(4),
                }
            )

    conf = GroupStateTimeout.EventTimeTimeout if idle_timeout else GroupStateTimeout.NoTimeout
    if idle_timeout and events.isStreaming:
        # ordered-stream contract (above): no lateness allowance —
        # the watermark tracks the max seen event time
        events = events.withWatermark("ts", "0 seconds")
    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", conf
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session rollup (count + mean length in seconds).

    The mean is SUM(integer ms) / (n · 1000), not AVG(double):
    durations are exact integer milliseconds, so the integer sum is
    order-independent and the single float division lands on the
    identical double in any engine — AVG over doubles is summed in
    partition order and once hit a round-to-3dp cliff (57.4915 ms
    boundary) where Spark and the SQL oracle rounded to different
    sides of it."""
    s = sessionize(events, gap_minutes)
    dur_ms = F.unix_millis(F.col("session_end").cast("timestamp")) - F.unix_millis(
        F.col("session_start").cast("timestamp")
    )
    return s.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.round(
            F.sum(dur_ms) / (F.count(F.lit(1)) * F.lit(1000.0)), 3
        ).alias("avg_session_secs"),
    )


def asof_attribute(events: DataFrame, anchor_type: str, attr_type: str) -> DataFrame:
    """As-of join within one stream: for each `anchor_type` event,
    the most recent strictly-preceding `attr_type` event of the same
    user ("which view does this click attribute to"). The classic
    temporal operator Spark has no primitive for — expressed as a
    running `last(..., ignorenulls)` over a (ts, event_id)-ordered
    per-user window: ONE shuffle on user_id, no range join, no
    per-row Python. Deterministic under ts ties via the event_id
    tiebreak.

    At scale this beats the generic range-join formulation (join on
    user + ts inequality → O(anchors x candidates) per user before
    dedup); the window form is linear in events per user and
    partition-local after the single shuffle.

    Returns (user_id, event_id, ts, src_event_id, src_ts) for anchor
    events; src_* are null when no prior attr event exists.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)  # strictly before
    )
    is_attr = F.col("event_type") == attr_type
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("src_event_id", F.last(F.when(is_attr, F.col("event_id")), ignorenulls=True).over(w))
        .withColumn("src_ts_ms", F.last(F.when(is_attr, ms), ignorenulls=True).over(w))
        .filter(F.col("event_type") == anchor_type)
        .select("user_id", "event_id", ms.alias("ts_ms"), "src_event_id", "src_ts_ms")
    )


def range_follow_join(events: DataFrame, anchor_type: str, follow_type: str,
                      within_minutes: int = 30) -> DataFrame:
    """Range join: (anchor, follow) pairs where the follow event of
    the same user lands in (anchor_ts, anchor_ts + Δ] — "purchases
    within 30 min of a click". Spark has no range-join primitive and
    the naive formulation (equi-join on user + ts inequality) makes
    the optimizer pick a nested-loop per user; this is the banded
    form: bucket time into Δ-wide bins, probe each anchor against
    bins b and b+1 (a (ts, ts+Δ] interval spans at most two), then
    filter the exact inequality. Pure equi-join on (user_id, bin) —
    partition-prunable, AQE-skew-splittable, linear shuffle volume
    (2 rows per anchor, 1 per follow).

    Returns (user_id, anchor_id, follow_id, gap_ms), gap_ms > 0.
    """
    delta_ms = within_minutes * 60 * 1000
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    anchors = (
        events.filter(F.col("event_type") == anchor_type)
        .select("user_id", F.col("event_id").alias("anchor_id"), ms.alias("a_ms"))
        .withColumn("bin", F.explode(F.array(
            F.floor(F.col("a_ms") / delta_ms), F.floor(F.col("a_ms") / delta_ms) + 1
        )))
    )
    follows = (
        events.filter(F.col("event_type") == follow_type)
        .select("user_id", F.col("event_id").alias("follow_id"), ms.alias("f_ms"))
        .withColumn("bin", F.floor(F.col("f_ms") / delta_ms))
    )
    return (
        anchors.join(follows, ["user_id", "bin"])
        .filter((F.col("f_ms") > F.col("a_ms")) & (F.col("f_ms") <= F.col("a_ms") + delta_ms))
        .select("user_id", "anchor_id", "follow_id", (F.col("f_ms") - F.col("a_ms")).alias("gap_ms"))
    )


def hypertable_rollup(events: DataFrame) -> DataFrame:
    """Continuous-aggregate (hypertable) rollup: minute → hour → day,
    each level computed FROM the previous level's partials, never by
    rescanning raw rows. The TimescaleDB continuous-aggregate
    pattern: at 100 TB the minute level is the only full scan; the
    hour level aggregates ~60x fewer rows, the day level ~24x fewer
    again, and a refresh of one late minute only touches its hour
    and day rows. count/sum compose losslessly (sum of sums); avg is
    re-derived as sum/count at each level, never averaged-of-avgs.

    Returns the day level: (day, event_type, n, sum_value) — the
    finer levels are intermediate DataFrames a caller can persist as
    materialized rollup tables.
    """
    # sums in DECIMAL: double addition is order-sensitive, and a
    # rollup sums in a different order than a direct aggregation —
    # decimal is exact and associative, so every level (and the
    # DuckDB oracle) lands on the identical value
    val = F.col("value").cast("decimal(18,6)")
    minute = (
        events.groupBy(
            F.date_trunc("minute", F.col("ts").cast("timestamp")).alias("minute"),
            "event_type",
        ).agg(F.count("*").alias("n"), F.sum(val).alias("sum_value"))
    )
    hour = (
        minute.groupBy(F.date_trunc("hour", "minute").alias("hour"), "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
    )
    day = (
        hour.groupBy(F.date_trunc("day", "hour").cast("date").alias("day"), "event_type")
        # the sum is computed exactly in decimal, then emitted as double so
        # the output type matches engines whose decimal widths differ
        # (DuckDB SUM(DECIMAL(18,6)) widens to DECIMAL(38,6))
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").cast("decimal(18,6)").cast("double").alias("sum_value"),
        )
    )
    return day


def funnel(events: DataFrame, stages: list[str] | None = None,
           horizon_hours: int = 72) -> DataFrame:
    """Ordered conversion funnel: per stage, how many users reached
    it IN ORDER within `horizon_hours` of their first stage-1 event —
    the product-analytics primitive (Amplitude/Mixpanel's core
    query). "Reached stage k" means: an event of stage-k type whose
    (ts, event_id) order position is strictly after the user's
    qualifying stage-(k-1) event, with every stage inside the horizon
    anchored at the user's FIRST stage-1 event. A purchase before any
    view does not count; one view→click→purchase chain per user.

    Plan shape: the per-user chain is k-1 running-min windows over
    the SAME (user_id / ts, event_id) sort — Spark plans one
    exchange + one sort and stacks the Window operators on it — then
    one distinct-count aggregate per stage. No self-joins, no
    per-user collect; state per row is O(stages).

    Output: (stage, event_type, n_users), stage 1-based.
    """
    stages = stages or ["view", "click", "purchase"]
    horizon_us = horizon_hours * 3600 * 1_000_000
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("__us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.col("ts").cast("timestamp")
    d = events.select(
        "user_id", "event_id", "event_type",
        F.unix_micros(t).alias("__us"),
    )
    # qualifying timestamp per stage, built stage-by-stage: a stage-k
    # event qualifies if a qualifying stage-(k-1) event precedes it
    # and it lands within the horizon of the stage-1 anchor
    qual_cols = []
    for k, st in enumerate(stages):
        if k == 0:
            q = F.when(F.col("event_type") == st, F.col("__us"))
        else:
            prev_min = F.min(f"__q{k - 1}").over(w_prev)
            anchor = F.min("__q0").over(w_prev)
            q = F.when(
                (F.col("event_type") == st)
                & prev_min.isNotNull()
                & (F.col("__us") <= anchor + F.lit(horizon_us)),
                F.col("__us"),
            )
        d = d.withColumn(f"__q{k}", q)
        qual_cols.append(f"__q{k}")
    agg = d.agg(*[
        F.count_distinct(F.when(F.col(c).isNotNull(), F.col("user_id"))).alias(f"n{k}")
        for k, c in enumerate(qual_cols)
    ])
    rows = None
    for k, st in enumerate(stages):
        r = agg.select(
            F.lit(k + 1).alias("stage"),
            F.lit(st).alias("event_type"),
            F.col(f"n{k}").cast("long").alias("n_users"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def funnel_sql(src: str = "events", stages: list[str] | None = None,
               horizon_hours: int = 72) -> str:
    """DuckDB replay of :func:`funnel` — same running-min windows
    over the same (ts, event_id) order, same horizon anchor."""
    stages = stages or ["view", "click", "purchase"]
    horizon_us = horizon_hours * 3600 * 1_000_000
    w = "OVER (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    ctes = [f"""fu0 AS (
          SELECT user_id, event_id, event_type,
                 CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
                 CASE WHEN event_type = '{stages[0]}' THEN
                      CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) END AS q0
          FROM {src}
        )"""]
    for k in range(1, len(stages)):
        ctes.append(f"""fu{k} AS (
          SELECT *, CASE WHEN event_type = '{stages[k]}'
                          AND MIN(q{k - 1}) {w} IS NOT NULL
                          AND us <= MIN(q0) {w} + {horizon_us}
                         THEN us END AS q{k}
          FROM fu{k - 1}
        )""")
    last = f"fu{len(stages) - 1}"
    sel = " UNION ALL ".join(
        f"SELECT {k + 1} AS stage, '{st}' AS event_type, "
        f"CAST(COUNT(DISTINCT CASE WHEN q{k} IS NOT NULL THEN user_id END) AS BIGINT)"
        f" AS n_users FROM {last}"
        for k, st in enumerate(stages)
    )
    return "WITH " + ", ".join(ctes) + " " + sel


def retention_cohorts(events: DataFrame, max_weeks: int = 8) -> DataFrame:
    """Weekly retention cohorts: users grouped by FIRST-event date,
    retention at week k = the fraction of the cohort active k weeks
    later — the growth-analytics table every engagement dashboard
    draws. Cohort key is the first event's DATE and k = floor(days
    since / 7): day-exact arithmetic, no week-boundary convention to
    disagree on cross-engine.

    Plan shape: one min-agg per user (map-side partials), an
    equi-join of events back to their user's cohort row (user-keyed
    shuffle both sides — co-partitioned, no broadcast needed at any
    scale), then a distinct-count per (cohort, k). retention_pct is
    exact-integer 10000ths rounded to 2, so the division is the only
    float op.

    Output: (cohort_date, week_k, n_cohort, n_active, retention_pct).
    """
    t = F.col("ts").cast("timestamp")
    ev = events.select("user_id", t.cast("date").alias("day"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_date"))
    sizes = first.groupBy("cohort_date").agg(
        F.count_distinct("user_id").alias("n_cohort")
    )
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id", "cohort_date",
            F.floor(F.datediff("day", "cohort_date") / 7).cast("int").alias("week_k"),
        )
        .filter(F.col("week_k") <= max_weeks)
        .groupBy("cohort_date", "week_k")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return (
        act.join(sizes, "cohort_date")
        .select(
            "cohort_date", "week_k",
            F.col("n_cohort").cast("long").alias("n_cohort"),
            F.col("n_active").cast("long").alias("n_active"),
            F.round(F.col("n_active") * 100.0 / F.col("n_cohort"), 2).alias("retention_pct"),
        )
    )


def retention_cohorts_sql(src: str = "events", max_weeks: int = 8) -> str:
    """DuckDB replay of :func:`retention_cohorts` — same day-exact
    cohort arithmetic."""
    return f"""
        WITH rc_ev AS (
          SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM {src}
        ), rc_first AS (
          SELECT user_id, MIN(day) AS cohort_date FROM rc_ev GROUP BY user_id
        ), rc_sizes AS (
          SELECT cohort_date, COUNT(DISTINCT user_id) AS n_cohort
          FROM rc_first GROUP BY cohort_date
        ), rc_act AS (
          SELECT f.cohort_date,
                 CAST((e.day - f.cohort_date) // 7 AS INT) AS week_k,
                 COUNT(DISTINCT e.user_id) AS n_active
          FROM rc_ev e JOIN rc_first f USING (user_id)
          WHERE (e.day - f.cohort_date) // 7 <= {max_weeks}
          GROUP BY 1, 2
        )
        SELECT cohort_date, week_k,
               CAST(n_cohort AS BIGINT) AS n_cohort,
               CAST(n_active AS BIGINT) AS n_active,
               ROUND(n_active * 100.0 / n_cohort, 2) AS retention_pct
        FROM rc_act JOIN rc_sizes USING (cohort_date)
    """


def transition_matrix(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "ts") -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for every ordered pair of event types, how often does
    `to_type` immediately follow `from_type` in some user's stream,
    and what fraction of `from_type`'s outgoing transitions is that
    — the navigation-model primitive (next-page prediction, broken-
    flow detection: a checkout whose dominant successor is `error`
    is an alert, and crawl-side the same shape models which page
    template follows which).

    Exactly one wide shuffle: the per-user `lead` window (ordered by
    (ts, event_id) so timestamp ties cannot flip transitions between
    engines — the same determinism discipline as the funnel).  The
    (from, to) count is a hash agg with map-side partials, and the
    per-from normalizer is a window over the already-aggregated
    (tiny: |types|^2) matrix, not over the event stream.  To model
    within-session transitions only, feed the output of `sessionize`
    and use its session id as `user_col`.

    Output: (from_type, to_type, n, p) with p = n / sum_n(from),
    rounded to 6."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col("event_id"))
    steps = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n"))
    tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type", "to_type", F.col("n").cast("long").alias("n"),
        F.round(F.col("n") * 1.0 / F.sum("n").over(tot), 6).alias("p"),
    )


def transition_matrix_sql(src: str = "events", user_col: str = "user_id",
                          type_col: str = "event_type",
                          ts_col: str = "ts") -> str:
    """DuckDB replay of :func:`transition_matrix` — same (ts,
    event_id) ordering, same normalization."""
    return f"""
        WITH tm_s AS (
          SELECT {type_col} AS from_type,
                 LEAD({type_col}) OVER (PARTITION BY {user_col}
                   ORDER BY {ts_col}, event_id) AS to_type
          FROM {src}
        ), tm_c AS (
          SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM tm_s WHERE to_type IS NOT NULL
          GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n,
               ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
        FROM tm_c
    """
