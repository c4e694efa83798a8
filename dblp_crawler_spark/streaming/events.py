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


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session rollup (count + mean length in seconds)."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.round(
            F.avg(
                (
                    F.unix_millis(F.col("session_end").cast("timestamp"))
                    - F.unix_millis(F.col("session_start").cast("timestamp"))
                )
                / 1000.0
            ),
            3,
        ).alias("avg_session_secs"),
    )
