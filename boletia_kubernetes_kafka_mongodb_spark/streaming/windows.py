"""Event-time windowed aggregation with watermarks.

The reference has no event-time semantics at all (SURVEY.md §2.6 — late data
is just replay), but any production CDC/analytics pipeline needs windowed
aggregates with bounded state; this module supplies that capability over the
``events`` stream stand-in.

Batch form (driver query ``agg_time_window``) buckets on the epoch-microsecond
value of ``ts`` with long arithmetic — identical math in DuckDB
(``epoch_us``), so it is exactly oracle-checkable. The streaming form uses
the same bucketing plus ``withWatermark`` so state for closed windows is
evicted; equivalence on a replayed fixture is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables

HOUR_US = 3_600_000_000


def agg_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts/sums per event_type (batch, oracle-checked).

    ``ts`` is parquet ``timestamp[us]`` (TIMESTAMP_NTZ in Spark); the session
    timezone is pinned to UTC, so the NTZ→TZ cast is epoch-preserving and the
    bucket is plain integer division — no calendar math, engine-portable.
    """
    ev = tables.load(spark, sf_dir, "events")
    bucket = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(HOUR_US)
    ).cast("long")
    return (
        ev.groupBy(bucket.alias("hour_bucket"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


def agg_time_window_oracle() -> str:
    return f"""
        SELECT CAST(epoch_us(ts) // {HOUR_US} AS BIGINT) AS hour_bucket,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 4) AS value_sum,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY 1, 2
    """


def agg_time_window_stream(events_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin: watermarked tumbling window.

    The watermark bounds state: windows older than max(event time) −
    watermark are finalized and evicted — the knob the reference lacks
    entirely (its 'late data' handling is unbounded replay). ``ts`` is a
    TIMESTAMP_NTZ; cast to the session-UTC timestamp for the watermark clock.
    """
    with_ts = events_stream.withColumn(
        "event_time", F.col("ts").cast("timestamp")
    ).withWatermark("event_time", watermark)
    return (
        with_ts.groupBy(F.window("event_time", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            (F.unix_timestamp(F.col("w.start")) / 3600).cast("long").alias("hour_bucket"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def agg_sessionize_stream(events_stream: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Streaming twin of ``operators.aggregates.agg_sessionize``: watermarked
    merging session windows per user.

    Sessions are the canonical unbounded-state aggregate — without a
    watermark every open session lives forever. With one, a session
    finalizes (append-emits) once the watermark passes its end, and its
    state evicts; the batch twin over the same replayed fixture must agree
    on every finalized session (asserted in tests/test_windows.py).
    """
    with_ts = events_stream.withColumn(
        "event_time", F.col("ts").cast("timestamp")
    ).withWatermark("event_time", watermark)
    return (
        with_ts.groupBy(
            F.col("user_id"),
            F.session_window(F.col("event_time"), "30 minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "value_sum",
        )
    )


FUNNEL_SNAPSHOT_SCHEMA = "user_id long, r1 boolean, r2 boolean, r3 boolean"
FUNNEL_STATE_SCHEMA = "seen_view boolean, qual_click boolean, reached3 boolean"


def funnel_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.aggregates.agg_funnel_stages``: per-user
    funnel progress as ``applyInPandasWithState`` keyed by ``user_id``.

    The batch operator's window rule — a stage qualifies iff the previous
    stage occurred on a strictly earlier row in (ts, event_id) order — is
    exactly a sequential fold over that order, so the state is THREE
    BOOLEANS per user (seen view / seen qualified click / converted), not a
    buffer of events: each micro-batch sorts its rows and folds them through
    the carried flags. Progress is monotone, so the last emitted snapshot
    per user equals the batch verdict when arrival order matches event-time
    order (the ordered-replay contract shared with the admission ledger).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdf_iter, state):
        import pandas as pd

        rows = [pdf for pdf in pdf_iter]
        pdf = pd.concat(rows).sort_values(["ts", "event_id"]) if rows else None
        if pdf is None or pdf.empty:
            return
        if state.exists:
            seen_view, qual_click, reached3 = state.get
        else:
            seen_view = qual_click = reached3 = False
        for et in pdf["event_type"]:
            if et == "view":
                seen_view = True
            elif et == "click" and seen_view:
                qual_click = True
            elif et == "purchase" and qual_click:
                reached3 = True
        state.update((seen_view, qual_click, reached3))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "r1": [seen_view],
                "r2": [qual_click],
                "r3": [reached3],
            }
        )

    return events_stream.select(
        "user_id", "ts", "event_id", "event_type"
    ).groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=FUNNEL_SNAPSHOT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
