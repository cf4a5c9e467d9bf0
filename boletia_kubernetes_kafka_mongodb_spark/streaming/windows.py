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


def anomaly_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-volume baseline (mean/stddev over days) — the batch
    side of the lambda-shaped anomaly detector: computed offline over the
    standing corpus, broadcast into the live stream. Same statistics as
    ``operators.aggregates.agg_anomaly_zscore`` derives internally."""
    from .. import tables

    ev = tables.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return daily.groupBy("event_type").agg(
        F.avg("n").alias("mean_n"), F.stddev_samp("n").alias("std_n")
    )


def anomaly_alert_stream(
    events_stream: DataFrame, baseline: DataFrame, watermark: str = "0 seconds"
) -> DataFrame:
    """Streaming twin of ``agg_anomaly_zscore``'s FLAGGING stage: tumbling
    1-day window counts per type (watermark-bounded state), stream-static
    broadcast join against the offline baseline, emit only the anomalous
    days. The static side is |types| rows — at 100 TB the baseline job is
    the heavy lift and runs in batch; the detector itself keeps one count
    per (type, open day) of state and never rescans history.

    Emission semantics: in append mode a day's alert emits when the
    watermark passes the day's END — i.e. the alert for the STILL-OPEN day
    is withheld until the day closes (the watermark tracks max event time,
    which never reaches the open window's end). That is the finalized-facts
    contract; a monitoring deployment that wants provisional intra-day
    alerts runs this same frame in ``update`` output mode, where every
    trigger re-emits the open day's current z. The parity test replays with
    a far-future sentinel so every data day finalizes regardless of whether
    the fixture's LAST day is the anomalous one.

    Flagging uses the shared ``ZSCORE_THRESHOLD`` on the UNROUNDED z —
    identical to the batch twin, so threshold-boundary days can't diverge
    between the two (rounding happens only on the emitted display column).
    """
    from ..operators.aggregates import ZSCORE_THRESHOLD

    with_ts = events_stream.withColumn(
        "event_time", F.col("ts").cast("timestamp")
    ).withWatermark("event_time", watermark)
    counts = with_ts.groupBy(
        F.window("event_time", "1 day").alias("w"), F.col("event_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    z = F.when(
        F.col("std_n") > 0, (F.col("n") - F.col("mean_n")) / F.col("std_n")
    )
    return (
        counts.join(F.broadcast(baseline), "event_type")
        .select(
            "event_type",
            F.col("w.start").cast("date").alias("day"),
            "n",
            z.alias("_z"),
        )
        .where(F.abs(F.col("_z")) > ZSCORE_THRESHOLD)
        .select(
            "event_type", "day", "n", F.round("_z", 6).alias("zscore")
        )
    )


def attribution_stream(
    views_stream: DataFrame,
    purchases_stream: DataFrame,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Stream-STREAM twin of ``operators.joins.join_attribution`` — the one
    join class where BOTH inputs are unbounded: each side carries its own
    watermark and the interval predicate (`view_ts ∈ [purchase_ts − 2h,
    purchase_ts]`) gives Spark the event-time bound it needs to EVICT
    buffered rows (a view older than watermark − 2h can never match a
    future purchase, so its state drops). Without the two-sided time
    constraint the buffers grow forever — that constraint is the entire
    design burden stream-stream joins add over stream-static ones.

    Inner join ⇒ results emit as soon as both sides arrive; replayed to
    completion it must equal the batch interval join (asserted in tests).
    """
    from ..operators.joins import ATTRIBUTION_WINDOW_SEC

    v = (
        views_stream.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").cast("timestamp").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    p = (
        purchases_stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_SEC} SECONDS")
        )
    )
    gap = F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("view_ts"))
    return p.join(v, cond).select(
        "purchase_id",
        "view_id",
        "user_id",
        (gap / 1_000_000).cast("long").alias("gap_sec"),
    )
