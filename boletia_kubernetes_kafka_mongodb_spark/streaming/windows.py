"""Event-time windowed aggregation with watermarks.

The reference has no event-time semantics at all (SURVEY.md §2.6 — late data
is just replay), but any production CDC/analytics pipeline needs windowed
aggregates with bounded state; this module supplies that capability over the
``events`` stream stand-in.

Batch form (driver query ``agg_time_window``) buckets on the raw
nanosecond-epoch column with long arithmetic — identical math in DuckDB, so
it is exactly oracle-checkable. The streaming form uses the same bucketing
plus ``withWatermark`` so state for closed windows is evicted; equivalence
on a replayed fixture is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables

HOUR_NS = 3_600_000_000_000


def agg_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts/sums per event_type (batch, oracle-checked).

    ``ts`` arrives as nanoseconds-since-epoch (see tables.load nanos note);
    the bucket is integer division — no timezone, no calendar, engine-portable.
    """
    ev = tables.load(spark, sf_dir, "events")
    bucket = (F.col("ts") / F.lit(HOUR_NS)).cast("long")
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
        SELECT CAST(epoch_ns(ts) // {HOUR_NS} AS BIGINT) AS hour_bucket,
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
    entirely (its 'late data' handling is unbounded replay). ``ts`` is
    nanos-since-epoch; convert to timestamp for the watermark clock.
    """
    with_ts = events_stream.withColumn(
        "event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
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
