"""Event-time windowed aggregation: streaming (watermarked) ≡ batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from boletia_kubernetes_kafka_mongodb_spark import tables
from boletia_kubernetes_kafka_mongodb_spark.sources import cdc_stream
from boletia_kubernetes_kafka_mongodb_spark.streaming import windows
from tests.conftest import SF_SMOKE


def test_stream_window_equals_batch(spark, tmp_path):
    ev = tables.load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events")
    cdc_stream.write_ordered_files(ev, path, n_files=4, order_col="event_id")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(path)
    )
    q = (
        windows.agg_time_window_stream(stream)
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.hour_bucket, r.event_type): (r.n_events, r.value_sum)
        for r in spark.sql("select * from win_out").collect()
    }
    expect = {
        (r.hour_bucket, r.event_type): (r.n_events, r.value_sum)
        for r in windows.agg_time_window(spark, SF_SMOKE)
        .drop("n_users")
        .collect()
    }
    assert got == expect
    assert len(got) > 0


def test_sessionize_gap_boundary(spark):
    """Spark session_window semantics: an event arriving exactly at
    last + gap MERGES into the session (the window end is inclusive); only
    a strictly-later event starts a new one. The oracle's island rule
    (delta > gap) encodes the same boundary — this crafted fixture pins it
    on both engines' math."""
    from datetime import datetime, timedelta
    from unittest import mock

    from boletia_kubernetes_kafka_mongodb_spark.operators import aggregates as A

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    gap = timedelta(microseconds=A.GAP_US)
    rows = [
        (1, t0, 1.0),                       # session 1
        (1, t0 + gap - timedelta(seconds=1), 2.0),  # merges (strictly inside)
        (1, t0 + 2 * gap - timedelta(seconds=1), 4.0),  # exactly at window end → merges
        (1, t0 + 4 * gap, 16.0),  # > gap after previous end → NEW session
        (2, t0, 8.0),                       # other key, own session
    ]
    docs = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    with mock.patch.object(A.tables, "load", return_value=docs):
        out = A.agg_sessionize(None, "ignored").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 2          # inclusive boundary merged; only the far event split
    assert len(by_user[2]) == 1
    first = min(by_user[1], key=lambda r: r.session_start_us)
    assert first.n_events == 3           # boundary event joined the first session
    assert first.session_end_us - first.session_start_us == A.GAP_US * 3 - 1_000_000


def test_stream_sessionize_equals_batch(spark, tmp_path):
    """Append-mode session windows: every session the watermark finalized
    must equal the batch sessionization of the same events. A far-future
    sentinel event advances the watermark past all real session ends so the
    whole fixture finalizes."""
    from datetime import datetime, timedelta
    from unittest import mock

    from boletia_kubernetes_kafka_mongodb_spark.operators import aggregates as A

    ev = tables.load(spark, SF_SMOKE, "events").select("event_id", "ts", "user_id", "value")
    path = str(tmp_path / "events")
    cdc_stream.write_ordered_files(ev, path, n_files=3, order_col="event_id")

    # sentinel: one event far past everything, its own file, arriving last
    far = ev.agg(F.max("ts")).first()[0] + timedelta(days=30)
    sentinel = spark.createDataFrame(
        [(10**9, far, -1, 0.0)], "event_id long, ts timestamp, user_id long, value double"
    )
    sentinel.coalesce(1).write.mode("append").parquet(path)  # latest mtime → last trigger

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    q = (
        windows.agg_sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_start_us, r.session_end_us): (r.n_events, r.value_sum)
        for r in spark.sql("select * from sess_out where user_id >= 0").collect()
    }
    with mock.patch.object(A.tables, "load", return_value=tables.load(spark, SF_SMOKE, "events")):
        expect = {
            (r.user_id, r.session_start_us, r.session_end_us): (r.n_events, r.value_sum)
            for r in A.agg_sessionize(None, "ignored").collect()
        }
    assert got == expect
    assert len(got) > 0


def test_asof_join_crafted_semantics(spark):
    """Pin inclusive-<= and latest-prior semantics: equal-timestamp view
    matches; later views don't; users with no prior view yield NULL."""
    from datetime import datetime, timedelta
    from unittest import mock

    from boletia_kubernetes_kafka_mongodb_spark.operators import joins as J

    t0 = datetime(2026, 1, 1)
    m = lambda k: t0 + timedelta(minutes=k)
    rows = [
        (1, 10, m(0), "view", 0.0),
        (1, 11, m(5), "view", 0.0),
        (1, 12, m(5), "purchase", 1.0),   # equal ts → matches view 11 (inclusive)
        (1, 13, m(9), "purchase", 1.0),   # latest prior is still view 11
        (2, 20, m(3), "purchase", 1.0),   # no view at all → NULL
        (3, 30, m(4), "purchase", 1.0),   # view arrives later → NULL
        (3, 31, m(8), "view", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )
    with mock.patch.object(J.tables, "load", return_value=ev):
        got = {r.purchase_id: r.view_id for r in J.ext_asof_join(None, "x").collect()}
    assert got == {12: 11, 13: 11, 20: None, 30: None}


def test_range_join_crafted_boundaries(spark):
    """Pin the bucket-replication correctness: matches exactly at +/- the
    range bound, across bucket edges, and zero-counts isolated purchases."""
    from datetime import datetime, timedelta
    from unittest import mock

    from boletia_kubernetes_kafka_mongodb_spark.operators import joins as J

    t0 = datetime(2026, 1, 1)
    us = lambda k: t0 + timedelta(microseconds=k)
    D = J.RANGE_US
    rows = [
        (1, us(10 * D), "purchase", 0.0),
        (2, us(9 * D), "error", 0.0),        # exactly -D → counts
        (3, us(11 * D), "error", 0.0),       # exactly +D → counts
        (4, us(11 * D + 1), "error", 0.0),   # one microsecond past → no
        (5, us(10 * D + 3), "error", 0.0),   # same bucket → counts
        (6, us(50 * D), "purchase", 0.0),    # isolated → 0
    ]
    ev = spark.createDataFrame(
        [(i, ts, et, v, 0) for i, ts, et, v in rows],
        "event_id long, ts timestamp, event_type string, value double, user_id long",
    )
    with mock.patch.object(J.tables, "load", return_value=ev):
        got = {r.purchase_id: r.n_errors_nearby for r in J.ext_range_join(None, "x").collect()}
    assert got == {1: 3, 6: 0}


def test_asof_join_randomized_vs_python_reference(spark):
    """Seeded random corpus, one Spark pass, checked against a pure-Python
    latest-prior scan — catches ordering/boundary bugs the crafted cases
    might miss (duplicate timestamps across users, view-only users,
    interleaved bursts)."""
    import random
    from datetime import datetime, timedelta
    from unittest import mock

    from boletia_kubernetes_kafka_mongodb_spark.operators import joins as J

    rng = random.Random(20260813)
    t0 = datetime(2026, 1, 1)
    rows = []
    eid = 0
    for user in range(200):
        for _ in range(rng.randint(0, 12)):
            eid += 1
            rows.append(
                (
                    user,
                    eid,
                    t0 + timedelta(seconds=rng.randint(0, 3600)),
                    rng.choice(["view", "purchase", "click"]),
                    0.0,
                )
            )
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )
    with mock.patch.object(J.tables, "load", return_value=ev):
        got = {r.purchase_id: r.view_id for r in J.ext_asof_join(None, "x").collect()}

    # python reference: per user, sort by (ts, side view<purchase, event_id)
    expect = {}
    by_user = {}
    for u, e, ts, et, _ in rows:
        if et in ("view", "purchase"):
            by_user.setdefault(u, []).append((ts, 0 if et == "view" else 1, e, et))
    for u, evs in by_user.items():
        last_view = None
        for ts, _side, e, et in sorted(evs):
            if et == "view":
                last_view = e
            else:
                expect[e] = last_view
    assert got == expect and len(got) > 0


def test_range_join_randomized_vs_python_reference(spark):
    """Seeded random timestamps hammering bucket edges: counts must equal a
    brute-force python scan for every purchase."""
    import random
    from datetime import datetime, timedelta
    from unittest import mock

    from boletia_kubernetes_kafka_mongodb_spark.operators import joins as J

    rng = random.Random(1786661789)
    t0 = datetime(2026, 1, 1)
    D = J.RANGE_US
    rows, eid = [], 0
    # cluster timestamps around bucket multiples so exact-edge cases occur
    for _ in range(300):
        eid += 1
        base = rng.randint(0, 40) * D
        jitter = rng.choice([-D, -1, 0, 1, D, rng.randint(-2 * D, 2 * D)])
        tus = max(0, base + jitter)
        et = rng.choice(["purchase", "error", "error"])
        rows.append((eid, t0 + timedelta(microseconds=tus), et, 0.0, 0, tus))
    ev = spark.createDataFrame(
        [(e, ts, et, v, u) for e, ts, et, v, u, _ in rows],
        "event_id long, ts timestamp, event_type string, value double, user_id long",
    )
    with mock.patch.object(J.tables, "load", return_value=ev):
        got = {r.purchase_id: r.n_errors_nearby for r in J.ext_range_join(None, "x").collect()}

    errors = [tus for _, _, et, _, _, tus in rows if et == "error"]
    expect = {
        e: sum(1 for x in errors if abs(x - tus) <= D)
        for e, _, et, _, _, tus in rows
        if et == "purchase"
    }
    assert got == expect and len(got) > 0


def test_funnel_order_sensitivity(spark, tmp_path):
    """The funnel is ORDER-sensitive: click-before-view must not convert."""
    from datetime import datetime

    from boletia_kubernetes_kafka_mongodb_spark.operators.aggregates import (
        agg_funnel_stages,
    )

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: proper view -> click -> purchase
        (1, t(1), 1, "view", 0.0, "{}"),
        (2, t(2), 1, "click", 0.0, "{}"),
        (3, t(3), 1, "purchase", 0.0, "{}"),
        # user 2: click BEFORE view; purchase after — must stall at stage 1
        (4, t(1), 2, "click", 0.0, "{}"),
        (5, t(2), 2, "view", 0.0, "{}"),
        (6, t(3), 2, "purchase", 0.0, "{}"),
        # user 3: view only
        (7, t(1), 3, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = {r.stage: r for r in agg_funnel_stages(spark, str(tmp_path)).collect()}
    assert out[1].n_users == 3 and out[1].conversion == 1.0
    assert out[2].n_users == 1
    assert out[3].n_users == 1
    assert out[3].event_type == "purchase"


def test_retention_cohort_rates(spark, tmp_path):
    """Week-0 retention is 1.0; a cohort loses half its users by week 2."""
    from datetime import datetime

    from boletia_kubernetes_kafka_mongodb_spark.operators.aggregates import (
        agg_retention_cohorts,
    )

    # 2024-01-01 is a Monday: clean week boundaries
    rows = [
        (1, datetime(2024, 1, 1, 10), 1, "view", 0.0, "{}"),
        (2, datetime(2024, 1, 16, 10), 1, "view", 0.0, "{}"),  # week 2
        (3, datetime(2024, 1, 2, 10), 2, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = {
        (str(r.cohort_week), r.week_offset): r
        for r in agg_retention_cohorts(spark, str(tmp_path)).collect()
    }
    assert out[("2024-01-01", 0)].n_active == 2
    assert out[("2024-01-01", 0)].retention == 1.0
    assert out[("2024-01-01", 2)].n_active == 1
    assert out[("2024-01-01", 2)].retention == 0.5


def test_histogram_covers_all_events_contiguously(spark):
    """Bucket counts sum to the table size; edges tile [min, max] with no
    gaps; every count is positive (empty buckets simply don't emit)."""
    from boletia_kubernetes_kafka_mongodb_spark import tables
    from boletia_kubernetes_kafka_mongodb_spark.operators.aggregates import (
        HIST_N_BUCKETS,
        agg_value_histogram,
    )
    from tests.conftest import SF_CORRECT

    rows = sorted(
        agg_value_histogram(spark, SF_CORRECT).collect(), key=lambda r: r.bucket
    )
    total = tables.load(spark, SF_CORRECT, "events").count()
    assert sum(r.n for r in rows) == total
    assert all(1 <= r.bucket <= HIST_N_BUCKETS for r in rows)
    for a, b in zip(rows, rows[1:]):
        if b.bucket == a.bucket + 1:
            assert abs(b.bucket_lo - a.bucket_hi) < 1e-9
        assert a.bucket_lo < a.bucket_hi


def test_anomaly_alert_stream_matches_batch_flags(spark, tmp_path):
    """Replayed stream alerts == the batch operator's is_anomaly rows when
    both use the same offline baseline (lambda shape: batch stats feed the
    live detector)."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import aggregates

    ev = tables.load(spark, SF_SMOKE, "events")
    # far-future sentinel (type unknown to the baseline, dropped by the
    # join) advances the watermark past every data day so the LAST day
    # finalizes too — without it an append-mode alert on the fixture's
    # final day would be withheld and the parity assert would be
    # fixture-luck-dependent
    sentinel = spark.createDataFrame(
        [(10**9, __import__("datetime").datetime(2035, 1, 1), 0, "__sentinel__", 0.0, "{}")],
        ev.schema,
    )
    path = str(tmp_path / "events")
    cdc_stream.write_ordered_files(
        ev.unionByName(sentinel), path, n_files=4, order_col="event_id"
    )

    baseline = windows.anomaly_baseline(spark, SF_SMOKE)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(path)
    )
    q = (
        windows.anomaly_alert_stream(stream, baseline)
        .writeStream.format("memory")
        .queryName("anom_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_anom"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.event_type, r.day): (r.n, r.zscore)
        for r in spark.sql("select * from anom_out").collect()
    }
    expect = {
        (r.event_type, r.day): (r.n, r.zscore)
        for r in aggregates.agg_anomaly_zscore(spark, SF_SMOKE).collect()
        if r.is_anomaly
    }
    assert got == expect


def test_attribution_stream_stream_join_equals_batch(spark, tmp_path):
    """Replayed stream-stream interval join == the batch attribution join
    (both watermarked sides, interval-bounded state)."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import joins

    ev = tables.load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events")
    cdc_stream.write_ordered_files(ev, path, n_files=4, order_col="event_id")

    def stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(path)
        )

    q = (
        windows.attribution_stream(stream(), stream())
        .writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.purchase_id, r.view_id): r.gap_sec
        for r in spark.sql("select * from attr_out").collect()
    }
    expect = {
        (r.purchase_id, r.view_id): r.gap_sec
        for r in joins.join_attribution(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert len(got) > 0


def test_ewma_matches_pandas_convention(spark):
    """The closed-form windowed EWMA equals pandas' adjust=True ewm mean
    per series (the debiased convention every stats library defaults to)."""
    import pandas as pd

    from boletia_kubernetes_kafka_mongodb_spark.operators import aggregates as A

    rows = A.agg_ewma_daily(spark, SF_SMOKE).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type
    for et, series in by_type.items():
        series.sort(key=lambda r: r.day)
        want = (
            pd.Series([r.n for r in series])
            .ewm(alpha=A.EWMA_ALPHA, adjust=True)
            .mean()
        )
        for r, w in zip(series, want):
            assert abs(r.ewma - round(w, 6)) <= 1e-6, (et, r.day)


def test_ewma_long_series_chunked_continuation(spark, tmp_path):
    """A 1300-day daily series — far past the old EWMA_MAX_T=600 in-plan
    raise, and crossing TWO chunk boundaries at EWMA_CHUNK=600 — must
    compute the correct debiased EWMA via the chunked prefix sum with a
    carried seed (round-3 verdict #3: the single-window (1−α)^{−t} scaling
    overflows double near t≈2000; the chunked form never exceeds exponent
    EWMA_CHUNK). Reference: pandas ewm(adjust=True), the same convention
    the short-series test pins."""
    import datetime

    import pandas as pd

    from boletia_kubernetes_kafka_mongodb_spark.operators import aggregates as A

    n_days = 1300
    assert n_days > 2 * A.EWMA_CHUNK  # exercises carry AND carry truncation
    base = datetime.datetime(2020, 1, 1, 12, 0, 0)
    rows = [
        ("page_view", base + datetime.timedelta(days=d))
        for d in range(n_days)
        for _ in range(d % 7 + 1)  # deterministic varying daily counts
    ]
    sf_dir = str(tmp_path / "sf_long")
    spark.createDataFrame(rows, "event_type string, ts timestamp").coalesce(
        1
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = sorted(A.agg_ewma_daily(spark, sf_dir).collect(), key=lambda r: r.day)
    assert len(got) == n_days
    want = (
        pd.Series([d % 7 + 1 for d in range(n_days)])
        .ewm(alpha=A.EWMA_ALPHA, adjust=True)
        .mean()
    )
    for r, w in zip(got, want):
        assert r.ewma is not None and r.ewma == r.ewma, r.day  # no NULL/NaN
        assert abs(r.ewma - w) <= 1e-6, (r.day, r.ewma, w)


def test_latency_bands_approx_tracks_exact(spark):
    """The bounded-state approx_percentile variant (the at-scale form the
    agg_latency_bands docstring names) must track the exact bands closely.
    approx_percentile returns ELEMENTS (no interpolation), so tiny groups
    legitimately diverge by one inter-element gap — the accuracy claim is
    about large groups, so craft one 5000-row group (the fixture's hourly
    groups are all < 30 rows at test SFs) plus small ones."""
    import random
    from datetime import datetime, timedelta
    from unittest import mock

    from boletia_kubernetes_kafka_mongodb_spark.operators import aggregates as A

    rng = random.Random(11)
    t0 = datetime(2026, 1, 1, 12, 30, 0)
    rows = [(i, t0, 0, "load", rng.gauss(100.0, 25.0), "{}") for i in range(5000)]
    rows += [
        (10_000 + i, t0 + timedelta(hours=2), 0, "spike", float(i), "{}")
        for i in range(4)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with mock.patch.object(A.tables, "load", return_value=ev):
        exact = {
            (r.hour_bucket, r.event_type): r
            for r in A.agg_latency_bands(None, "x").collect()
        }
        approx = {
            (r.hour_bucket, r.event_type): r
            for r in A.agg_latency_bands_approx(None, "x").collect()
        }
    assert set(exact) == set(approx) and len(exact) == 2
    large = 0
    for k, e in exact.items():
        a = approx[k]
        assert a.n == e.n
        assert a.p50 <= a.p95 <= a.p99  # ordering sanity for every group
        if e.n >= 30:
            large += 1
            spread = max(e.p99 - e.p50, 1e-9)
            for band in ("p50", "p95", "p99"):
                assert abs(getattr(a, band) - getattr(e, band)) <= 0.1 * spread + 1e-6, (
                    k, band, getattr(a, band), getattr(e, band))
    assert large == 1  # the tight branch actually exercised
