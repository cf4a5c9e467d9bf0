"""Adversarial hot-key skew fixtures for the tiled/blocked kernels
(round-3 verdict #4).

The admission stream already has a hot-key property test; these extend the
discipline to the three remaining skew-sensitive operators:

- ``ext_entity_resolution``'s blocking bands (one (domain, len) band
  carrying ~100% of identities),
- ``join_attribution``'s per-user fan-out (one user at ~50% of events),
- ``ext_cooccurrence``'s baskets (one user at ~50% of raw events).

Each test asserts BOTH the answer (vs a python reference or the DuckDB
oracle replayed on the crafted fixture) and the skew-spread invariant —
the per-tile/per-task work bound. The bound is asserted on the operator's
own partitioning keys (tile chunk sizes, per-purchase match counts,
post-distinct basket sizes) rather than through a JVM listener: on
local[n] the task→row mapping IS the key distribution, and the SQL-level
assertion is deterministic where listener counters are scheduling-noisy.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from boletia_kubernetes_kafka_mongodb_spark.operators import dedup


def _lev(a: str, b: str) -> int:
    """Classic levenshtein (python reference for the ER verify)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_entity_resolution_hot_band_skew(spark):
    """ONE (domain, len) band carries every identity — the worst case for
    band-keyed blocking. The chunk-pair tiling must (a) still produce the
    exact pair set (python levenshtein reference over all pairs) and
    (b) spread the hot band's |block|² work over ~T(T+1)/2 tiles with no
    chunk holding more than a small multiple of N/T identities."""
    # 240 identities, all same length (7), same domain, built from 40 base
    # strings x 6 single-char substitutions => plenty of distance-1 pairs
    import itertools

    bases = [f"u{i:03d}ab" for i in range(40)]  # len 6 local + 1 sub char
    locals_ = []
    for base in bases:
        for c in "xyzpqr":
            locals_.append(base + c)
    assert len(set(locals_)) == 240 and len({len(x) for x in locals_}) == 1
    rows = [(loc + "@hot.example", 1) for loc in locals_]
    ids = spark.createDataFrame(rows, "email string, n_reservas long")

    got = {
        (r.email_a, r.email_b, r.distance, r.n_reservas_merged)
        for r in dedup.er_resolve(ids).collect()
    }

    want = set()
    emails = sorted(r[0] for r in rows)
    for ea, eb in itertools.combinations(emails, 2):
        d = _lev(ea.split("@")[0], eb.split("@")[0])
        if d <= dedup.ER_MAX_EDIT:
            want.add((ea, eb, d, 2))
    assert want, "fixture must contain near-duplicate pairs"
    assert got == want

    # skew-spread invariant: the hot band's identities hash over ER_TILES
    # chunks with no chunk above 2x the even share, so the tiled join's
    # biggest task sees at most (2N/T)^2 rows instead of N^2
    T = dedup.ER_TILES
    chunk_sizes = [
        r.n
        for r in ids.select(
            F.pmod(F.xxhash64("email"), F.lit(T)).alias("chunk")
        )
        .groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    n = len(rows)
    assert len(chunk_sizes) == T, "every tile chunk must be populated"
    assert max(chunk_sizes) <= 2 * n / T, (
        f"hot-band chunk skew: max {max(chunk_sizes)} vs even {n / T}"
    )


@pytest.fixture()
def skew_events_dir(spark, tmp_path):
    """Synthetic events fixture: user 0 carries ~50% of all rows (views,
    purchases, and every other type), the rest spread over 40 users.
    Timestamps are chosen so the hot user's views cluster in bounded 2h
    bursts — the shape join_attribution's fan-out contract is about."""
    import datetime

    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    # hot user: 30 bursts; each burst = 8 views then 2 purchases within 2h,
    # bursts 12h apart (so cross-burst pairs are outside the window)
    for burst in range(30):
        t0 = base + datetime.timedelta(hours=12 * burst)
        for v in range(8):
            rows.append((eid, t0 + datetime.timedelta(minutes=5 * v), 0, "view", 1.0, "{}"))
            eid += 1
        for p in range(2):
            rows.append((eid, t0 + datetime.timedelta(minutes=60 + p), 0, "purchase", 9.9, "{}"))
            eid += 1
    # cold users: 40 users x 7 events, one view+purchase pair each in-window
    for u in range(1, 41):
        t0 = base + datetime.timedelta(hours=u)
        for k, et in enumerate(["view", "purchase", "click", "signup", "error", "view", "click"]):
            rows.append((eid, t0 + datetime.timedelta(minutes=10 * k), u, et, 0.5, "{}"))
            eid += 1
    hot = sum(1 for r in rows if r[2] == 0)
    assert 0.4 < hot / len(rows) < 0.6  # ~50% mass on the hot key
    d = str(tmp_path / "sf_skew")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(2).write.parquet(f"{d}/events.parquet")
    return d


def test_attribution_hot_user_skew(spark, skew_events_dir):
    """join_attribution under a 50%-mass user: the answer must equal the
    DuckDB oracle replayed on the crafted fixture, and the per-purchase
    match count must stay at the views-per-2h bound (8 here) — fan-out
    bounded by the interval, NOT by the hot user's total history (240
    views)."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import joins

    got = joins.join_attribution(spark, skew_events_dir).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{skew_events_dir}/events.parquet/*.parquet'"
    )
    want = {
        (r[0], r[1], r[2], r[3])
        for r in con.execute(joins.join_attribution_oracle()).fetchall()
    }
    assert {(r.purchase_id, r.view_id, r.user_id, r.gap_sec) for r in got} == want
    assert len(got) > 0

    per_purchase: dict = {}
    for r in got:
        per_purchase[r.purchase_id] = per_purchase.get(r.purchase_id, 0) + 1
    hot_total_views = 8 * 30
    assert max(per_purchase.values()) == 8, "burst views-per-2h bound"
    assert max(per_purchase.values()) < hot_total_views, (
        "fan-out must not scale with the hot user's full history"
    )


def test_cooccurrence_hot_basket_skew(spark, skew_events_dir):
    """ext_cooccurrence under the same 50%-mass user: the distinct pass
    must collapse the hot user's 300 raw events to ≤ |types| basket rows
    (the skew guard), and lift/PMI must equal the DuckDB oracle replayed
    on the crafted fixture."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import aggregates

    got = {
        (r.type_a, r.type_b): (r.n_both, r.lift, r.pmi)
        for r in aggregates.ext_cooccurrence(spark, skew_events_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{skew_events_dir}/events.parquet/*.parquet'"
    )
    want = {
        (t[0], t[1]): (t[2], round(t[3], 6), round(t[4], 6))
        for t in con.execute(aggregates.ext_cooccurrence_oracle()).fetchall()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) <= 1e-6, k
        assert abs(got[k][2] - want[k][2]) <= 1e-6, k

    # skew guard: post-distinct basket size for the hot user is the type
    # vocabulary (2 types), not the 300 raw rows — the join input the
    # self-join actually sees
    from boletia_kubernetes_kafka_mongodb_spark import tables

    baskets = (
        tables.load(spark, skew_events_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sizes = {r.user_id: r.n for r in baskets.collect()}
    assert sizes[0] == 2  # hot user: view + purchase only
    assert max(sizes.values()) <= 5  # bounded by |types|, never raw volume
