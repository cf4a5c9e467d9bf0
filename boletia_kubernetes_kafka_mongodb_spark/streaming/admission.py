"""Per-key admission state — the exact M1/M2 semantics (SURVEY.md §7 Phase 4).

The reference's core operator is the guarded atomic decrement
(``reservas/main.go:151-165``): a reservation is admitted iff the event's
*current* availability covers it; a rejected reservation consumes nothing.
That last clause is what the plain window/prefix-sum batch oracle
(operators/mutations.py M1) cannot express — it needs a sequential fold.

Two implementations share one fold:

- ``admission_ledger_batch`` — ``groupBy(evento).applyInPandas``: one
  Arrow batch per event, fold in seq order. Deterministic under any input
  partitioning (the groupBy gathers the key), so it is driver-checkable —
  and DuckDB *can* express the fold as a recursive CTE, giving the true
  semantics an exact SQL oracle (``admission_oracle_sql``).
- ``admission_ledger_stream`` — ``applyInPandasWithState`` keyed by evento,
  carrying ``available`` across micro-batches: the production streaming
  form. Equivalence with the batch fold is asserted in tests (same input →
  same ledger), which is exactly SURVEY §7's Phase-4 test strategy.

Scale: state is one long per event key; the shuffle is on the natural key
``evento``; skew on hot events is bounded by AQE + the fact the fold is
O(rows-of-key). The reference serializes *everything* through one Kafka
partition (``README.md:540``) — per-key serialization with cross-key
parallelism is strictly stronger.

Ops semantics per row (in seq order):
- op "reserve" (cantidad n): admit iff available ≥ n → available -= n
- op "cancel"  (cantidad n): available += n (unguarded M2 restitution;
  the canres=−1 sentinel lives in the emitted echo, handled by the router)

Closures below are self-contained (stdlib+pandas only): executor workers
don't share the driver's sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import tables
from ..oracle import with_domain

LEDGER_SCHEMA = StructType(
    [
        StructField("evento", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("_id", StringType(), False),
        StructField("email", StringType(), True),
        StructField("op", StringType(), False),
        StructField("cantidad", IntegerType(), False),
        StructField("admitted", BooleanType(), False),
        StructField("disponible_despues", LongType(), False),
    ]
)

STATE_SCHEMA = StructType([StructField("available", LongType(), False)])


def request_stream_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The admission input: active reservation requests in arrival order,
    carrying the event's capacity (broadcast dim join)."""
    res = tables.reservas(spark, sf_dir).where(F.col("estado") == "A")
    ev = tables.eventos(spark, sf_dir).select("nombre", "capacidad")
    return res.join(F.broadcast(ev), res["evento"] == ev["nombre"], "inner").select(
        "evento", "seq", "_id", "email",
        F.lit("reserve").alias("op"), "cantidad", "capacidad",
    )


# offset placing every cancel op after all reserve ops while staying in long
# range (reservas.seq < 1.6e18; long max 9.2e18)
CANCEL_SEQ_OFFSET = 4_000_000_000_000_000_000


def op_stream_with_cancels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reserve + cancel op stream: the full M1+M2 lifecycle per event.

    Every reservation (estado A or X) issues a reserve op at its ``seq``;
    every user-cancelled one (X) additionally issues a cancel op later
    (seq + offset) — M2's unguarded restitution (``inventario/main.go:116-133``),
    which the reference tolerates because cancels only arrive for real
    reservations.
    """
    res = tables.reservas(spark, sf_dir).where(F.col("estado").isin("A", "X"))
    ev = tables.eventos(spark, sf_dir).select("nombre", "capacidad")
    joined = res.join(F.broadcast(ev), res["evento"] == ev["nombre"], "inner")
    reserves = joined.select(
        "evento", "seq", "_id", "email",
        F.lit("reserve").alias("op"), "cantidad", "capacidad",
    )
    cancels = joined.where(F.col("estado") == "X").select(
        "evento",
        (F.col("seq") + F.lit(CANCEL_SEQ_OFFSET)).alias("seq"),
        "_id", "email",
        F.lit("cancel").alias("op"), "cantidad", "capacidad",
    )
    return reserves.unionAll(cancels)


def admission_ledger_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query ``reserve_admission_exact``: the true sequential-admission
    ledger (rejected requests consume no capacity), per event, batch form.

    Physical plan: one shuffle on the natural key (``repartition(evento)``)
    + per-partition sort, then a single ``mapInPandas`` pass with per-key
    state carried across Arrow batches — instead of ``applyInPandas``'s
    one-python-call-per-group (~1 ms × n_events of pure overhead). Same
    fold, same ledger, ~5× faster at sf0.1.
    """
    return fold_requests_batch(request_stream_batch(spark, sf_dir))


def fold_requests_batch(requests: DataFrame) -> DataFrame:
    """Fold any (evento, seq, _id, email, op, cantidad, capacidad) request
    frame into the admission ledger — one shuffle on the key, one Arrow pass."""
    from ..operators._pandas_udfs import make_admission_map_batches

    arranged = requests.repartition("evento").sortWithinPartitions("evento", "seq")
    return arranged.mapInPandas(make_admission_map_batches(), schema=LEDGER_SCHEMA)


def admission_oracle_sql() -> str:
    """The same fold as a DuckDB recursive CTE (exact oracle for Phase 4)."""
    return with_domain(
        """, ordered AS (
            SELECT r.evento, r.seq, r._id, r.email,
                   'reserve' AS op, r.cantidad, e.capacidad,
                   row_number() OVER (PARTITION BY r.evento ORDER BY r.seq) AS rn
            FROM reservas r
            JOIN eventos e ON r.evento = e.nombre
            WHERE r.estado = 'A'
        ),
        sim AS (
            SELECT evento, seq, _id, email, op, cantidad, rn,
                   (cantidad <= capacidad) AS admitted,
                   CAST(CASE WHEN cantidad <= capacidad
                             THEN capacidad - cantidad ELSE capacidad END AS BIGINT)
                       AS disponible_despues
            FROM ordered WHERE rn = 1
            UNION ALL
            SELECT o.evento, o.seq, o._id, o.email, o.op, o.cantidad, o.rn,
                   (o.cantidad <= s.disponible_despues) AS admitted,
                   CAST(CASE WHEN o.cantidad <= s.disponible_despues
                             THEN s.disponible_despues - o.cantidad
                             ELSE s.disponible_despues END AS BIGINT)
            FROM ordered o
            JOIN sim s ON o.evento = s.evento AND o.rn = s.rn + 1
        )
        SELECT evento, seq, _id, email, op, cantidad, admitted, disponible_despues
        FROM sim"""
    ).replace("WITH ", "WITH RECURSIVE ", 1)


def _make_fold_with_state():
    """Factory whose product is the applyInPandasWithState fold.

    The factory indirection is LOAD-BEARING: a plain module-level function
    cloudpickles BY REFERENCE (module + qualname), which would require
    executor workers to import this package — exactly the failure class
    the SRP-layout UDF hit when the driver runs outside the repo. A
    function whose __qualname__ contains ``<locals>`` fails cloudpickle's
    by-reference lookup and is serialized BY VALUE, keeping the fold
    self-contained (stdlib+pandas only) on the wire while still giving the
    property tests the exact production object via the module attribute
    below."""

    def fold_with_state(key, pdf_iter, state):
        import pandas as pd

        rows = [pdf for pdf in pdf_iter]
        pdf = pd.concat(rows).sort_values("seq") if rows else None
        if pdf is None or pdf.empty:
            return
        if state.exists:
            (available,) = state.get
        else:
            available = int(pdf["capacidad"].iloc[0])
        admitted, after = [], []
        for op, qty in zip(pdf["op"], pdf["cantidad"]):
            qty = int(qty)
            if op == "reserve":
                ok = available >= qty
                if ok:
                    available -= qty
            else:
                ok = True
                available += qty
            admitted.append(ok)
            after.append(available)
        state.update((available,))
        yield pd.DataFrame(
            {
                "evento": pdf["evento"],
                "seq": pdf["seq"],
                "_id": pdf["_id"],
                "email": pdf["email"],
                "op": pdf["op"],
                "cantidad": pdf["cantidad"],
                "admitted": admitted,
                "disponible_despues": after,
            }
        )

    return fold_with_state


# the production fold object — ``<locals>`` qualname ⇒ cloudpickled by value
fold_with_state = _make_fold_with_state()


def admission_ledger_stream(requests: DataFrame) -> DataFrame:
    """Streaming twin: ``applyInPandasWithState`` keyed by evento.

    ``requests`` must carry (evento, seq, _id, email, op, cantidad,
    capacidad). State = available:long, initialized from ``capacidad`` on
    first sight of the key; rows within each micro-batch are folded in seq
    order; ordering *across* batches is the source's responsibility (the
    seq-ordered file replay / 1-partition topic).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return requests.groupBy("evento").applyInPandasWithState(
        fold_with_state,
        outputStructType=LEDGER_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EVENT_TIME_STATE_SCHEMA = StructType(
    [
        StructField("available", LongType(), False),
        StructField("initialized", BooleanType(), False),
        StructField("buf_seq", ArrayType(LongType()), True),
        StructField("buf_id", ArrayType(StringType()), True),
        StructField("buf_email", ArrayType(StringType()), True),
        StructField("buf_op", ArrayType(StringType()), True),
        StructField("buf_qty", ArrayType(IntegerType()), True),
        StructField("buf_ts_us", ArrayType(LongType()), True),
        # highest seq folded so far — the loud-failure guard against order
        # inversion (non-monotone ts-vs-seq input, or data later than the
        # watermark contract allows)
        StructField("max_emitted_seq", LongType(), False),
    ]
)


def _make_event_time_fold():
    """Factory for the out-of-order (event-time) admission fold — the
    ``<locals>``-qualname/by-value pickling rule, same as
    ``_make_fold_with_state``. Self-contained: stdlib + pandas only."""

    def fold_event_time(key, pdf_iter, state):
        import pandas as pd

        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            (available, initialized, bseq, bid, bem, bop, bqty, bts,
             max_emitted) = state.get
            bseq, bid, bem = list(bseq or []), list(bid or []), list(bem or [])
            bop, bqty, bts = list(bop or []), list(bqty or []), list(bts or [])
            available = int(available)
            initialized = bool(initialized)
            max_emitted = int(max_emitted)
        else:
            available, initialized, max_emitted = 0, False, -1
            bseq, bid, bem, bop, bqty, bts = [], [], [], [], [], []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            if not initialized:
                available = int(pdf["capacidad"].iloc[0])
                initialized = True
            bseq.extend(int(v) for v in pdf["seq"])
            bid.extend(str(v) for v in pdf["_id"])
            bem.extend(str(v) for v in pdf["email"])
            bop.extend(str(v) for v in pdf["op"])
            bqty.extend(int(v) for v in pdf["cantidad"])
            # ts_us is computed JVM-side (unix_micros) BEFORE the shuffle:
            # Arrow hands pandas the ts column localized to the session
            # timezone as tz-naive values, while getCurrentWatermarkMs is
            # epoch UTC — converting here would skew the horizon by the
            # session's UTC offset on any non-UTC driver session
            bts.extend(int(v) for v in pdf["ts_us"])
        # emit everything safely behind the horizon, folded in seq order:
        # STRICT ts < watermark — a not-yet-arrived row is guaranteed
        # ts ≥ watermark (bounded-reorder contract), so equality stays
        # buffered one more trigger rather than risking an order inversion
        order = sorted(range(len(bseq)), key=lambda i: bseq[i])
        emit_idx = [i for i in order if bts[i] < wm_us]
        keep_idx = [i for i in order if bts[i] >= wm_us]
        # order-inversion guard (loud failure, never a silent wrong ledger):
        # the safety argument requires event time monotone in seq per key
        # and disorder bounded by the watermark delay — a violated
        # precondition would fold a lower seq AFTER a higher one
        if emit_idx:
            lo = min(bseq[i] for i in emit_idx)
            hi = max(bseq[i] for i in emit_idx)
            if lo <= max_emitted or (keep_idx and hi > min(bseq[i] for i in keep_idx)):
                raise ValueError(
                    "admission event-time fold: seq order inversion — input "
                    "violates the monotone-ts-per-seq / bounded-disorder "
                    "contract (or data arrived later than the watermark "
                    f"delay): emitting seqs [{lo},{hi}] after max_emitted="
                    f"{max_emitted}"
                )
            max_emitted = hi
        out = {
            "evento": [], "seq": [], "_id": [], "email": [],
            "op": [], "cantidad": [], "admitted": [], "disponible_despues": [],
        }
        evento = key[0]
        for i in emit_idx:
            # keep in sync with module-level DRAIN_OP (pickle-by-value
            # closure rule): drain sentinels exist only to advance the
            # watermark — no state effect, never emitted to the ledger
            if bop[i] == "__drain__":
                continue
            qty = bqty[i]
            if bop[i] == "reserve":
                ok = available >= qty
                if ok:
                    available -= qty
            else:
                ok = True
                available += qty
            out["evento"].append(evento)
            out["seq"].append(bseq[i])
            out["_id"].append(bid[i])
            out["email"].append(bem[i])
            out["op"].append(bop[i])
            out["cantidad"].append(qty)
            out["admitted"].append(ok)
            out["disponible_despues"].append(available)
        state.update(
            (
                available,
                initialized,
                [bseq[i] for i in keep_idx],
                [bid[i] for i in keep_idx],
                [bem[i] for i in keep_idx],
                [bop[i] for i in keep_idx],
                [bqty[i] for i in keep_idx],
                [bts[i] for i in keep_idx],
                max_emitted,
            )
        )
        if keep_idx:
            # wake this key when the watermark next advances, even if no
            # new rows arrive for it (the flush path)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        if out["seq"]:
            yield pd.DataFrame(out)

    return fold_event_time


fold_event_time = _make_event_time_fold()


def admission_ledger_stream_event_time(
    requests: DataFrame, delay: str = "10 seconds"
) -> DataFrame:
    """Out-of-order admission: the event-time variant a real MULTI-partition
    Kafka deployment needs (round-3 verdict #6; the reference sidesteps
    reordering by pinning topics to 1 partition, ``clientes.yaml:151-152``
    — the exact scaling limit ``README.md:540`` complains about).

    ``requests`` must carry (evento, seq, _id, email, op, cantidad,
    capacidad, ts) where ``ts`` is the event-time column the watermark runs
    on. CONTRACT: per key, event time must be monotone in ``seq`` (ties
    allowed) and disorder bounded by the watermark delay — violations fail
    LOUDLY via the in-fold order-inversion guard rather than silently
    folding out of order. Rows buffer in per-key state inside the watermark
    horizon; once the watermark passes a row's event time, it is folded and
    emitted in seq order — so any arrival order with bounded disorder (≤
    the watermark delay) yields the IDENTICAL ledger as the in-order batch
    fold (property-tested under random bounded reorder). Keys with a
    non-empty buffer arm an event-time timeout so the flush happens even
    when no new rows arrive for them.

    Event time is converted to epoch micros JVM-side (``unix_micros``)
    BEFORE the shuffle: Arrow localizes timestamp columns to the session
    timezone as tz-naive values, while the state API's watermark is epoch
    UTC — a pandas-side conversion would skew the emit horizon by the UTC
    offset on any non-UTC driver session.

    Spark itself drops input rows at-or-before the current watermark
    before they reach the fold (standard late-data semantics for
    EventTimeTimeout stateful ops). Two consequences: data later than the
    watermark delay is DROPPED, not folded out of order (the in-fold
    inversion guard covers the remaining non-monotone-ts case), and event
    times at exactly epoch 0 are dead on arrival against the INITIAL
    watermark — only synthetic fixtures can produce those.

    State per key is O(rows inside the horizon) — bounded by delay × rate,
    the same bound any stream-stream interval join carries; the shuffle
    stays on the natural key.

    USAGE — end-of-stream drain (round-5 ADVICE): rows within ``delay`` of
    the max seen event time stay buffered FOREVER once input stops — the
    watermark only advances on new data (standard semantics, but
    operationally surprising for ``availableNow``/batch-drain consumers).
    To flush the tail, feed the frames from :func:`admission_drain_frames`
    as TWO trailing triggers (two, because a watermark update takes effect
    one trigger later): their ``__drain__`` op advances the watermark for
    every key and is swallowed by the fold — drain rows never reach the
    ledger, so consumers need no filtering. A continuous production stream
    never needs this — fresh events advance the watermark for every key.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        requests.withWatermark("ts", delay)
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .groupBy("evento")
        .applyInPandasWithState(
            fold_event_time,
            outputStructType=LEDGER_SCHEMA,
            stateStructType=EVENT_TIME_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


DRAIN_OP = "__drain__"  # twin of the literal inside the fold closure


def admission_drain_frames(
    spark: SparkSession,
    capacities: dict,
    beyond_ts,
    n_batches: int = 2,
    seq_base: int = 1 << 60,
):
    """Sentinel request batches that flush buffered admission state at
    stream end (round-5 ADVICE: the drain helper).

    ``capacities`` maps evento → capacidad (the fold initializes state
    from the first row it sees per key, so sentinels carry the real
    capacity); ``beyond_ts`` must be a datetime past ``max(event ts) +
    watermark delay``. Returns ``n_batches`` request-shaped DataFrames —
    feed EACH as its own trigger (default two: a watermark update takes
    effect one trigger later). Drain rows use :data:`DRAIN_OP`, which the
    fold swallows (watermark advances, nothing reaches the ledger), and
    ``seq_base`` = 2⁶⁰ keeps them above any real seq — including the
    Kafka-derived ``partition·2⁴⁰ + offset`` form — so the monotone
    ts-per-seq contract holds by construction.
    """
    import datetime

    schema = (
        "evento string, seq long, _id string, email string, op string, "
        "cantidad int, capacidad int, ts timestamp"
    )
    return [
        spark.createDataFrame(
            [
                (
                    e,
                    seq_base + 10 * k + j,
                    f"__drain__{k}_{j}",
                    "",
                    DRAIN_OP,
                    0,
                    int(cap),
                    beyond_ts + datetime.timedelta(seconds=k),
                )
                for j, (e, cap) in enumerate(sorted(capacities.items()))
            ],
            schema,
        )
        for k in range(n_batches)
    ]


def admission_ledger_stream_tws(requests: DataFrame) -> DataFrame:
    """Same admission fold on the ``transformWithStateInPandas`` API — the
    GA arbitrary-state processor of Spark 4.x (typed state handles, timers,
    TTL, state schema evolution), which is where
    ``applyInPandasWithState`` workloads are headed.

    Semantics are identical to :func:`admission_ledger_stream` (one
    ``ValueState[available:long]`` per evento, rows folded in seq order
    within each micro-batch); the equivalence test asserts ledger equality
    with the batch fold. RUNTIME REQUIREMENT: TWS's python↔JVM state
    protocol needs ``google.protobuf``; environments without it (this
    container) keep using the classic API — the test auto-skips.
    """
    from ..operators._pandas_udfs import make_admission_stateful_processor

    return requests.groupBy("evento").transformWithStateInPandas(
        statefulProcessor=make_admission_stateful_processor(STATE_SCHEMA),
        outputStructType=LEDGER_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
