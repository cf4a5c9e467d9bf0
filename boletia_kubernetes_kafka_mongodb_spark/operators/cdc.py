"""CDC-shaped operators — SURVEY.md §2.1 S2 and §2.2 P7, batch oracle form.

The ``events`` testdata table is the CDC message-log stand-in (FIXTURES.md
§2): ``event_id`` ≙ offset/seq, ``user_id`` ≙ document key, ``event_type`` ≙
topic/state discriminator, ``value`` ≙ quantity-ish payload, ``props`` ≙ the
JSON-encoded document body. Streaming twins live in ``streaming/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import tables


def sink_upsert_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: topic→collection upsert clone — keep-last document per key.

    Reference: the MongoDB sink connector replays ``boletia.eventos`` into
    collection ``inventario`` as insert-or-replace by ``_id``
    (``kafka-mongodb-connect.yaml:22-33``; ``README.md:51,364``) — i.e. for
    each key, the *latest* message wins. Batch form over the message log:
    ``row_number() over (partition by key order by offset desc) = 1``.

    Scale: one shuffle on the key; AQE skew-join/partition coalescing handles
    hot keys. This is exactly the dedup-keep-last any CDC MERGE sink needs.
    """
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("user_id").alias("key"),
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("props").alias("doc"),
        )
    )


def sink_upsert_clone_oracle() -> str:
    return """
        SELECT user_id AS key,
               event_id AS last_event_id,
               event_type AS last_event_type,
               value AS last_value,
               props AS doc
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS _rn
            FROM events
        ) WHERE _rn = 1
    """


def cdc_route_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+F1+F2+P7 end-to-end: the CDC message log, unquoted, parsed, routed.

    Exercises the full consumer ingest path on a batch frame: double-encoded
    value (``schemas.enable=false`` JsonConverter) → F1 unquote → F2 typed
    parse → routing ladder. The DuckDB oracle reconstructs the same log from
    the domain CTEs, proving the JSON round-trip is lossless.
    """
    from ..sources.cdc_stream import build_message_log
    from ..streaming.router import route_messages

    from ..sources.catalog import TOPIC_RESERVAS

    log = build_message_log(spark, sf_dir)
    routed = route_messages(log)
    # parse-per-topic: the consumer only decodes a message with the contract
    # of its topic (eventos docs also carry an ``estado`` field — it must not
    # leak through the reserva-shaped view)
    is_res = F.col("topic") == TOPIC_RESERVAS
    return routed.select(
        "seq",
        "topic",
        "key",
        "route",
        F.when(is_res, F.col("doc_res.evento")).alias("evento"),
        F.when(is_res, F.col("doc_res.estado")).alias("estado"),
        F.when(is_res, F.col("doc_res.email")).alias("email"),
        # DOUBLE, not INT: a nullable int round-trips as float through
        # Arrow/pandas — pin the type so both engines agree exactly
        F.when(is_res, F.col("doc_res.cantidad")).cast("double").alias("cantidad"),
    )


def cdc_route_messages_oracle() -> str:
    from ..oracle import with_domain

    return with_domain(
        """, ev_msgs AS (
            SELECT row_number() OVER (ORDER BY _id) AS seq,
                   'boletia.eventos' AS topic, _id AS key,
                   NULL AS evento, estado AS doc_estado, NULL AS email,
                   NULL AS cantidad, 'ev' AS kind
            FROM eventos
        ),
        res_msgs AS (
            SELECT seq, 'boletia.reservas' AS topic, _id AS key,
                   evento, estado AS doc_estado, email, cantidad, 'res' AS kind
            FROM reservas
        ),
        log AS (
            SELECT * FROM ev_msgs UNION ALL SELECT * FROM res_msgs
        ),
        log_with_dups AS (
            SELECT * FROM log
            UNION ALL
            SELECT * FROM log WHERE seq % 20 = 7
        )
        SELECT seq, topic, key,
               CASE WHEN kind = 'ev' THEN 'ignore'
                    WHEN doc_estado = 'X' THEN 'restitute'
                    ELSE 'skip-state' END AS route,
               CASE WHEN kind = 'res' THEN evento END AS evento,
               CASE WHEN kind = 'res' THEN doc_estado END AS estado,
               CASE WHEN kind = 'res' THEN email END AS email,
               CAST(CASE WHEN kind = 'res' THEN cantidad END AS DOUBLE) AS cantidad
        FROM log_with_dups"""
    )


def fn_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 on real payloads: typed JSON field extraction from ``events.props``.

    The declared-schema parse (``from_json`` with unknown-field dropping)
    over the message-body column, plus a grouped aggregate over the
    extracted value — the standard "parse once, then relational" shape.
    """
    ev = tables.load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k int")["k"].alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("k_total"),
            F.min("k").cast("int").alias("k_min"),
            F.max("k").cast("int").alias("k_max"),
        )
    )


def fn_json_props_extract_oracle() -> str:
    return """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_total,
               CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS k_min,
               CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max
        FROM events
        GROUP BY event_type
    """


def filter_state_machine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: the consumer's topic/state routing ladder.

    Reference (``inventario/main.go:83-98,111-113``): messages route on
    ``Estado`` — reservas-topic: skip unless "X"; inventario-topic: "C" ⇒
    cascade, "A" ⇒ sub-switch on quantity sign {0 ⇒ echo-skip, >0 ⇒
    materialize, <0 ⇒ sentinel-skip}. Re-expressed over the message log as a
    single ``when/otherwise`` ladder (pure narrow map, no shuffle, fully
    codegen'd) — the same transform the streaming router applies per
    micro-batch.

    Mapping onto ``events``: event_type plays the topic/estado role and the
    sign of ``value − 250`` plays the quantity-sign role.
    """
    ev = tables.load(spark, sf_dir, "events")
    qty = (F.col("value") - F.lit(250.0))
    route = (
        F.when(F.col("event_type") == "error", F.lit("skip"))            # ≠"X" skip
        .when(F.col("event_type") == "signup", F.lit("cascade"))         # "C" path
        .when((F.col("event_type") == "purchase") & (qty == 0), F.lit("echo-skip"))
        .when((F.col("event_type") == "purchase") & (qty > 0), F.lit("materialize"))
        .when((F.col("event_type") == "purchase") & (qty < 0), F.lit("sentinel-skip"))
        .otherwise(F.lit("restitute"))                                   # "X" path
    )
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        route.alias("route"),
    )


def filter_state_machine_oracle() -> str:
    return """
        SELECT event_id, user_id, event_type,
               CASE WHEN event_type = 'error' THEN 'skip'
                    WHEN event_type = 'signup' THEN 'cascade'
                    WHEN event_type = 'purchase' AND value - 250.0 = 0 THEN 'echo-skip'
                    WHEN event_type = 'purchase' AND value - 250.0 > 0 THEN 'materialize'
                    WHEN event_type = 'purchase' AND value - 250.0 < 0 THEN 'sentinel-skip'
                    ELSE 'restitute' END AS route
        FROM events
    """


def cdc_broker_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-topic CDC operational metrics — the monitoring panel a deployment
    of the reference's Kafka pipeline (`pcKafka/pcKafka.go`, consumer groups
    in `crearReservas/`) watches: message volume, redelivery count/rate
    (at-least-once delivery means duplicates ARE expected — the consumers'
    idempotence relies on measuring, not preventing, them), distinct keys,
    and the seq frontier.

    One aggregation over the (cached) message log; redeliveries fall out of
    ``count − count_distinct(seq)`` — no self-join, no window. At 100 TB of
    log this is a single shuffle on the topic key (2 groups → map-side
    partials do all the work).
    """
    from ..sources import cdc_stream

    log = cdc_stream.build_message_log(spark, sf_dir)
    n = F.count(F.lit(1)).cast("long")
    uniq = F.count_distinct("seq").cast("long")
    return (
        log.groupBy("topic")
        .agg(
            n.alias("n_messages"),
            uniq.alias("n_unique"),
            (n - uniq).alias("n_redelivered"),
            F.round((n - uniq) / n.cast("double"), 6).alias("redelivery_rate"),
            F.count_distinct("key").cast("long").alias("n_keys"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        )
    )


def cdc_broker_metrics_oracle() -> str:
    from ..oracle import with_domain

    return with_domain(
        """, ev_msgs AS (
            SELECT row_number() OVER (ORDER BY _id) AS seq,
                   'boletia.eventos' AS topic, _id AS key
            FROM eventos
        ),
        res_msgs AS (
            SELECT seq, 'boletia.reservas' AS topic, _id AS key FROM reservas
        ),
        log AS (SELECT * FROM ev_msgs UNION ALL SELECT * FROM res_msgs),
        log_with_dups AS (
            SELECT * FROM log
            UNION ALL
            SELECT * FROM log WHERE seq % 20 = 7
        )
        SELECT topic,
               CAST(COUNT(*) AS BIGINT) AS n_messages,
               CAST(COUNT(DISTINCT seq) AS BIGINT) AS n_unique,
               CAST(COUNT(*) - COUNT(DISTINCT seq) AS BIGINT) AS n_redelivered,
               ROUND((COUNT(*) - COUNT(DISTINCT seq)) / CAST(COUNT(*) AS DOUBLE), 6)
                   AS redelivery_rate,
               CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
               MIN(seq) AS min_seq,
               MAX(seq) AS max_seq
        FROM log_with_dups
        GROUP BY topic"""
    )


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from the change feed — the
    keep-EVERY-version counterpart to ``sink_upsert_clone``'s keep-last: per
    key, each change becomes a versioned row with a validity interval
    [valid_from, valid_to) and an ``is_current`` flag, the shape a lakehouse
    dimension table takes when consumers need as-of reads (the reference's
    sink connector discards history; this is what it would write with
    ``document.id.strategy`` = versioned).

    Plan: ONE window over one key shuffle computes version number (order:
    event time, then id — the arrival-order contract), the successor's
    timestamp (``lead`` → valid_to, NULL while current), and the current
    flag; everything else is a narrow projection. At 100 TB this is the
    same single-exchange shape as the upsert clone, writing all rows
    instead of one per key.
    """
    ev = tables.load(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lead_us = F.lead(ts_us).over(w)
    return ev.select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("version_id"),
        F.row_number().over(w).alias("version"),
        ts_us.alias("valid_from_us"),
        lead_us.alias("valid_to_us"),
        lead_us.isNull().alias("is_current"),
        F.col("event_type").alias("change_type"),
        F.col("value").alias("value"),
    )


def cdc_scd2_history_oracle() -> str:
    return """
        SELECT user_id AS key,
               event_id AS version_id,
               CAST(row_number() OVER w AS INTEGER) AS version,
               epoch_us(ts) AS valid_from_us,
               lead(epoch_us(ts)) OVER w AS valid_to_us,
               lead(epoch_us(ts)) OVER w IS NULL AS is_current,
               event_type AS change_type,
               value AS value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """
