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
