"""Kafka source/sink configuration builders (SURVEY.md §2.1 S1/S3-S5).

Production wiring for the reference's topology: consumer groups become
checkpoint locations, the manual fetch-then-commit loop becomes micro-batch
+ checkpoint commit (``pcKafka/pcKafka.go:60-86``; commit-on-success
``inventario/main.go:56-66``), and `auto.offset.reset=latest` maps to
``startingOffsets``.

This container has no Kafka broker and no spark-sql-kafka package, so these
builders return *configured readers/writers* without starting them; tests
exercise the same pipeline logic through the file-backed emulation in
``cdc_stream.py`` (same DataFrame shape: topic/key/value/seq).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import TOPIC_EVENTOS, TOPIC_INVENTARIO, TOPIC_RESERVAS

DEFAULT_BOOTSTRAP = "kafka:9092"

# reference consumer groups (inventario/main.go:52, notificaciones/main.go:39)
GROUP_SUBSCRIPTIONS = {
    "inventario": [TOPIC_INVENTARIO, TOPIC_RESERVAS],
    "notificaciones": [TOPIC_RESERVAS],
}


def kafka_source(
    spark: SparkSession,
    group: str,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    starting_offsets: str = "latest",
):
    """S5: multi-topic consumer-group subscribe as a structured stream reader.

    The reference's ``RecibeMensajes`` (``pcKafka/pcKafka.go:60-86``)
    fetch-without-autocommit semantics ≙ Spark checkpointed offsets: an
    offset is only committed once the micro-batch that contains it durably
    completes — the same at-least-once contract.
    """
    topics = ",".join(GROUP_SUBSCRIPTIONS[group])
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )


def kafka_sink(df: DataFrame, topic: str, bootstrap: str = DEFAULT_BOOTSTRAP):
    """S3: producer — expects ``key``/``value`` string columns (the
    ``EnviaMensaje`` analogue, ``pcKafka/pcKafka.go:12-26``); partition
    balancing is the Kafka default partitioner."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
    )
