"""End-to-end saga: lifecycle CDC log → inventario consumer → invariants.

Asserts the reference's implicit invariants (SURVEY.md §5.1) over the
consumer-maintained reservas table:
(i/ii) final states and availability agree with the declarative expectation,
(iii) user cancels restore availability (X rows don't count as reserved),
(vi) full-stream replay from a fresh checkpoint converges to the same table,
(vii) echo messages (clone / sentinel / state-skip) change nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from boletia_kubernetes_kafka_mongodb_spark import tables
from boletia_kubernetes_kafka_mongodb_spark.sources import cdc_stream
from boletia_kubernetes_kafka_mongodb_spark.streaming.consumer import InventarioConsumer
from tests.conftest import SF_SMOKE


def _expected_final(spark):
    """Declarative expectation: estado = X if user-cancelled, else C if the
    event is organizer-cancelled, else A (cascade preserves X history)."""
    res = tables.reservas(spark, SF_SMOKE)
    ev = tables.eventos(spark, SF_SMOKE).select(
        F.col("nombre"), F.col("estado").alias("ev_estado")
    )
    return res.join(F.broadcast(ev), res["evento"] == ev["nombre"], "inner").select(
        "_id",
        "evento",
        F.when(res["estado"] == "X", F.lit("X"))
        .when(F.col("ev_estado") == "C", F.lit("C"))
        .otherwise(F.lit("A"))
        .alias("estado"),
        "email",
        "cantidad",
    )


def _table_state(consumer):
    return sorted(
        (r._id, r.evento, r.estado, r.email, r.cantidad)
        for r in consumer.table.read().collect()
    )


def test_inventario_consumer_saga(spark, tmp_path):
    log = cdc_stream.build_lifecycle_message_log(spark, SF_SMOKE)
    path = str(tmp_path / "msgs")
    cdc_stream.write_ordered_files(log, path, n_files=6)

    consumer = InventarioConsumer(spark, str(tmp_path / "run1"))
    msgs = cdc_stream.read_message_stream(spark, path, max_files_per_trigger=2)
    consumer.run_available_now(msgs, str(tmp_path / "ckpt1"))

    got = _table_state(consumer)
    assert len(got) > 0

    # (i/ii): the maintained table equals the declarative expectation
    expected = sorted(
        (r._id, r.evento, r.estado, r.email, r.cantidad)
        for r in _expected_final(spark).collect()
    )
    assert got == expected

    # (iii): availability over the maintained table counts only final-A rows
    ev = tables.eventos(spark, SF_SMOKE)
    avail = {r.nombre: r.disponible for r in consumer.availability(ev).collect()}
    exp_reserved = {
        r.evento: r.s
        for r in _expected_final(spark)
        .where(F.col("estado") == "A")
        .groupBy("evento")
        .agg(F.sum("cantidad").alias("s"))
        .collect()
    }
    for r in ev.collect():
        assert avail[r.nombre] == r.capacidad - exp_reserved.get(r.nombre, 0)

    # (vi): replay the whole stream into a fresh consumer → identical table
    consumer2 = InventarioConsumer(spark, str(tmp_path / "run2"))
    msgs2 = cdc_stream.read_message_stream(spark, path, max_files_per_trigger=3)
    consumer2.run_available_now(msgs2, str(tmp_path / "ckpt2"))
    assert _table_state(consumer2) == got

    # (vii): feeding ONLY echo messages to a populated consumer is a no-op
    echo_only = (
        spark.read.schema(cdc_stream.MESSAGE_SCHEMA)
        .parquet(path)
        .where(F.col("topic") == "boletia.inventario")
    )
    # clone echoes + sentinel echoes are inventario-topic messages with
    # canres null or -1; re-applying the full inventario topic also re-plays
    # materializes, which must all dedup away
    consumer2.apply_batch(echo_only)
    assert _table_state(consumer2) == got
