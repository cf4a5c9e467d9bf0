"""End-to-end notifications consumer: stream → render → idempotent sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from boletia_kubernetes_kafka_mongodb_spark.operators.notifications import notify_render
from boletia_kubernetes_kafka_mongodb_spark.sources import cdc_stream
from boletia_kubernetes_kafka_mongodb_spark.streaming import notify
from tests.conftest import SF_SMOKE


def test_notify_stream_replay_idempotent_and_matches_batch(spark, tmp_path):
    log = cdc_stream.build_message_log(spark, SF_SMOKE)  # includes ~5% dups
    path = str(tmp_path / "msgs")
    cdc_stream.write_stream_fixture(log, path, n_files=4)

    table = notify.notifications_sink(spark, str(tmp_path / "notifications"))

    def run(ckpt):
        msgs = cdc_stream.read_message_stream(spark, path, max_files_per_trigger=2)
        rendered = notify.render_notifications_stream(msgs)
        q = (
            rendered.writeStream.foreachBatch(table.foreach_batch_insert_if_absent())
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run("ckpt1")
    state1 = sorted(
        (r.notif_key, r.subject, r.body) for r in table.read().collect()
    )
    # replay the WHOLE stream from scratch (fresh checkpoint = new consumer
    # group reading from 0) → table state unchanged (invariant vi)
    run("ckpt2")
    state2 = sorted(
        (r.notif_key, r.subject, r.body) for r in table.read().collect()
    )
    assert state1 == state2

    # the streaming render agrees with the batch S8 operator on body text
    batch = {
        (r.reserva_id, r.subject): r.body
        for r in notify_render(spark, SF_SMOKE).collect()
    }
    stream_rows = table.read().collect()
    assert len(stream_rows) > 0
    for r in stream_rows:
        assert batch[(r.reserva_id, r.subject)] == r.body

    # dedup key uniqueness: one notification per (reserva, estado)
    n = table.read().count()
    assert table.read().select("notif_key").distinct().count() == n
