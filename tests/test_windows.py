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
