"""Stream ≡ batch parity for the corpus-pipeline streaming twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from boletia_kubernetes_kafka_mongodb_spark import tables
from boletia_kubernetes_kafka_mongodb_spark.operators import dedup
from boletia_kubernetes_kafka_mongodb_spark.sources import cdc_stream
from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus
from tests.conftest import SF_SMOKE


def _doc_stream(spark, tmp_path, n_files=4):
    """documents written as doc_id-ordered files → micro-batched stream."""
    docs = tables.load(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs")
    cdc_stream.write_ordered_files(docs, path, n_files=n_files, order_col="doc_id")
    return (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_vocab_counts_stream_equals_batch(spark, tmp_path):
    stream = _doc_stream(spark, tmp_path)
    q = (
        corpus.vocab_counts_stream(stream)
        .writeStream.format("memory")
        .queryName("vocab_counts_tw")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = sorted(
        map(tuple, spark.table("vocab_counts_tw").collect())
    )
    docs = tables.load(spark, SF_SMOKE, "documents")
    from boletia_kubernetes_kafka_mongodb_spark.operators.text import tokens_col

    want = sorted(
        map(
            tuple,
            docs.select("lang", F.explode(tokens_col("text")).alias("token"))
            .groupBy("lang", "token")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_dedup_exact_stream_survivors_equal_batch(spark, tmp_path):
    """Keep-first streaming dedup over doc_id-ordered arrival == the batch
    min-doc_id survivor set, and the stream's output cardinality is the
    number of distinct fingerprints."""
    stream = _doc_stream(spark, tmp_path)
    q = (
        corpus.dedup_exact_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_exact_tw")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    out = spark.table("dedup_exact_tw")
    got = {(r.fingerprint, r.doc_id) for r in out.collect()}
    want = {
        (r.fingerprint, r.survivor_doc_id)
        for r in dedup.ext_dedup_exact(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0
