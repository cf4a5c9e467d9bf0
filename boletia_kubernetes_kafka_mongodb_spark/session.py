"""Tuned SparkSession builder.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the
configuration below is chosen to also be the right *shape* for a large
cluster run (AQE on, skew-join handling, partial-agg-friendly shuffle
sizing, Arrow for the few pandas-UDF operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "boletia-spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Scale notes (100 TB design):
    - AQE handles runtime partition coalescing and skew-join splitting, so a
      fixed ``spark.sql.shuffle.partitions`` here is only the *upper bound*
      for local runs; on a real cluster set it ~2-3x total cores.
    - Broadcast threshold is raised: the dimension side of every domain join
      (``eventos`` ⇐ part) is tiny relative to the fact side (``reservas`` ⇐
      lineitem), so broadcast-hash-join is the right physical plan at any SF.
    - Arrow is enabled for the pandas-UDF extension operators (MinHash,
      embedding ops); core relational operators never leave the JVM.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    # parameterized (optimization round 13): 32 is the LOCAL default — an
    # upper bound AQE coalesces below at test SFs. A cluster run sets
    # SPARK_SHUFFLE_PARTITIONS to ~2-3x total executor cores (guide §2.2:
    # size post-shuffle partitions toward 100 MB-1 GB); the value is
    # deliberately NOT derived from the local core count so the driver's
    # lower-core bench runs measure scaling, not a retuned config.
    shuffle_parts = os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # sized with the heap, not left at the 1g default: materializing a
        # persisted multi-GB frame in LOCAL mode routes task results
        # through the driver's result-size accounting (hit by the x10
        # scale legs' 435M-edge graph at ~61MB/task — a Spark-internal
        # effect, not a user-code collect: the same steps pass a 2MB cap
        # at sf0.1). On a real cluster this is the standard knob an
        # operator sizes to the driver container.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_MAX_RESULT_SIZE", "4g"),
        )
    )
    return builder.getOrCreate()
