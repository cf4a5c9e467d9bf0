#!/usr/bin/env python
"""Benchmark harness — the driver runs this per-round and records BENCH_r{N}.json.

Runs every driver-contract query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {qid:
sec}, "sf": ...}``.

Each query is consumed with a ``noop``-format write: the full plan executes
distributed (scan → transform → exchange) but nothing is serialized to the
driver, so timings measure the engine, not ``collect()`` transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from boletia_kubernetes_kafka_mongodb_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("boletia-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        keep = set(only.split(","))
        queries = {k: v for k, v in queries.items() if k in keep}
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers once so q1 doesn't pay session startup
    spark.read.parquet(f"{SF_DIR}/part.parquet").count()

    # multiple passes, keep per-query minimum: the host is co-tenant-noisy
    # and a single pass conflates engine time with neighbor interference
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    raw: dict[str, list[float]] = {qid: [] for qid in queries}
    for _ in range(passes):
        for qid in sorted(queries):
            t0 = time.perf_counter()
            df = queries[qid](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            raw[qid].append(time.perf_counter() - t0)
    total = 0.0
    for qid, times in raw.items():
        timings[qid] = round(min(times), 3)
        total += min(times)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(CPUS),
                "n_queries": len(timings),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
