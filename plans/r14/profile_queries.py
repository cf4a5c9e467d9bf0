#!/usr/bin/env python
"""Per-query profiler (round-13 methodology): for each declared query,
measure warm plan-build seconds (calling the query fn), warm noop-exec
seconds, and the number of Spark jobs launched (StatusTracker job-id
delta). Run on an idle box; one warm-up pass first.

Usage: python plans/r14/profile_queries.py [only_id,only_id,...]
Writes /tmp/profile_r14b.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from boletia_kubernetes_kafka_mongodb_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("boletia-profile", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker

    queries = entrymod.queries()
    if len(sys.argv) > 1:
        keep = set(sys.argv[1].split(","))
        queries = {k: v for k, v in queries.items() if k in keep}

    spark.read.parquet(f"{SF_DIR}/part.parquet").count()

    out: dict[str, dict] = {}
    # pass 0 warms caches; pass 1 records
    for rec in (False, True):
        for qid in sorted(queries):
            spark.sparkContext.setJobDescription(f"profile:{qid}")
            jobs0 = tracker().getJobIdsForGroup(None)
            t0 = time.perf_counter()
            df = queries[qid](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if rec:
                jobs1 = tracker().getJobIdsForGroup(None)
                out[qid] = {
                    "build": round(t1 - t0, 3),
                    "exec": round(t2 - t1, 3),
                    "total": round(t2 - t0, 3),
                    "jobs": len(set(jobs1) - set(jobs0)),
                }
        spark.sparkContext.setJobDescription(None)
    tot = sum(v["total"] for v in out.values())
    out["_total"] = {"total": round(tot, 2), "n": len(out)}
    with open("/tmp/profile_r14b.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    top = sorted(
        (v["total"], k) for k, v in out.items() if not k.startswith("_")
    )[-40:]
    for t, k in reversed(top):
        v = out[k]
        print(f"{t:7.3f}  build {v['build']:6.3f}  exec {v['exec']:6.3f}  jobs {v['jobs']:3d}  {k}")
    print(f"TOTAL {tot:.2f} over {len(out)-1} ids")
    spark.stop()


if __name__ == "__main__":
    main()
