#!/usr/bin/env python
"""Capture `.explain("formatted")` for a list of query ids.

Usage: python plans/r14/capture_plans.py <suffix> id1,id2,...
Writes plans/r14/<id>_<suffix>.txt for each id.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from boletia_kubernetes_kafka_mongodb_spark.session import get_spark

    import __spark_entry__ as entrymod

    suffix = sys.argv[1]
    ids = sys.argv[2].split(",")
    spark = get_spark("boletia-plans", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for qid in ids:
        df = queries[qid](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"/root/repo/plans/r14/{qid}_{suffix}.txt"
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
