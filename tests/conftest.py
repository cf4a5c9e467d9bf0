from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from boletia_kubernetes_kafka_mongodb_spark.session import get_spark

    s = get_spark("boletia-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_CORRECT}/{name}.parquet'"
        )
    yield con
    con.close()


def compare_with_oracle(spark, duck, query_fn, sql, sf_dir=SF_CORRECT):
    """Mimic the driver: row-count + column names + order-insensitive values.

    DuckDB results come via fetchall (native python values) — fetchdf would
    coerce BIGINT columns to float64 and mask/introduce type mismatches.

    hostile.py's ``_norm`` mirrors this normalization (including the
    asymmetric duck-side-only NaN→NULL rule) — keep the two in sync.
    """
    sdf = query_fn(spark, sf_dir)
    spark_rows = sdf.collect()
    rel = duck.execute(sql)
    d_colnames = [d[0] for d in rel.description]
    duck_rows = [dict(zip(d_colnames, t)) for t in rel.fetchall()]
    assert len(spark_rows) == len(duck_rows), (
        f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_cols = sorted(sdf.columns)
    d_cols = sorted(d_colnames)
    assert s_cols == d_cols, f"columns: spark={s_cols} duck={d_cols}"

    import decimal

    def norm(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return bool(v)
        # deliberately NOT coercing Decimal to float: a DECIMAL-typed oracle
        # column must be caught as a mismatch (the driver's hash would differ)
        if isinstance(v, decimal.Decimal):
            return ("decimal", str(v))
        if isinstance(v, float):
            return round(v, 6)
        if isinstance(v, int):
            return int(v)
        return str(v)

    import math

    def norm_duck(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        return norm(v)

    def render(vals):  # None-safe total order, matching driver-style hashing
        return tuple("\x00NULL" if v is None else f"{type(v).__name__}:{v}" for v in vals)

    s_set = sorted(
        render(norm(r[c]) for c in s_cols) for r in spark_rows
    )
    d_set = sorted(
        render(norm_duck(row[c]) for c in d_cols) for row in duck_rows
    )
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
