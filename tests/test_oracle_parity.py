"""Driver-style oracle parity: every queries() entry vs its oracle_sql().

This is the same comparison the driver's CORRECTNESS gate performs
(row-count + schema + order-insensitive values) at sf=0.01.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import compare_with_oracle

QIDS = sorted(entrymod.queries().keys())


def test_queries_and_oracles_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    # every oracle key must have a query; queries without oracle are the
    # documented non-SQL-expressible ops (none yet in the batch surface)
    assert set(o).issubset(set(q))


@pytest.mark.parametrize("qid", QIDS)
def test_driver_canonicalizable_schema(spark, qid):
    """The driver's pandas canonicalization sorts result cells; array/map
    cells crash it (round-2 red row `ext_text_winnowing`). Gate: every
    oracle-backed driver query emits scalar columns only. Schema-only —
    builds the plan, never executes it."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if entrymod.oracle_sql().get(qid) is None:
        return  # rows-only ids never reach the driver's value-hash path
    df = entrymod.queries()[qid](spark, "/root/testdata/sf0.001")
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{qid}: non-scalar driver-facing columns {bad}"


@pytest.mark.parametrize("qid", QIDS)
def test_oracle_parity(spark, duck, qid):
    q = entrymod.queries()[qid]
    sql = entrymod.oracle_sql().get(qid)
    if sql is None:
        df = q(spark, "/root/testdata/sf0.01")
        assert df.count() >= 0
        return
    compare_with_oracle(spark, duck, q, sql)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "_id", "nombre", "capacidad", "categoria", "estado", "reservado", "disponible",
    }
    # invariant (ii): availability = capacity − Σ active
    for r in rows:
        assert r.disponible == r.capacidad - r.reservado
