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


def test_driver_record_window_rule():
    """The external driver records only the FIRST 50 queries() entries per
    round. Standing rule (round-2 verdict #2): every id past position 50
    must already have a CORRECTNESS row from a previous round — new or
    changed ids MUST be placed inside the window, bumping an
    already-recorded id out. This test makes the rule unbreakable."""
    import glob
    import json

    from pathlib import Path

    repo_root = Path(__file__).resolve().parents[1]
    recorded: set = set()
    for path in glob.glob(str(repo_root / "CORRECTNESS_r*.json")):
        recorded |= set(json.load(open(path)))
    if not recorded:
        return  # round 1: no prior artifacts to check against
    tail = list(entrymod.queries())[50:]
    missing = [q for q in tail if q not in recorded]
    assert not missing, (
        f"ids beyond the driver's 50-row record window with NO prior "
        f"CORRECTNESS row: {missing} — move them into the first 50"
    )


@pytest.mark.parametrize("qid", QIDS)
def test_driver_canonicalizable_schema(spark, qid):
    """The driver's pandas canonicalization sorts result cells; array/map
    cells crash it (round-2 red row `ext_text_winnowing`). Gate: every
    oracle-backed driver query emits scalar columns only. Checks schema
    only — no collect — though BUILDING a few queries does run real work
    (ensure-layout writes, model fits) that later tests reuse via the
    session caches."""
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


@pytest.mark.slow  # full tier: the driver's CORRECTNESS gate runs this
# same comparison itself; in the fast tier operators are covered by unit/
# plan/kernel tests + the full-registry schema gate above
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
