"""Admission semantics: cancel lifecycle, property-based fold checks, and
smoke coverage of every driver query at the smallest SF."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from boletia_kubernetes_kafka_mongodb_spark.sources import cdc_stream
from boletia_kubernetes_kafka_mongodb_spark.streaming import admission
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# M1+M2 lifecycle: reserves then cancels, stream ≡ batch, ledger arithmetic
# ---------------------------------------------------------------------------

def test_admission_with_cancels_stream_equals_batch(spark, tmp_path):
    ops = admission.op_stream_with_cancels(spark, SF_SMOKE).where(
        F.col("evento") < "Evento 000040"
    )
    batch = {
        (r.evento, r.seq): (r.op, r.admitted, r.disponible_despues)
        for r in admission.fold_requests_batch(ops).collect()
    }
    path = str(tmp_path / "ops")
    cdc_stream.write_ordered_files(ops, path, n_files=4)
    stream_reqs = (
        spark.readStream.schema(ops.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    q = (
        admission.admission_ledger_stream(stream_reqs)
        .writeStream.format("memory")
        .queryName("ledger_cancel_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.evento, r.seq): (r.op, r.admitted, r.disponible_despues)
        for r in spark.sql("select * from ledger_cancel_out").collect()
    }
    assert got == batch
    # every cancel op is admitted (M2 unguarded) and restores capacity
    assert all(adm for (op, adm, _) in got.values() if op == "cancel")


def test_admission_cancel_restores_capacity(spark):
    """For an event where every reserve was admitted, final availability =
    capacidad − Σ active + 0 (X rows net out: reserve then cancel)."""
    ops = admission.op_stream_with_cancels(spark, SF_SMOKE)
    ledger = admission.fold_requests_batch(ops)
    final = (
        ledger.groupBy("evento")
        .agg(
            F.min_by("disponible_despues", F.col("seq") * -1).alias("final_disp"),
            F.min("admitted").alias("all_admitted"),
        )
    )
    reqs = ops.groupBy("evento").agg(
        F.first("capacidad").alias("capacidad"),
        F.sum(F.when(F.col("op") == "reserve", F.col("cantidad")).otherwise(0)).alias("reserved"),
        F.sum(F.when(F.col("op") == "cancel", F.col("cantidad")).otherwise(0)).alias("cancelled"),
    )
    joined = final.join(reqs, "evento").where(F.col("all_admitted"))
    bad = joined.where(
        F.col("final_disp") != F.col("capacidad") - F.col("reserved") + F.col("cancelled")
    )
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# property-based: the pandas fold == a trivially-correct python model
# ---------------------------------------------------------------------------

def _python_model(capacity, ops):
    avail = capacity
    out = []
    for op, qty in ops:
        if op == "reserve":
            ok = avail >= qty
            if ok:
                avail -= qty
        else:
            ok = True
            avail += qty
        out.append((ok, avail))
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    capacity=st.integers(min_value=0, max_value=50),
    ops=st.lists(
        st.tuples(st.sampled_from(["reserve", "cancel"]), st.integers(1, 20)),
        min_size=1,
        max_size=30,
    ),
)
def test_fold_matches_python_model(capacity, ops):
    import pandas as pd

    from boletia_kubernetes_kafka_mongodb_spark.operators._pandas_udfs import (
        make_admission_map_batches,
    )

    pdf = pd.DataFrame(
        {
            "evento": ["E"] * len(ops),
            "seq": range(len(ops)),
            "_id": [f"id{i}" for i in range(len(ops))],
            "email": ["u@x"] * len(ops),
            "op": [o for o, _ in ops],
            "cantidad": [q for _, q in ops],
            "capacidad": [capacity] * len(ops),
        }
    )
    fold = make_admission_map_batches()
    out = pd.concat(list(fold(iter([pdf]))))
    expect = _python_model(capacity, ops)
    got = list(zip(out["admitted"], out["disponible_despues"]))
    assert [(bool(a), int(d)) for a, d in got] == expect


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    capacity=st.integers(min_value=0, max_value=50),
    ops=st.lists(
        st.tuples(st.sampled_from(["reserve", "cancel"]), st.integers(1, 20)),
        min_size=2,
        max_size=20,
    ),
    split=st.integers(min_value=1, max_value=19),
)
def test_fold_batch_boundary_invariant(capacity, ops, split):
    """Splitting the op sequence across Arrow batches must not change the fold
    (state carries across batches within a partition)."""
    import pandas as pd

    from boletia_kubernetes_kafka_mongodb_spark.operators._pandas_udfs import (
        make_admission_map_batches,
    )

    split = min(split, len(ops) - 1)

    def mk(op_slice, seq0):
        return pd.DataFrame(
            {
                "evento": ["E"] * len(op_slice),
                "seq": range(seq0, seq0 + len(op_slice)),
                "_id": [f"id{seq0+i}" for i in range(len(op_slice))],
                "email": ["u@x"] * len(op_slice),
                "op": [o for o, _ in op_slice],
                "cantidad": [q for _, q in op_slice],
                "capacidad": [capacity] * len(op_slice),
            }
        )

    whole = pd.concat(list(make_admission_map_batches()(iter([mk(ops, 0)]))))
    parts = pd.concat(
        list(
            make_admission_map_batches()(
                iter([mk(ops[:split], 0), mk(ops[split:], split)])
            )
        )
    )
    assert list(whole["admitted"]) == list(parts["admitted"])
    assert list(whole["disponible_despues"]) == list(parts["disponible_despues"])


# ---------------------------------------------------------------------------
# every driver query runs at the smallest SF (schema/file robustness)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("qid", sorted(entrymod.queries().keys()))
def test_query_smoke_sf0001(spark, qid):
    df = entrymod.queries()[qid](spark, SF_SMOKE)
    assert df.count() >= 0
