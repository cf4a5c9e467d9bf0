"""MongoDB connector surface: filter translation is exact, builders carry the
reference topology's options (no mongod in this container — gated pattern,
same as kafka.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from boletia_kubernetes_kafka_mongodb_spark import tables
from boletia_kubernetes_kafka_mongodb_spark.sources import mongodb as M

from tests.conftest import SF_CORRECT


# --- find_filter: every filter shape the reference issues, checked against
# --- plain Column predicates on real fixture data -------------------------

def test_find_filter_equality_point_lookup(spark):
    # Find(bson.M{"nombre": x}) — reservas/main.go:79
    part = tables.load(spark, SF_CORRECT, "part")
    name = part.select("p_name").first()[0]
    got = part.filter(M.find_filter({"p_name": name})).count()
    want = part.filter(F.col("p_name") == name).count()
    assert got == want > 0


def test_find_filter_compound_and_operator(spark):
    # the guarded-decrement filter: nombre=, estado=, capacidad $gt n-1
    # (reservas/main.go:161-165) — same shape over part(p_size, p_brand)
    part = tables.load(spark, SF_CORRECT, "part")
    doc = {"p_brand": "Brand#13", "p_size": {"$gt": 24}}
    got = part.filter(M.find_filter(doc)).count()
    want = part.filter((F.col("p_brand") == "Brand#13") & (F.col("p_size") > 24)).count()
    assert got == want


@pytest.mark.parametrize(
    "spec,pred",
    [
        ({"p_size": {"$gte": 30}}, lambda c: c >= 30),
        ({"p_size": {"$lt": 5}}, lambda c: c < 5),
        ({"p_size": {"$lte": 5}}, lambda c: c <= 5),
        ({"p_size": {"$ne": 10}}, lambda c: c != 10),
        ({"p_size": {"$in": [1, 2, 3]}}, lambda c: c.isin(1, 2, 3)),
    ],
)
def test_find_filter_operators(spark, spec, pred):
    part = tables.load(spark, SF_CORRECT, "part")
    got = part.filter(M.find_filter(spec)).count()
    want = part.filter(pred(F.col("p_size"))).count()
    assert got == want


def test_find_filter_null_equality_matches_nulls(spark):
    """Mongo equality-with-null matches docs whose field is null (or
    missing); Spark `== NULL` matches nothing — the translation must use
    null-safe equality, symmetric with the $ne branch."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id long, estado string"
    )
    got = {r.id for r in df.filter(M.find_filter({"estado": None})).collect()}
    assert got == {2, 3}
    # and $ne None keeps its complement semantics
    got_ne = {r.id for r in df.filter(M.find_filter({"estado": {"$ne": None}})).collect()}
    assert got_ne == {1}


def test_find_filter_empty_is_full_scan(spark):
    # Find(nil).All — reservas/main.go:61
    nation = tables.load(spark, SF_CORRECT, "nation")
    assert nation.filter(M.find_filter({})).count() == nation.count()


def test_find_filter_unknown_operator_raises():
    with pytest.raises(ValueError, match="unsupported operator"):
        M.find_filter({"x": {"$regex": "foo"}})


def test_find_filter_pushes_down_to_parquet(spark):
    # the translated predicate must reach the scan (PushedFilters) — the
    # local twin of mongod-side $match: no full-collection read for a lookup
    part = tables.load(spark, SF_CORRECT, "part")
    plan = part.filter(M.find_filter({"p_brand": "Brand#13"}))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "p_brand" in plan.split("PushedFilters")[1][:200]


def test_match_pipeline_json():
    doc = {"nombre": "concert", "capacidad": {"$gt": 4}}
    assert json.loads(M.match_pipeline(doc)) == [{"$match": doc}]


# --- gated builders: correct format + option map, never started ------------

def test_mongo_read_options():
    o = M.read_options("inventario", filter_doc={"nombre": "x"})
    assert o["database"] == "boletia"
    assert o["collection"] == "inventario"
    assert "replicaSet=rs0" in o["connection.uri"]
    assert "SamplePartitioner" in o["partitioner"]
    assert json.loads(o["aggregation.pipeline"]) == [{"$match": {"nombre": "x"}}]


def test_mongo_change_stream_options():
    o = M.change_stream_options("eventos")
    # publish.full.document.only=true — kafka-mongodb-connect.yaml:20
    assert o["change.stream.publish.full.document.only"] == "true"
    assert o["collection"] == "eventos"


def test_mongo_sink_idempotent_options():
    o = M.sink_options("inventario")
    assert o["idFieldList"] == "_id"
    assert o["operationType"] == "replace"
    assert o["upsertDocument"] == "true"


def test_builders_construct_without_connector(spark, tmp_path):
    # No mongod / connector JAR in this container: builders must still
    # construct (they only fail at .load()/.start() time).
    M.mongo_read(spark, "inventario", filter_doc={"nombre": "x"})
    M.mongo_change_stream(spark, "eventos")
    M.mongo_sink(tables.load(spark, SF_CORRECT, "nation").limit(1), "inventario")
    M.mongo_stream_sink(
        spark.readStream.format("rate").load(), "inventario", str(tmp_path / "ckpt")
    )


def test_unique_index_catalog_matches_reference():
    # eventos/main.go:25-30; reservas/main.go:26-43
    assert M.UNIQUE_INDEXES["reservas"] == ("evento", "email")
    assert M.UNIQUE_INDEXES["eventos"] == ("nombre",)
