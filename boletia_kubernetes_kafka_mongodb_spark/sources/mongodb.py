"""MongoDB connector surface (SURVEY.md §2.1; north-star "MongoDB connector").

The reference stores every collection in a 3-member ``rs0`` replica set
(``mongo.yaml:68-76``) and reaches it two ways:

* services dial it directly with mgo (``reservas/main.go:20-26``,
  ``eventos/main.go``, ``inventario/main.go:21-23``) using point lookups on
  unique indexes and ``findAndModify`` guarded updates
  (``reservas/main.go:151-165``);
* Kafka Connect replicates it both directions — a Mongo *source* publishing
  full documents and a Mongo *sink* upserting ``boletia.eventos`` into
  ``boletia.inventario`` (``kafka-mongodb-connect.yaml:16-32``).

Spark-first mapping (MongoDB Spark Connector v10.x, format ``"mongodb"``):

* direct reads        → ``mongo_read`` (batch) with partitioner options so a
  collection scan splits across executors, plus ``$match`` aggregation
  pushdown so unique-index point lookups stay server-side;
* Connect source      → ``mongo_change_stream`` (``readStream``), change
  streams with ``publish.full.document.only`` exactly like the Connect
  source property (``kafka-mongodb-connect.yaml:20``);
* Connect sink        → ``mongo_sink`` / ``mongo_stream_sink``: idempotent
  ``replace``-on-``_id`` upserts — replayed micro-batches converge, the same
  at-least-once ⇒ exactly-once-effect contract the reference relies on
  (``README.md:148-155``).

This container has no mongod and no connector JAR, so builders return
configured (unstarted) readers/writers — the same gated pattern as
``kafka.py``. What IS executable everywhere is the query-translation layer:
``find_filter`` turns the reference's bson filter documents into Spark
``Column`` predicates (tested against fixtures), and ``match_pipeline``
renders the equivalent ``$match`` JSON the connector pushes down server-side.
"""

from __future__ import annotations

import json
from typing import Any, Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_URI = "mongodb://mongo-0:27017,mongo-1:27017,mongo-2:27017/?replicaSet=rs0"
DATABASE = "boletia"

# Collections and their hand-chosen unique access paths
# (eventos/main.go:25-30; reservas/main.go:26-43).
UNIQUE_INDEXES = {
    "eventos": ("nombre",),
    "inventario": ("nombre",),
    "reservas": ("evento", "email"),
}

# mgo/Mongo comparison operators we translate. Anything else is a loud error:
# silently mistranslating a predicate would corrupt downstream results.
_OPS = {
    "$gt": Column.__gt__,
    "$gte": Column.__ge__,
    "$lt": Column.__lt__,
    "$lte": Column.__le__,
    "$ne": lambda c, v: ~c.eqNullSafe(F.lit(v)),
    "$in": lambda c, v: c.isin(*v),
}


def find_filter(doc: Mapping[str, Any]) -> Column:
    """Translate a bson filter document to a Spark ``Column`` predicate.

    Covers the reference's entire query grammar: top-level keys AND together;
    values are either literals (equality, e.g.
    ``Find(bson.M{"nombre": nombre})``, ``reservas/main.go:79``) or operator
    documents (e.g. ``{"capacidad": {"$gt": n-1}}``, the guarded-decrement
    filter ``reservas/main.go:161-165``).
    """
    if not doc:
        return F.lit(True)
    conds: list[Column] = []
    for field, spec in doc.items():
        col = F.col(field)
        if isinstance(spec, Mapping):
            for op, val in spec.items():
                if op not in _OPS:
                    raise ValueError(f"unsupported operator {op!r} on {field!r}")
                conds.append(_OPS[op](col, val))
        else:
            # null-safe equality: Mongo's {field: null} matches documents
            # where the field is null or missing, whereas Spark's `==` with
            # a NULL literal matches nothing — eqNullSafe carries the Mongo
            # semantics (and is identical to `==` for non-null literals,
            # mirroring the $ne branch above)
            conds.append(col.eqNullSafe(F.lit(spec)))
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def match_pipeline(doc: Mapping[str, Any]) -> str:
    """Render the ``$match`` aggregation-pipeline JSON for server-side
    pushdown (connector option ``aggregation.pipeline``): the unique-index
    point lookups (``reservas/main.go:79,98``) never leave mongod."""
    return json.dumps([{"$match": dict(doc)}])


def read_options(
    collection: str,
    uri: str = DEFAULT_URI,
    database: str = DATABASE,
    filter_doc: Mapping[str, Any] | None = None,
) -> dict[str, str]:
    """Option map for a batch read, split across executors.

    ``SamplePartitioner`` on ``_id`` gives balanced input splits for a full
    scan at any collection size (the 100 TB posture: N executors × many
    partitions, not one cursor). A ``filter_doc`` becomes a ``$match``
    pipeline evaluated by mongod before bytes hit the network — the Spark
    twin of hitting the unique index.
    """
    opts = {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "partitioner": "com.mongodb.spark.sql.connector.read.partitioner.SamplePartitioner",
        "partitioner.options.partition.field": "_id",
    }
    if filter_doc:
        opts["aggregation.pipeline"] = match_pipeline(filter_doc)
    return opts


def change_stream_options(
    collection: str,
    uri: str = DEFAULT_URI,
    database: str = DATABASE,
) -> dict[str, str]:
    """Options ≙ the Connect Mongo source (``kafka-mongodb-connect.yaml:
    16-21``): change stream publishing full documents only; the connector
    checkpoints resume tokens exactly where Connect's file-backed offsets sat
    (``kafka-mongodb-connect.yaml:13-14``), minus the 10 s flush
    crash-window."""
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "change.stream.publish.full.document.only": "true",
        "change.stream.lookup.full.document": "updateLookup",
    }


def sink_options(
    collection: str,
    uri: str = DEFAULT_URI,
    database: str = DATABASE,
) -> dict[str, str]:
    """Options ≙ the Connect Mongo sink (``kafka-mongodb-connect.yaml:
    22-32``): replace-by-``_id`` with upsert, so rewriting the same rows is
    a no-op — idempotent under at-least-once redelivery."""
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "idFieldList": "_id",
        "operationType": "replace",
        "upsertDocument": "true",
    }


def mongo_read(spark: SparkSession, collection: str, **kw):
    """Configured (unstarted) batch reader; see ``read_options``."""
    return spark.read.format("mongodb").options(**read_options(collection, **kw))


def mongo_change_stream(spark: SparkSession, collection: str, **kw):
    """Configured (unstarted) change-stream reader; see
    ``change_stream_options``."""
    return spark.readStream.format("mongodb").options(
        **change_stream_options(collection, **kw)
    )


def mongo_sink(df: DataFrame, collection: str, **kw):
    """Batch upsert writer; see ``sink_options``."""
    return df.write.mode("append").format("mongodb").options(**sink_options(collection, **kw))


def mongo_stream_sink(df: DataFrame, collection: str, checkpoint: str, **kw):
    """Streaming upsert writer: checkpointed offsets + idempotent replace
    give the exactly-once *effect* the reference engineers by hand with
    manual commit + consumer-side dedup (``README.md:148-155``)."""
    return (
        df.writeStream.format("mongodb")
        .options(**sink_options(collection, **kw))
        .option("checkpointLocation", checkpoint)
    )
