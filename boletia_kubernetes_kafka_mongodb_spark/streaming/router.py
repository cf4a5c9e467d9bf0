"""Topic router and loop-breaker transforms (SURVEY.md §2.2 P7, §4.1 item 3).

The reference's ``inventario`` consumer routes every message through a
state ladder (``inventario/main.go:69-137``), and — because its own writes
re-enter the CDC feed — depends on three *correctness-critical* echo gates
(``README.md:512-519``):

1. reservas-topic messages with estado ≠ "X" → skip-confirm
   (``inventario/main.go:111-113``),
2. inventario-topic "A" messages with canres absent/0 → the event-clone echo
   → skip (``:84-87``),
3. inventario-topic "A" messages with canres < 0 → the restitution sentinel
   echo (canres = −1) → skip (``:96-97``).

These are encoded here as reusable pure DataFrame transforms: the same
Column logic applies to a static frame or a stream (tested both ways).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.json_codec import unquote_json_string
from ..sources.catalog import (
    INVENTARIO_SCHEMA,
    RESERVA_SCHEMA,
    TOPIC_EVENTOS,
    TOPIC_INVENTARIO,
    TOPIC_RESERVAS,
)

# routing decisions, mirroring the reference's switch arms
ROUTE_MATERIALIZE = "materialize"      # inventario "A", canres>0 → insert reserva
ROUTE_CASCADE = "cascade"              # inventario "C" → cancel all active reservas
ROUTE_RESTITUTE = "restitute"          # reservas "X" → give capacity back
ROUTE_SKIP_ECHO_CLONE = "skip-echo-clone"        # canres null/0 echo
ROUTE_SKIP_ECHO_SENTINEL = "skip-echo-sentinel"  # canres<0 echo (the −1)
ROUTE_SKIP_STATE = "skip-state"        # reservas topic, estado ≠ X
ROUTE_IGNORE = "ignore"                # topics this consumer doesn't own


def parse_messages(msgs: DataFrame) -> DataFrame:
    """F1+F2: unquote the double-encoded value, parse both document shapes.

    One pass produces both typed views (inventario-shaped and reserva-shaped
    structs), each gated on its topic — the consumer only decodes a message
    with the contract of its topic, and the ``when`` short-circuit halves the
    JSON-parse work per message. Unknown fields drop silently (Go-struct
    decode semantics).
    """
    decoded = unquote_json_string(F.col("value"))
    return msgs.withColumn(
        "doc_inv",
        F.when(F.col("topic") == TOPIC_INVENTARIO, F.from_json(decoded, INVENTARIO_SCHEMA)),
    ).withColumn(
        "doc_res",
        F.when(F.col("topic") == TOPIC_RESERVAS, F.from_json(decoded, RESERVA_SCHEMA)),
    )


def route_column() -> Column:
    """The consumer's routing ladder as a single codegen'd CASE expression."""
    canres = F.col("doc_inv.canres")
    inv_estado = F.col("doc_inv.estado")
    res_estado = F.col("doc_res.estado")
    return (
        F.when(
            F.col("topic") == TOPIC_INVENTARIO,
            F.when(inv_estado == "C", F.lit(ROUTE_CASCADE))
            .when(
                inv_estado == "A",
                F.when(canres.isNull() | (canres == 0), F.lit(ROUTE_SKIP_ECHO_CLONE))
                .when(canres < 0, F.lit(ROUTE_SKIP_ECHO_SENTINEL))
                .otherwise(F.lit(ROUTE_MATERIALIZE)),
            )
            .otherwise(F.lit(ROUTE_IGNORE)),
        )
        .when(
            F.col("topic") == TOPIC_RESERVAS,
            F.when(res_estado == "X", F.lit(ROUTE_RESTITUTE)).otherwise(
                F.lit(ROUTE_SKIP_STATE)
            ),
        )
        .when(F.col("topic") == TOPIC_EVENTOS, F.lit(ROUTE_IGNORE))
        .otherwise(F.lit(ROUTE_IGNORE))
    )


def route_messages(msgs: DataFrame) -> DataFrame:
    """Parse + route. Output keeps both typed docs and the routing decision."""
    return parse_messages(msgs).withColumn("route", route_column())


def loop_breaker(routed: DataFrame) -> DataFrame:
    """Drop every echo/self-message — the cycle-breaking gate.

    Without this filter the reference's topology is an infinite message loop
    (``README.md:512-519``); it is correctness-critical, hence a named,
    separately-tested transform rather than an inline filter.
    """
    return routed.where(
        ~F.col("route").isin(
            ROUTE_SKIP_ECHO_CLONE, ROUTE_SKIP_ECHO_SENTINEL, ROUTE_SKIP_STATE, ROUTE_IGNORE
        )
    )


def materialize_detreserva(routed: DataFrame) -> DataFrame:
    """P8 on the stream: enriched-inventario message → reservation row.

    The DetReserva rename (``contratos/contratos.go:31-37``): idres→_id,
    nombre→evento, canres→cantidad; keep estado/email.
    """
    return routed.where(F.col("route") == ROUTE_MATERIALIZE).select(
        F.col("doc_inv.idres").alias("_id"),
        F.col("doc_inv.nombre").alias("evento"),
        F.col("doc_inv.estado").alias("estado"),
        F.col("doc_inv.email").alias("email"),
        F.col("doc_inv.canres").alias("cantidad"),
        F.col("seq"),
    )
