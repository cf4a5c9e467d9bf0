"""Declared schemas for the boletia domain (SURVEY.md §1.3-1.4).

Schemas are *declared*, never inferred — matching the reference's Go-struct
contracts (``clientes-go/contratos/contratos.go:7-37``): fixed at the edges,
unknown JSON fields silently dropped by ``from_json``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Evento contract (contratos.go:7-13)
EVENTO_SCHEMA = StructType(
    [
        StructField("_id", StringType(), False),        # 24-hex ObjectId
        StructField("nombre", StringType(), False),     # unique index
        StructField("capacidad", IntegerType(), False),
        StructField("categoria", StringType(), True),
        StructField("estado", StringType(), False),     # A | C
    ]
)

# Inventario contract (contratos.go:15-21) = evento clone + transient
# enrichment fields the guarded decrement $sets (reservas/main.go:154-157)
INVENTARIO_SCHEMA = StructType(
    [
        StructField("_id", StringType(), False),
        StructField("nombre", StringType(), False),
        StructField("capacidad", IntegerType(), False),  # = available
        StructField("categoria", StringType(), True),
        StructField("estado", StringType(), False),
        StructField("idres", StringType(), True),
        StructField("email", StringType(), True),
        StructField("canres", IntegerType(), True),      # −1 = cancel sentinel
    ]
)

# Reserva contract (contratos.go:23-29)
RESERVA_SCHEMA = StructType(
    [
        StructField("_id", StringType(), False),
        StructField("evento", StringType(), False),
        StructField("estado", StringType(), False),      # A | X | C
        StructField("email", StringType(), True),
        StructField("cantidad", IntegerType(), False),
    ]
)

# CDC message envelope (FIXTURES.md §2; pcKafka.go:20-24): the value is a
# JSON-quoted string of the document (double-encoded, schemas.enable=false)
MESSAGE_SCHEMA = StructType(
    [
        StructField("seq", LongType(), False),
        StructField("topic", StringType(), False),
        StructField("key", StringType(), False),
        StructField("value", StringType(), False),
    ]
)

TOPIC_EVENTOS = "boletia.eventos"
TOPIC_INVENTARIO = "boletia.inventario"
TOPIC_RESERVAS = "boletia.reservas"
