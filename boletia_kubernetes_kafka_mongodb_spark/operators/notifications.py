"""S8: the notification sink output — SURVEY.md §2.1.

The engine's side-effect boundary is modeled as an output *table* of rendered
messages (FIXTURES.md §2 ``notifications``); actual SES/SMTP delivery is a
``foreach`` transport concern outside the query surface (the reference even
tolerates AWS-side loss by confirming anyway, ``notificaciones/main.go:119-131``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from ..functions.templates import TEMPLATES, render_notification
from ..oracle import with_domain


def notify_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render one notification row per reservation message.

    Reference: estado selects the template (F7, ``notificaciones/main.go:92-94``),
    ``fmt.Sprintf`` renders (F6, ``:96``), subject is fixed per confirm/cancel.
    Pure narrow map — no shuffle, whole-stage codegen.
    """
    res = tables.reservas(spark, sf_dir)
    return res.select(
        F.col("_id").alias("reserva_id"),
        F.col("email").alias("email"),
        F.when(F.col("estado") == "A", F.lit("Confirmacion de reserva"))
        .otherwise(F.lit("Cancelacion de reserva"))
        .alias("subject"),
        render_notification("_id", "cantidad", "evento", "estado").alias("body"),
    )


def notify_render_oracle() -> str:
    t_a, t_c, t_x = (t.replace("%s", "%s").replace("%d", "%d") for t in TEMPLATES)
    return with_domain(
        f"""SELECT _id AS reserva_id,
                   email,
                   CASE WHEN estado = 'A' THEN 'Confirmacion de reserva'
                        ELSE 'Cancelacion de reserva' END AS subject,
                   CASE estado
                        WHEN 'A' THEN printf('{t_a}', _id, cantidad, evento)
                        WHEN 'C' THEN printf('{t_c}', _id, cantidad, evento)
                        WHEN 'X' THEN printf('{t_x}', _id, cantidad, evento)
                   END AS body
            FROM reservas"""
    )
