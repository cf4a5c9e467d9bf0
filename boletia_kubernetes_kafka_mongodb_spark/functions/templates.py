"""F6-F7 + S8: notification template rendering.

Reference (``notificaciones/main.go:76-96``): the estado code selects one of
three Spanish templates via ``strings.Index("ACX", estado)`` (F7; −1 ⇒
invalid state) and ``fmt.Sprintf`` renders body text (F6). AWS SES transport
(``:97-137``) is out of engine scope — the engine's sink output is the
rendered ``notifications`` table (FIXTURES.md §2); delivery is a
``foreach``-style side effect.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Template bodies by estado: A=confirmed, C=organizer-cancelled, X=user-cancelled
# (notificaciones/main.go:78-89).
TEMPLATES = (
    "Su reserva %s de %d entradas para el evento %s esta confirmada",
    "Su reserva %s de %d entradas para el evento %s fue cancelada: evento suspendido por los organizadores",
    "Su reserva %s de %d entradas para el evento %s fue cancelada a peticion suya",
)
STATES = ("A", "C", "X")


def template_index(estado: Column | str) -> Column:
    """F7: categorical dispatch — ``strings.Index("ACX", estado)`` analogue.

    Returns a 1-based index (``array_position``); 0 ⇒ invalid state (the
    reference errors on it, ``notificaciones/main.go:92-94``).
    """
    c = F.col(estado) if isinstance(estado, str) else estado
    return F.array_position(F.array(*[F.lit(s) for s in STATES]), c)


def render_notification(
    reserva_id: Column | str, cantidad: Column | str, evento: Column | str, estado: Column | str
) -> Column:
    """F6+F7: select template by estado and render the body.

    Invalid estados yield NULL (the caller filters/routes them — the
    reference logs-and-confirms, ``notificaciones/main.go:92-94,119-131``).
    """
    rid = F.col(reserva_id) if isinstance(reserva_id, str) else reserva_id
    qty = (F.col(cantidad) if isinstance(cantidad, str) else cantidad).cast("int")
    evt = F.col(evento) if isinstance(evento, str) else evento
    est = F.col(estado) if isinstance(estado, str) else estado
    # The three templates share the "Su reserva %s de %d entradas para el
    # evento %s" prefix and differ only in the tail — render as ONE concat
    # with a CASE'd suffix instead of three format_string branches
    # (java.util.Formatter is ~2x the codegen'd string ops; concat with a
    # NULL suffix propagates NULL, preserving invalid-state semantics).
    suffix = F.lit(None).cast("string")
    suffixes = {
        "A": " esta confirmada",
        "C": " fue cancelada: evento suspendido por los organizadores",
        "X": " fue cancelada a peticion suya",
    }
    for state in reversed(STATES):
        suffix = F.when(est == state, F.lit(suffixes[state])).otherwise(suffix)
    return F.concat(
        F.lit("Su reserva "),
        rid,
        F.lit(" de "),
        qty.cast("string"),
        F.lit(" entradas para el evento "),
        evt,
        suffix,
    )
