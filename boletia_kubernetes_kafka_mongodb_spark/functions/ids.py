"""F4-F5: ObjectId-style 24-hex identifiers.

The reference uses 12-byte BSON ObjectIds rendered as 24-char hex
(``reservas/main.go:112-115`` validates+decodes; ``bson.NewObjectId()`` at
``eventos/main.go:70``). Per SURVEY.md §1.2 the engine represents ids as
24-hex strings — no custom type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX24 = "^[0-9a-f]{24}$"


def long_to_hex24(col: Column | str) -> Column:
    """F4: deterministic long → zero-padded lowercase 24-hex encoding."""
    c = F.col(col) if isinstance(col, str) else col
    # hex/lpad over format_string: ~2x cheaper in codegen, identical output
    # for the non-negative longs this engine encodes.
    return F.lower(F.lpad(F.hex(c), 24, "0"))


def is_valid_hex24(col: Column | str) -> Column:
    """F4: the id validation predicate (length-24 lowercase hex)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) == 24) & c.rlike(HEX24)


def gen_hex_id(*seed_cols: Column | str) -> Column:
    """F5: content-derived fresh id — sha1 of the row, truncated to 24 hex.

    Deterministic (unlike ``bson.NewObjectId()``) so tests and replays are
    reproducible; uniqueness holds for distinct row contents.
    """
    return F.lower(F.sha1(F.to_json(F.struct(*seed_cols)))).substr(1, 24)
