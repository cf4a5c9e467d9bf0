"""Scalar function surface — SURVEY.md §2.7 (F1-F9).

All implemented as native Column expressions (JVM-side, codegen-friendly);
no Python UDFs anywhere in the core surface, per SURVEY.md §2.8.
"""

from .json_codec import unquote_json_string, parse_document, serialize_document
from .ids import gen_hex_id, is_valid_hex24, long_to_hex24
from .templates import render_notification, template_index

__all__ = [
    "unquote_json_string",
    "parse_document",
    "serialize_document",
    "gen_hex_id",
    "is_valid_hex24",
    "long_to_hex24",
    "render_notification",
    "template_index",
]
