"""Plan inspection and assertion helpers (physical-plan quality gates)."""

from .explain import (
    assert_broadcast_join,
    assert_no_exchange,
    assert_pushed_filter,
    assert_whole_stage_codegen,
    explain_str,
    read_schema_columns,
)

__all__ = [
    "explain_str",
    "assert_pushed_filter",
    "assert_broadcast_join",
    "assert_no_exchange",
    "assert_whole_stage_codegen",
    "read_schema_columns",
]
