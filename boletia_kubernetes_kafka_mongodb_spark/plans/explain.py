"""Physical-plan quality gates.

The engine's scale contract is expressed as assertions over
``explain("formatted")`` output: predicate pushdown reached the parquet
scan, dimension joins broadcast, narrow maps stayed exchange-free, and the
hot path stayed inside WholeStageCodegen. tests/test_plans.py runs these on
the headline operators so a plan regression fails CI, not a 100 TB run.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, column: str) -> None:
    """The parquet scan must report a PushedFilters entry on ``column``."""
    plan = explain_str(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(column in filters for filters in m), (
        f"no pushed filter on {column}; PushedFilters={m}\n{plan}"
    )


def assert_broadcast_join(df: DataFrame, forbid_sort_merge: bool = True) -> None:
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, f"no BroadcastHashJoin:\n{plan}"
    if forbid_sort_merge:
        assert "SortMergeJoin" not in plan, f"unexpected SortMergeJoin:\n{plan}"


def assert_no_exchange(df: DataFrame) -> None:
    """A narrow map must not introduce a SEMANTIC shuffle.

    Round-robin exchanges are exempt: they come from the test-scale fan of
    single-row-group fixture files (tables.load(fan=True)) and vanish once
    files split natively; a hash/range exchange, by contrast, means the
    operator itself demanded a repartition — that's the regression this
    gate exists to catch.
    """
    # simple mode keeps the partitioning on the Exchange line itself
    # (formatted mode splits it onto a separate Arguments: line).
    plan = explain_str(df, mode="simple")
    semantic = [
        line
        for line in plan.splitlines()
        if "Exchange" in line and "roundrobin" not in line.lower()
    ]
    assert not semantic, f"unexpected Exchange in narrow plan:\n{plan}"


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """The plan must contain at least one WholeStageCodegen span.

    Explained with AQE off: an un-executed AdaptiveSparkPlan
    (isFinalPlan=false) hides codegen markers, and codegen presence is a
    static plan property independent of AQE's runtime re-optimization.
    """
    plan = explain_str(df, mode="simple")
    if "*(" not in plan and "isFinalPlan=false" in plan:
        # an un-executed AdaptiveSparkPlan hides codegen markers; running the
        # query finalizes it in place, after which explain shows the real
        # stages (test-scale inputs only — this gate runs at sf0.01).
        df.collect()
        plan = explain_str(df, mode="simple")
    assert "*(" in plan, f"no WholeStageCodegen span:\n{plan}"


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns the parquet scan actually reads (column-pruning check)."""
    plan = explain_str(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols
