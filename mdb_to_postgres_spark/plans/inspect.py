"""Physical-plan inspection helpers.

The engine's performance posture is asserted, not assumed: tests use these
to check that filters reach the parquet scan (PushedFilters), projections
prune the read schema (ReadSchema), small dims broadcast, and hot
expressions stay inside WholeStageCodegen (SURVEY.md §4.2).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture .explain output as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters: [...] section(s) of the formatted plan."""
    plan = explain_str(df)
    return "\n".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema section(s) — what the parquet scan actually reads."""
    plan = explain_str(df)
    return "\n".join(re.findall(r"ReadSchema: [^\n]*", plan))


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Count of WholeStageCodegen spans (wider = more fused execution)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))
