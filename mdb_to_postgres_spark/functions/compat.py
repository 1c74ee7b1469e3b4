"""Determinism helpers for Spark <-> DuckDB oracle parity (SURVEY.md §4.3).

Floating-point aggregation is order-dependent: SUM(double) over different
partitionings differs in the last ulp, which breaks the driver's value-hash
compare. The fix is exact arithmetic: cast inputs to DECIMAL before
accumulating (exact on both engines), then cast the final value to DOUBLE
(same IEEE rounding on both sides). Division is done in DOUBLE *after* the
exact sum, so both engines perform one identical IEEE op.

These helpers encode that discipline once; every aggregate query uses them
on the Spark side and mirrors the same expression text in its oracle SQL.

At 100 TB this costs nothing extra: decimal sums are still a single-pass
partial+final HashAggregate; the cast is per-row JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# All corpus money/quantity columns carry 2-decimal values; 18,2 leaves
# plenty of headroom and sums stay inside decimal(38,x) at any sf.
DEC = "decimal(18,2)"


def dcol(col: str | Column) -> Column:
    """Exact fixed-point view of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column, alias: str) -> Column:
    """Order-insensitive SUM: exact decimal accumulation, double result."""
    return F.sum(dcol(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, single IEEE divide."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dcol(c)).cast("double") / F.count(c)).alias(alias)


def dsum_expr(sql_expr: str, alias: str) -> Column:
    """SUM of an exact decimal expression (e.g. revenue = price*(1-disc))."""
    return F.expr(f"CAST(SUM({sql_expr}) AS DOUBLE)").alias(alias)


# SQL-text twins for oracle strings --------------------------------------

def sql_dsum(col: str, alias: str) -> str:
    return f"CAST(SUM(CAST({col} AS {DEC.upper()})) AS DOUBLE) AS {alias}"


def sql_davg(col: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({col} AS {DEC.upper()})) AS DOUBLE) / COUNT({col}) AS {alias}"
    )


# Exact decimal expression fragments shared verbatim by both engines.
# revenue / charge in TPC-H pricing terms:
REVENUE_EXPR = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)
CHARGE_EXPR = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
    " * (1 + CAST(l_tax AS DECIMAL(18,2)))"
)
