"""Query/oracle registry — the single source of truth behind __spark_entry__.

Every operator from SURVEY.md §2 registers here via the @query decorator:

    @query("agg_groupby", oracle="SELECT ... FROM lineitem GROUP BY ...")
    def agg_groupby(spark, sf_dir):
        return T(spark, sf_dir, "lineitem").groupBy(...).agg(...)

- ``fn(spark, sf_dir) -> DataFrame`` is the Spark-side implementation.
- ``oracle`` is the ANSI-SQL equivalent DuckDB runs on the same parquet
  tables (views: region nation customer supplier part orders lineitem
  events documents embeddings). ``oracle=None`` declares a rows-only check
  (non-SQL-expressible op: approx/randomized/stateful).

Column names must match between the two sides — the driver sorts columns by
name before hashing — so every computed column is aliased identically in
both (see functions/compat.py for the determinism helpers).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Import order mirrors SURVEY.md §2 tiers.
    from .operators import (  # noqa: F401
        scans,
        projection,
        joins,
        aggregates,
        windows,
        sort_setops,
        skew,
        physical,
    )
    from .functions import scalar_families  # noqa: F401
    from .sources import jdbc_queries  # noqa: F401
    from .streaming import batch_forms  # noqa: F401
    from .extensions import (  # noqa: F401
        dedup,
        similarity,
        text_analysis,
        multimodal,
        udf_surface,
        pipeline,
    )

    _LOADED = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
