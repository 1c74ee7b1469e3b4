"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``mdb_to_postgres_spark.registry``: every operator from
SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame callable and, where
SQL-expressible, a DuckDB oracle string. See the package modules for the
implementations; tests/test_oracle_parity.py runs the same comparison the
driver does.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mdb_to_postgres_spark import registry
from mdb_to_postgres_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: 5-way star join + decimal-exact revenue
    rollup (operators/joins.py::join_multiway_star)."""
    tune_session(spark)
    return registry.all_queries()["join_multiway_star"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; rows-only
    operators (approx/randomized/engine-specific) are intentionally absent."""
    return registry.all_oracles()
