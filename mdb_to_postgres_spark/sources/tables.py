"""Test-corpus table catalog (TPC-H-ish star schema + events/documents/embeddings).

``T(spark, sf_dir, name)`` is the canonical scan used by every registered
query. It is a plain ``spark.read.parquet`` — Catalyst owns pushdown and
column pruning from there; at cluster scale the same call reads a
partitioned table directory with partition pruning intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor — TPC-H
# region/nation are fixed-size; supplier/part/customer grow with sf but the
# broadcast decision for those is left to Catalyst/AQE thresholds.
ALWAYS_BROADCAST = ("region", "nation")


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table.

    Sets the session timezone (runtime conf) so date/time results are
    deterministic against the DuckDB oracle even when the caller built the
    SparkSession without our factory.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the full catalog and register temp views (for spark.sql use)."""
    out = {}
    for name in TABLES:
        df = T(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
