"""JDBC source/sink (SURVEY.md §2.1 #1, #4, #5) — the reference's actual
endpoints (Access-extract -> PostgreSQL), Spark-native.

Scale posture (SURVEY.md §4.3 row 1): a naive ``spark.read.jdbc`` is ONE
task pulling the whole table through one connection. ``read_partitioned``
always computes split bounds first (a scalar MIN/MAX pre-query) and issues
``numPartitions`` range-predicate scans in parallel — the difference
between a single-stream and a saturated-cluster ingest. For non-numeric
keys, ``predicates_for_mod`` builds hash-mod predicates instead.

Writes batch inserts (``batchsize``); for true 100 TB loads into Postgres
prefer parquet + external COPY (operators/scans.py sink notes), but the
direct path is correct and transactional per partition.

The test suite runs all of this against an embedded Derby database (the
only JDBC engine present in the image); the URL/driver/properties are
parameters, so a Postgres endpoint is a config change:
``jdbc:postgresql://host/db`` + the postgresql driver jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, url: str, table: str, properties: dict | None = None) -> DataFrame:
    """Single-connection scan (#1, small tables / catalog queries)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    num_partitions: int = 16,
    properties: dict | None = None,
) -> DataFrame:
    """Parallel range-partitioned scan (#1 at scale).

    Bounds come from a scalar pre-query so callers never hardcode them;
    each of the ``num_partitions`` tasks issues
    ``WHERE pc >= lo AND pc < hi`` against the source.
    """
    # Spark's JDBC writer quotes identifiers (case-preserving), so the
    # bounds pre-query and split predicates must quote them too — unquoted
    # names get case-folded by the engine (Derby/Postgres both).
    qc = f'"{partition_column}"'
    bounds_sql = f"(SELECT MIN({qc}) AS mn, MAX({qc}) AS mx FROM {table}) b"
    b = read_table(spark, url, bounds_sql, properties).collect()[0]
    lo, hi = b[0], b[1]
    if lo is None:  # empty table: nothing to partition over
        return read_table(spark, url, table, properties)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", qc)
        .option("lowerBound", str(lo))
        .option("upperBound", str(int(hi) + 1))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def predicates_for_mod(key_expr: str, num_partitions: int) -> list[str]:
    """Hash-mod partition predicates for non-numeric keys (#1 fallback):
    pass to ``spark.read.jdbc(url, table, predicates=...)``."""
    return [f"MOD(ABS({key_expr}), {num_partitions}) = {i}" for i in range(num_partitions)]


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batchsize: int = 10000,
    properties: dict | None = None,
) -> None:
    """Batched JDBC sink (#5): one transaction per partition, multi-row
    INSERT batches."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def full_table_copy_jdbc(
    spark: SparkSession,
    src_url: str,
    src_table: str,
    dst_url: str,
    dst_table: str,
    partition_column: str | None = None,
    num_partitions: int = 16,
) -> None:
    """The reference's flagship op (#4) between two JDBC endpoints:
    parallel partitioned read -> batched write, schema carried by Spark."""
    if partition_column:
        df = read_partitioned(spark, src_url, src_table, partition_column, num_partitions)
    else:
        df = read_table(spark, src_url, src_table)
    write_table(df, dst_url, dst_table)
