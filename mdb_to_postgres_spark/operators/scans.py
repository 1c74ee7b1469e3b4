"""Scans, sources, sinks — tier R gate queries (SURVEY.md §2.1 #1-8).

The reference's whole surface is "read every table, write every table".
Here each source/sink format is exercised as a round-trip query whose
result must equal the original table, so copy fidelity is checked by the
same hash gate as everything else.

Round-trip artifacts are written under ``.cache/`` in the repo (keyed by
scale factor) — writing is part of the operator under test.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources.tables import T as tbl
from ..etl.typemap import JET_TO_POSTGRES, JET_TO_SPARK

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache")


def _cache_dir(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_CACHE, tag, name)


@query("scan_parquet", oracle="SELECT * FROM region")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar file scan (#6): the base access path for every query."""
    return tbl(spark, sf_dir, "region")


# Nation is all-int/string — CSV round-trips exactly (no float formatting
# hazards), which is what makes this oracle-checkable.
_NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


@query("scan_csv", oracle="SELECT * FROM nation")
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed delimited-text scan (#7) — the reference's `mdb-export` CSV mode.

    Writes nation to CSV once per sf, then reads it back with an explicit
    StructType (extracted-schema discipline, never inference-on-read).
    """
    path = _cache_dir(sf_dir, "nation_csv")
    if not os.path.exists(path):
        tbl(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(path)
    return spark.read.csv(path, schema=_NATION_SCHEMA, header=True)


@query("full_table_copy", oracle="SELECT * FROM customer")
def full_table_copy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed 1:1 copy (#4), the reference's flagship op: scan -> columnar
    sink -> scan of the sink must be indistinguishable from the source."""
    path = _cache_dir(sf_dir, "customer_copy")
    if not os.path.exists(path):
        tbl(spark, sf_dir, "customer").write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@query("sink_parquet", oracle="SELECT * FROM orders")
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned columnar sink (#8). Partitioning by a low-cardinality
    column is the 100 TB layout primitive: downstream filters on the
    partition key prune whole directories."""
    path = _cache_dir(sf_dir, "orders_by_priority")
    if not os.path.exists(path):
        tbl(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(path)
    df = spark.read.parquet(path)
    # Partition columns come back last; restore canonical order (driver
    # sorts columns by name anyway, but keep the schema stable for entry()).
    return df.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                     "o_orderdate", "o_orderpriority")


@query("list_tables")  # rows-only: catalog contents aren't a DuckDB view
def list_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enumerate user tables (#2) — the reference's `mdb-tables -1`, which
    filters JET system tables (MSys*). Modeled over the file catalog."""
    names = sorted(
        f[: -len(".parquet")]
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet") and not f.startswith("MSys")
    )
    return spark.createDataFrame([(n,) for n in names], "table_name: string")


@query("extract_schema")  # rows-only: schema metadata, not table data
def extract_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema extraction + translation (#3) — the reference's
    `mdb-schema db.mdb postgres`. Emits (column, spark_type, postgres_type)
    for every corpus table, using the §1.2 JET map for blob/text kinds."""
    rows = []
    from ..sources.tables import TABLES

    spark_to_pg = {
        "bigint": "BIGINT",
        "int": "INTEGER",
        "smallint": "SMALLINT",
        "double": "DOUBLE PRECISION",
        "float": "REAL",
        "string": "TEXT",
        "boolean": "BOOLEAN",
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
        "binary": "BYTEA",
        "date": "DATE",
    }
    for t in TABLES:
        for f in tbl(spark, sf_dir, t).schema.fields:
            simple = f.dataType.simpleString()
            pg = spark_to_pg.get(simple)
            if pg is None and simple.startswith("decimal"):
                pg = simple.upper().replace("DECIMAL", "NUMERIC")
            if pg is None and simple.startswith("array"):
                pg = "JSONB"  # Postgres has no native float array short of extensions
            rows.append((t, f.name, simple, pg or "TEXT"))
    return spark.createDataFrame(
        rows, "table_name: string, column_name: string, spark_type: string, postgres_type: string"
    )


@query(
    "etl_incremental_upsert",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice, 0 AS change_seq FROM orders
    ),
    changes AS (
      SELECT o_orderkey, o_custkey,
             o_totalprice + 100.0 AS o_totalprice, 1 AS change_seq
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    merged AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                   ORDER BY change_seq DESC) AS rn
      FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)
    )
    SELECT o_orderkey, o_custkey, o_totalprice, change_seq
    FROM merged WHERE rn = 1
    """,
)
def etl_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-copy as a latest-wins merge (#4 re-run semantics):
    a deterministic synthetic change set (every 10th order repriced +100.00, an exact double op)
    merged into the base copy; changed keys take the change-set row,
    unchanged keys keep the base row. etl.pipeline.merge_upsert."""
    from ..etl.pipeline import merge_upsert
    from pyspark.sql import functions as F2

    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    base = o.withColumn("change_seq", F2.lit(0))
    changes = (
        o.filter(F2.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F2.col("o_totalprice") + 100.0)
        .withColumn("change_seq", F2.lit(1))
    )
    return merge_upsert(base, changes, "o_orderkey", "change_seq")
