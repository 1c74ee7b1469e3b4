"""Physical-layout operators (SURVEY.md §2 rows 73-74): the two storage
decisions that dominate 100 TB join/scan cost.

- **Bucketed co-located join**: pre-hash-partition both fact tables into
  the same bucket count on the join key at WRITE time; every future join
  on that key is Exchange-free (each task reads matching buckets from both
  sides). This is the storage-side answer to "this join shuffles 100 TB
  every night".
- **Partition-pruned scan**: directory-partition by a low-cardinality
  filter column; a filter on it prunes whole directories at planning time
  (PartitionFilters), so the scan never opens non-matching files.

Both materialize their layout once per (process, sf) into the repo-local
.cache dir and are hash-checked against plain SQL — layout is an execution
detail, results are identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import T
from .scans import _cache_complete, _cache_dir

_N_BUCKETS = 8


def _tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """A fresh session's in-memory catalog doesn't know tables a previous
    process wrote, but their warehouse directories persist — saveAsTable
    then fails with LOCATION_ALREADY_EXISTS (overwrite can't apply to a
    table the catalog can't see). Remove the orphaned location."""
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, table.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)


def _ensure_bucketed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders/lineitem bucketed by the join key (once per sf/session)."""
    t_orders = f"orders_bkt_{_tag(sf_dir)}"
    t_lineitem = f"lineitem_bkt_{_tag(sf_dir)}"
    if not spark.catalog.tableExists(t_orders):
        _clear_stale_location(spark, t_orders)
        (
            T(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
            .write.bucketBy(_N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(t_orders)
        )
    if not spark.catalog.tableExists(t_lineitem):
        _clear_stale_location(spark, t_lineitem)
        (
            T(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
            .write.bucketBy(_N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(t_lineitem)
        )
    return t_orders, t_lineitem


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_orderstatus
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 200000
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free join of two tables bucketed on the join key (#73).
    Plan test asserts neither join input has an Exchange."""
    t_orders, t_lineitem = _ensure_bucketed(spark, sf_dir)
    # Disable broadcast for this plan shape so the bucketed SMJ is what
    # actually runs (at real scale neither side broadcasts anyway).
    li = spark.table(t_lineitem).hint("merge")
    o = spark.table(t_orders).filter(F.col("o_totalprice") > 200000).hint("merge")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderstatus"
    )


def _ensure_status_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """Write orders directory-partitioned by o_orderstatus (once per sf)."""
    path = _cache_dir(sf_dir, "orders_by_status")
    if not _cache_complete(path):
        (
            T(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
            .write.partitionBy("o_orderstatus")
            .mode("overwrite")
            .parquet(path)
        )
    return path


@query(
    "scan_partition_pruned",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-partitioned scan with planning-time pruning (#74): only
    the o_orderstatus=F directory is read. Plan test asserts the filter
    lands in PartitionFilters, not in a post-scan Filter."""
    path = _ensure_status_partitioned(spark, sf_dir)
    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    return df.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")


@query(
    "join_dpp_pruned",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderstatus
    FROM orders o
    JOIN (VALUES ('O', 'open'), ('F', 'terminal'), ('P', 'open')) d(status, lifecycle)
      ON o.o_orderstatus = d.status
    WHERE d.lifecycle = 'terminal'
    """,
)
def join_dpp_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (#74b): the partition filter is not known
    until runtime — it comes from the dim side of the join (statuses whose
    lifecycle is 'terminal'). Catalyst injects a DynamicPruningExpression
    subquery into the fact scan's PartitionFilters, reusing the dim's
    broadcast, so only matching status directories are ever opened
    (plan-asserted).

    This is THE mechanism that makes star-schema scans over date- or
    status-partitioned 100 TB facts affordable when the predicate lives on
    the dimension ("orders in terminal states", "sales in fiscal Q4"). Two
    shape requirements, both load-bearing: the dim is parquet, not a
    LocalRelation (DPP keys off a file-source join), and the dim predicate
    is a binary comparison (`lifecycle = 'terminal'`) — Catalyst's
    isLikelySelective() does not count a bare boolean attribute as a
    selective filter, so a `WHERE is_terminal` dim would never trigger
    insertion (round-1 red test).
    """
    fact_path = _ensure_status_partitioned(spark, sf_dir)
    dim_path = _cache_dir(sf_dir, "status_dim_v2")
    if not _cache_complete(dim_path):
        spark.createDataFrame(
            [("O", "open"), ("F", "terminal"), ("P", "open")],
            "status: string, lifecycle: string",
        ).write.mode("overwrite").parquet(dim_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("lifecycle") == "terminal")
    return fact.join(dim, fact.o_orderstatus == dim.status).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
