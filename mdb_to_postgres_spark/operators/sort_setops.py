"""Sort / limit / top-k / set operations (SURVEY.md §2.6 #39-42)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import T


@query(
    "sort_global",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal, s_nationkey,
           ROW_NUMBER() OVER (ORDER BY s_acctbal DESC NULLS LAST, s_suppkey) AS pos
    FROM supplier
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order sort (#39), made hash-observable by materializing
    the position. A global ORDER BY is a range-partitioned sort in Spark;
    the observable position comes from the clustered global-order
    substrate (functions/global_order.py — deterministic quantile buckets,
    one hash exchange, literal offsets), so even the position column never
    funnels the table through one task; the final ORDER BY presents the
    rows range-sorted."""
    from ..functions.global_order import global_row_number

    s = T(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    return global_row_number(
        s, [("s_acctbal", "desc"), ("s_suppkey", "asc")], "pos"
    ).orderBy(F.col("s_acctbal").desc_nulls_last(), F.col("s_suppkey"))


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT k (#40): plans as TakeOrderedAndProject — each
    partition keeps its local top-k, the driver merges k*p rows; no global
    sort ever happens. The scalable top-k."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@query(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, 'supplier' FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (#41): position-safe via unionByName, no shuffle at all."""
    c = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    s = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (#41): union + distinct = one hash shuffle on all cols."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey % 97 AS bucket FROM customer
    INTERSECT
    SELECT o_custkey % 89 AS bucket FROM orders
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (#42): plans as a left-semi join of distinct sets."""
    a = T(spark, sf_dir, "customer").select((F.col("c_custkey") % 97).alias("bucket"))
    b = T(spark, sf_dir, "orders").select((F.col("o_custkey") % 89).alias("bucket"))
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey % 97 AS bucket FROM customer
    EXCEPT
    SELECT o_custkey % 89 AS bucket FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (#42): plans as a left-anti join of distinct sets."""
    a = T(spark, sf_dir, "customer").select((F.col("c_custkey") % 97).alias("bucket"))
    b = T(spark, sf_dir, "orders").select((F.col("o_custkey") % 89).alias("bucket"))
    return a.subtract(b)


@query(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey % 7 AS bucket FROM customer
    INTERSECT ALL
    SELECT o_custkey % 7 AS bucket FROM orders
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (#42 cont.): INTERSECT ALL keeps min(m, n)
    copies per value — Spark plans it as a count-matching aggregate join,
    not a distinct semi-join; multiplicity survives."""
    a = T(spark, sf_dir, "customer").select((F.col("c_nationkey") % 7).alias("bucket"))
    b = T(spark, sf_dir, "orders").select((F.col("o_custkey") % 7).alias("bucket"))
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey % 7 AS bucket FROM orders
    EXCEPT ALL
    SELECT c_nationkey % 7 AS bucket FROM customer
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (#42 cont.): EXCEPT ALL keeps max(m - n, 0)
    copies per value."""
    a = T(spark, sf_dir, "orders").select((F.col("o_custkey") % 7).alias("bucket"))
    b = T(spark, sf_dir, "customer").select((F.col("c_nationkey") % 7).alias("bucket"))
    return a.exceptAll(b)


@query(
    "sort_keyset_pagination",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE (o_totalprice, o_orderkey) > (
      SELECT (o_totalprice, o_orderkey) FROM orders
      ORDER BY o_totalprice, o_orderkey LIMIT 1 OFFSET 99
    )
    ORDER BY o_totalprice, o_orderkey
    LIMIT 50
    """,
)
def sort_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination (#40 cont.): page 3 of the
    (o_totalprice, o_orderkey) order fetched by WHERE key > last-seen-key
    + LIMIT, not OFFSET — OFFSET n scans and discards n rows EVERY page
    (O(n^2) to walk a 100 TB result; on a sorted/Z-ordered layout the
    keyset predicate instead prunes at the scan). The demo derives the
    boundary key from the previous page deterministically; Spark plans
    the page fetch as TakeOrderedAndProject over the filtered scan — no
    global sort (plan-asserted class, same as limit_topk). The tuple
    comparison decomposes to (p > b_p) OR (p = b_p AND k > b_k) for
    engines without row-value syntax."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    # boundary = last row of page 2 (rows 0-99), computed the keyset way:
    # the previous page's final key arrives from the client; here derived
    # in-plan for determinism.
    boundary = (
        o.orderBy("o_totalprice", "o_orderkey")
        .limit(100)
        .orderBy(F.desc("o_totalprice"), F.desc("o_orderkey"))
        .limit(1)
        .select(
            F.col("o_totalprice").alias("b_price"), F.col("o_orderkey").alias("b_key")
        )
    )
    page = (
        o.crossJoin(F.broadcast(boundary))
        .filter(
            (F.col("o_totalprice") > F.col("b_price"))
            | (
                (F.col("o_totalprice") == F.col("b_price"))
                & (F.col("o_orderkey") > F.col("b_key"))
            )
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_totalprice", "o_orderkey")
        .limit(50)
    )
    return page


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT c_custkey, big_balance
    FROM (
      SELECT c_custkey,
             CASE WHEN c_acctbal > 5000 THEN c_acctbal ELSE NULL END AS big_balance
      FROM customer
    )
    ORDER BY big_balance DESC NULLS LAST, c_custkey
    LIMIT 50
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in ORDER BY (#39 cont.): engines disagree
    by DEFAULT (Spark sorts NULLS FIRST ascending / LAST descending;
    Postgres the opposite for ASC) — any migrated ORDER BY with nullable
    keys silently reorders unless NULLS FIRST/LAST is spelled out. This
    query pins the explicit form: DESC NULLS LAST with a deterministic
    tiebreak, hash-checked so a default-semantics regression on either
    side fails loudly.

    Plan is TakeOrderedAndProject (per-partition top-k, merge on the
    driver), same as limit_topk — the NULL placement rides the sort key
    comparator, costing nothing."""
    c = T(spark, sf_dir, "customer")
    big = F.when(F.col("c_acctbal") > 5000, F.col("c_acctbal")).otherwise(F.lit(None))
    return (
        c.select("c_custkey", big.alias("big_balance"))
        .orderBy(F.desc_nulls_last("big_balance"), F.asc("c_custkey"))
        .limit(50)
    )


@query(
    "sort_global_rank_twophase",
    oracle="""
    SELECT c_custkey, c_acctbal,
           ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS global_rank
    FROM customer
    QUALIFY global_rank <= 100
    """,
)
def sort_global_rank_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ranking WITHOUT a single-partition window (#39 cont.) —
    the two-phase formulation every 'global Window.orderBy collapses to
    one partition' caveat in this repo points at, implemented and
    hash-checked against the engine's own ROW_NUMBER:

      phase 1: repartitionByRange on the sort key — each of P partitions
               holds a contiguous key range, ranked locally;
      phase 2: per-partition row counts (P rows) become cumulative
               offsets via a window over P rows; global_rank = offset of
               my range + local rank.

    The result is invariant to WHERE the sampled range boundaries fall —
    only the per-partition offsets change, not the arithmetic — so the
    nondeterminism of range sampling never reaches the output. At 100 TB
    this is how global ranks/percentiles actually ship: the only
    all-data operations are one range exchange and per-partition sorts;
    everything global is a P-row table. (The local-rank window keys on
    the materialized partition id column, so its exchange moves each
    range as a unit; the single-partition step touches P rows, not
    rows-of-data.) Output limited to the top 100 for a bounded check."""
    from pyspark.sql.window import Window

    c = T(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranged = (
        c.repartitionByRange(8, F.desc("c_acctbal"), F.asc("c_custkey"))
        .withColumn("pid", F.spark_partition_id())
    )
    local = ranged.withColumn(
        "local_rank",
        F.row_number().over(
            Window.partitionBy("pid").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        ),
    )
    counts = local.groupBy("pid").agg(F.count("*").alias("cnt"))
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("pid", "offset")
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            "c_custkey",
            "c_acctbal",
            (F.col("offset") + F.col("local_rank")).alias("global_rank"),
        )
        .filter(F.col("global_rank") <= 100)
    )
