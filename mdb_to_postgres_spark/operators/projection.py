"""Projection / filter / type coercion / dedup (SURVEY.md §2.2 #9-13).

These are the reference's per-row transform stages (identifier
sanitization, §1.2 casts, sentinel-null mapping) plus the row-filter
surface its Postgres output exposes. All are narrow ops: no shuffle except
dedup, and filters/projections reach the parquet scan via Catalyst
(verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..etl.pipeline import cast_frame, null_normalize
from ..registry import query
from ..sources.tables import T


@query(
    "project_rename",
    oracle="""
    SELECT c_custkey AS custkey,
           c_name AS customer_name,
           c_mktsegment AS market_segment
    FROM customer
    """,
)
def project_rename_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename (#9) — the sanitize step of the copy pipeline.
    Column pruning means the parquet scan reads only these three columns."""
    return T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("market_segment"),
    )


@query(
    "cast_types",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS linenumber_big,
           CAST(TRUNC(l_quantity) AS INTEGER) AS quantity_int,
           CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS quantity_dec,
           CAST(l_returnflag AS VARCHAR) AS returnflag_str,
           strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_day,
           TRY_CAST(l_linestatus AS INTEGER) AS bad_int
    FROM lineitem
    """,
)
def cast_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §1.2 cast matrix in action (#10): widen/narrow numerics, exact
    decimal, timestamp->date, and a permissive bad-value cast ('O'/'F' as
    INTEGER -> NULL, matching TRY_CAST). The double->int oracle wraps
    TRUNC() because Spark's cast truncates toward zero while DuckDB's
    rounds half-to-even — identical on this corpus's integral quantities,
    silently divergent on any fractional value, so the truncation is made
    explicit rather than fixture-dependent."""
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("linenumber_big"),
        F.col("l_quantity").cast("int").alias("quantity_int"),
        F.col("l_quantity").cast("decimal(12,2)").cast("double").alias("quantity_dec"),
        F.col("l_returnflag").cast("string").alias("returnflag_str"),
        F.date_format(F.col("l_shipdate"), "yyyy-MM-dd").alias("ship_day"),
        F.col("l_linestatus").cast("int").alias("bad_int"),
    )


@query(
    "filter_predicate",
    oracle="""
    SELECT * FROM orders
    WHERE o_orderstatus = 'O'
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderdate IS NOT NULL
      AND NOT (o_custkey < 10 OR o_custkey > 100000)
    """,
)
def filter_predicate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary boolean row filter (#11): =, BETWEEN, IN, IS NULL, AND/OR/
    NOT — all pushable to the parquet reader as data-source filters."""
    o = T(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_totalprice").between(1000, 200000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderdate").isNotNull()
        & ~((F.col("o_custkey") < 10) | (F.col("o_custkey") > 100000))
    )


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_name LIKE '%gold%' OR p_type LIKE 'STANDARD%'
    """,
)
def filter_like_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-pattern filter (#11 cont.): prefix patterns push down as
    StringStartsWith; infix as StringContains."""
    p = T(spark, sf_dir, "part")
    return p.select("p_partkey", "p_name", "p_type").filter(
        F.col("p_name").like("%gold%") | F.col("p_type").like("STANDARD%")
    )


@query(
    "null_normalize",
    oracle="""
    SELECT e.event_id,
           NULLIF(e.event_type, '') AS event_type_n,
           CASE WHEN e.value = 0 THEN NULL ELSE e.value END AS value_n
    FROM events e
    """,
)
def null_normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel -> NULL mapping (#12), the reference's ''-vs-NULL load fix."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("")).alias("event_type_n"),
        F.when(F.col("value") == 0, None).otherwise(F.col("value")).alias("value_n"),
    )


@query(
    "dedup_rows",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def dedup_rows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate removal (#13). distinct() is a hash shuffle on all
    columns; partial aggregation dedups map-side first, so shuffled bytes
    are proportional to distinct values, not input rows."""
    return T(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "dedup_rows_subset",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           MIN(c_custkey) AS first_custkey
    FROM customer GROUP BY c_nationkey, c_mktsegment
    """,
)
def dedup_rows_subset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup: one deterministic survivor per key. dropDuplicates([k])
    keeps an arbitrary row, which can't hash-match an oracle, so the
    deterministic form is min-per-key — same shuffle shape."""
    return (
        T(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.min("c_custkey").alias("first_custkey"))
    )


@query(
    "reshape_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def reshape_unpivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape (melt) — the inverse of agg_pivot: the four
    lineitem measures become (measure, val) rows keyed by line identity.
    ``DataFrame.unpivot`` is a narrow Expand: each input row emits one row
    per measure in-place, no shuffle and no Python — the plan is a single
    scan + Expand + (pushed) projection, so it scales as a map-only stage
    at any corpus size. The oracle spells the same reshape as UNION ALL."""
    return T(spark, sf_dir, "lineitem").unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


def etl_pipeline_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed tier-R pipeline (scan->cast->normalize), used by tests."""
    e = T(spark, sf_dir, "events")
    e = cast_frame(e, {"event_id": "longint", "value": "double", "props": "memo"})
    return null_normalize(e, empty_string_cols=["event_type"])
