"""SQL-text entry point (SURVEY.md §3.2 E2): the classic decision-support
query shapes run as ONE ANSI SQL string that is simultaneously the Spark
query (``spark.sql`` over temp views of the corpus tables) and the DuckDB
oracle — the strongest possible parity statement, since there is no
translation step left to get wrong.

Dialect discipline: timestamp literals, DECIMAL casts, and the exact
decimal revenue/charge fragments (functions/compat.py) are the ANSI subset
both engines parse identically; every aggregate is decimal-accumulated and
cast to DOUBLE at the end so float summation order cannot diverge.

Scale notes (same plans a 100 TB run wants):
- Q1 shape: single scan + partial/final HashAggregate on a 6-group key.
- Q3 shape: segment-filtered customer dim broadcasts into orders, the
  join result shuffles once on orderkey against lineitem; top-10 is
  TakeOrderedAndProject (no global sort).
- Q5 shape: region/nation/supplier dims broadcast; the two fact tables
  meet on one orderkey shuffle; final agg is per-nation (25 groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources.tables import T
from ..functions.compat import REVENUE_EXPR, CHARGE_EXPR

_D = "DECIMAL(18,2)"


def _views(spark: SparkSession, sf_dir: str, tables: list[str]) -> None:
    for t in tables:
        T(spark, sf_dir, t).createOrReplaceTempView(t)


_Q1 = f"""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS {_D})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {_D})) AS DOUBLE) AS sum_base_price,
           CAST(SUM({REVENUE_EXPR}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({CHARGE_EXPR}) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS {_D})) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS {_D})) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS {_D})) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@query("sql_q1_pricing_summary", oracle=_Q1)
def sql_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape through the SQL entry point: the oracle string IS the
    executed query."""
    _views(spark, sf_dir, ["lineitem"])
    return spark.sql(_Q1)


_Q3 = f"""
    SELECT l.l_orderkey,
           CAST(SUM({REVENUE_EXPR.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
"""


@query("sql_q3_shipping_priority", oracle=_Q3)
def sql_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (top unshipped orders by revenue) through the SQL
    entry point; deterministic orderkey tiebreak under LIMIT."""
    _views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(_Q3)


_Q5 = f"""
    SELECT n.n_name,
           CAST(SUM({REVENUE_EXPR.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
"""


@query("sql_q5_local_supplier_volume", oracle=_Q5)
def sql_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (regional same-nation supplier revenue) through the
    SQL entry point: three broadcast dims + one fact-fact shuffle."""
    _views(
        spark, sf_dir,
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    )
    return spark.sql(_Q5)


_Q10 = f"""
    SELECT c.c_custkey,
           c.c_name,
           CAST(SUM({REVENUE_EXPR.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue,
           c.c_acctbal,
           n.n_name,
           c.c_mktsegment
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


@query("sql_q10_returned_items", oracle=_Q10)
def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (top customers by returned-item revenue) through the
    SQL entry point; top-20 with deterministic custkey tiebreak."""
    _views(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    return spark.sql(_Q10)


_Q18 = f"""
    SELECT c.c_name,
           c.c_custkey,
           o.o_orderkey,
           o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS {_D})) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS {_D})) AS DOUBLE) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@query("sql_q18_large_orders", oracle=_Q18)
def sql_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (customers behind very large orders): IN-subquery
    with HAVING over the fact table, decorrelated by Catalyst into a
    semi-join against the pre-aggregated orderkeys."""
    _views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(_Q18)


_Q6 = f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS {_D}) * CAST(l_discount AS {_D}))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
"""


@query("sql_q6_forecast_revenue", oracle=_Q6)
def sql_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+global agg — every predicate must
    reach the parquet reader (plan test asserts shipdate/quantity in
    PushedFilters), so at 100 TB the scan reads only the year's row
    groups. No shuffle at all: partial sums merge in one final stage."""
    _views(spark, sf_dir, ["lineitem"])
    return spark.sql(_Q6)


_Q14 = f"""
    SELECT CAST(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN CAST(l_extendedprice AS {_D})
                                       * (1 - CAST(l_discount AS {_D}))
                                  ELSE CAST(0 AS {_D}) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS {_D})
                      * (1 - CAST(l_discount AS {_D}))) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@query("sql_q14_promo_effect", oracle=_Q14)
def sql_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: month-filtered fact joins the part dim (broadcast
    at any realistic dim/fact ratio), conditional decimal sums, one final
    divide — decimal accumulation keeps the ratio order-independent."""
    _views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_Q14)


_Q16 = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
"""


@query("sql_q16_supplier_parts", oracle=_Q16)
def sql_q16_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN anti-subquery against the supplier dim
    (null-aware anti-join — Catalyst plans a broadcast NAAJ since the
    subquery side is dim-sized), IN-list + inequality dim filters, and a
    grouped COUNT(DISTINCT) whose expand shuffles only the surviving
    join output."""
    _views(spark, sf_dir, ["lineitem", "part", "supplier"])
    return spark.sql(_Q16)


_Q19 = f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS {_D})
                    * (1 - CAST(l_discount AS {_D}))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
"""


@query("sql_q19_discounted_revenue", oracle=_Q19)
def sql_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive mixed-table predicates over an
    equi-join. The join key stays an equi-join (hash/broadcast) with the
    OR-of-conjunctions as a residual filter — never a nested loop; the
    single-table arms of the disjunction (quantity ranges, brand/size)
    still prune at each scan."""
    _views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_Q19)
