"""Skew-mitigation operators (SURVEY.md §2 rows 71-72).

AQE's skew-join splitting handles most skew automatically (session factory
enables it), but two manual techniques remain necessary at 100 TB — when a
single join/group key carries a double-digit percentage of the data and
even a split partition overwhelms one task:

- **salted join**: the probe side scatters each hot key across S salt
  buckets with a deterministic per-row salt; the build side replicates each
  key S times (explode) so every (key, salt) bucket finds its match. The
  shuffle spreads a hot key over S tasks instead of one.
- **salted two-phase aggregation**: partial-aggregate on (key, salt), then
  final-aggregate on key. The first shuffle spreads hot keys; the second
  moves only S pre-aggregated rows per key.

Both are RESULT-IDENTICAL to their unsalted forms — the salt is an
execution detail that cancels out — so both are hash-checked against the
plain SQL. The per-row salt is ``xxhash64(row id) % S``: deterministic,
uniform, and never read from RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import T

_SALTS = 8


@query(
    "join_skew_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, o.o_orderstatus
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 150000
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: probe rows carry salt = xxhash64(line id) % S;
    the (filtered) build side is exploded across all S salts and the join
    key becomes (orderkey, salt). Same rows out as the plain join."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        (F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALTS))).alias("salt"),
    )
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_orderstatus")
        .withColumn("salt", F.explode(F.array([F.lit(s) for s in range(_SALTS)])))
    )
    joined = li.join(
        o, (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt), "inner"
    )
    return joined.select("l_orderkey", "l_linenumber", "l_extendedprice", "o_orderstatus")


@query(
    "agg_skew_twophase",
    oracle="""
    SELECT l_suppkey,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty,
           COUNT(*) AS line_cnt,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_price
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def agg_skew_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation: partial sums on (suppkey, salt) spread
    a hot supplier over S tasks; the final pass combines S partials per
    key. Every aggregate re-combines losslessly: SUM/COUNT of integers,
    and the price as DECIMAL(18,2) — exact, order-independent addition, so
    two-phase ≡ one-phase bit-for-bit (a double sum would expose addition
    order). The oracle sums the same decimal."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALTS)).alias("salt"),
    )
    partial = li.groupBy("l_suppkey", "salt").agg(
        F.sum("l_quantity").alias("p_qty"),
        F.count("*").alias("p_cnt"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("p_price"),
    )
    final = partial.groupBy("l_suppkey").agg(
        F.sum("p_qty").cast("long").alias("total_qty"),
        F.sum("p_cnt").alias("line_cnt"),
        F.round(F.sum("p_price"), 2).cast("double").alias("total_price"),
    )
    return final
