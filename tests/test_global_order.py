"""functions/global_order.py — the two-phase substrate must reproduce
Spark's own global-window results bit-for-bit, because eight registered
queries now route their global ROW_NUMBER / running-sum / NTILE through
it. Checked against the engine's single-partition form on real tables."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mdb_to_postgres_spark.functions.global_order import (
    global_cumsum,
    global_row_number,
    ntile_from_rn,
)
from mdb_to_postgres_spark.sources.tables import T
from tests.conftest import ORACLE_SF


def test_global_row_number_matches_window(spark):
    c = T(spark, ORACLE_SF, "customer").select("c_custkey", "c_acctbal")
    order = [F.asc("c_acctbal"), F.asc("c_custkey")]
    two = global_row_number(c, order, "rn", total_col="n").toPandas()
    ref = c.select(
        "c_custkey",
        F.row_number().over(Window.orderBy(*order)).alias("rn"),
    ).toPandas()
    assert two.n.nunique() == 1 and two.n.iloc[0] == len(ref)
    merged = two.merge(ref, on="c_custkey", suffixes=("", "_ref"))
    assert len(merged) == len(ref)
    assert (merged.rn == merged.rn_ref).all()


def test_global_cumsum_exclusive_matches_window(spark):
    o = T(spark, ORACLE_SF, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("p")
    )
    order = [F.asc("o_orderkey")]
    two = global_cumsum(o, order, F.col("p"), "prior").toPandas()
    w = Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, -1)
    ref = o.select(
        "o_orderkey", F.coalesce(F.sum("p").over(w), F.lit(0)).alias("prior")
    ).toPandas()
    merged = two.merge(ref, on="o_orderkey", suffixes=("", "_ref"))
    assert len(merged) == len(ref)
    assert (merged.prior == merged.prior_ref).all()


def test_ntile_formula_matches_engine_all_remainders(spark):
    # k=7 over n=1500 customers (1500 % 7 = 2: fat and thin tiles both
    # occur), plus k=4; and n < k via a filtered frame.
    c = T(spark, ORACLE_SF, "customer").select("c_custkey")
    order = [F.asc("c_custkey")]
    for k, frame in ((7, c), (4, c), (7, c.filter(F.col("c_custkey") <= 3))):
        two = (
            global_row_number(frame, order, "rn", total_col="n")
            .withColumn("t", ntile_from_rn("rn", "n", k))
            .toPandas()
        )
        ref = frame.select(
            "c_custkey", F.ntile(k).over(Window.orderBy(*order)).alias("t")
        ).toPandas()
        merged = two.merge(ref, on="c_custkey", suffixes=("", "_ref"))
        assert len(merged) == len(ref)
        assert (merged.t == merged.t_ref).all(), k


def test_global_row_number_desc_order(spark):
    c = T(spark, ORACLE_SF, "customer").select("c_custkey", "c_acctbal")
    order = [F.desc("c_acctbal"), F.asc("c_custkey")]
    two = global_row_number(c, order, "rn").toPandas()
    ref = c.select(
        "c_custkey", F.row_number().over(Window.orderBy(*order)).alias("rn")
    ).toPandas()
    merged = two.merge(ref, on="c_custkey", suffixes=("", "_ref"))
    assert (merged.rn == merged.rn_ref).all()


def test_no_single_partition_exchange_over_data(spark):
    # the point of the substrate: the only SinglePartition exchange feeds
    # the P-row offsets window, never the data-sized stream. Assert the
    # data path goes through a range exchange.
    c = T(spark, ORACLE_SF, "customer").select("c_custkey")
    df = global_row_number(c, [F.asc("c_custkey")], "rn")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
