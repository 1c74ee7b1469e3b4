"""Skew-mitigation operators must be execution-detail-only: salted forms
return EXACTLY the rows of their unsalted equivalents, and the salt must
actually appear in the shuffle keys (else it's dead code)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mdb_to_postgres_spark.registry import QUERIES, load_all
from tests.conftest import ORACLE_SF

load_all()


def test_salted_join_equals_plain_join(spark):
    from mdb_to_postgres_spark.sources.tables import T

    salted = QUERIES["join_skew_salted"](spark, ORACLE_SF)
    li = T(spark, ORACLE_SF, "lineitem")
    o = T(spark, ORACLE_SF, "orders").filter(F.col("o_totalprice") > 150000)
    plain = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "o_orderstatus"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_agg_equals_plain_agg(spark):
    from mdb_to_postgres_spark.sources.tables import T

    two_phase = QUERIES["agg_skew_twophase"](spark, ORACLE_SF)
    plain = (
        T(spark, ORACLE_SF, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum("l_quantity").cast("long").alias("total_qty"),
            F.count("*").alias("line_cnt"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_price"),
        )
    )
    assert two_phase.exceptAll(plain).count() == 0
    assert plain.exceptAll(two_phase).count() == 0


def test_salt_is_in_the_join_key(spark):
    plan = QUERIES["join_skew_salted"](spark, ORACLE_SF)._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan, plan


def test_salted_agg_is_two_shuffles(spark):
    # partial on (key, salt) then final on key: the plan must contain two
    # distinct grouping stages over l_suppkey.
    plan = QUERIES["agg_skew_twophase"](spark, ORACLE_SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan
    assert "salt" in plan, plan
