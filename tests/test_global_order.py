"""functions/global_order.py — the clustered-bucket substrate must
reproduce Spark's own global-window results bit-for-bit, because eight
registered queries route their global ROW_NUMBER / running-sum / NTILE
through it. Checked against the engine's single-partition form on real
tables, and the plan contract (ONE hash exchange, no range exchange, no
join, no SinglePartition over data) is asserted, not assumed."""

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
    order = [("c_acctbal", "asc"), ("c_custkey", "asc")]
    two = global_row_number(c, order, "rn", total_col="n").toPandas()
    ref = c.select(
        "c_custkey",
        F.row_number()
        .over(Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey")))
        .alias("rn"),
    ).toPandas()
    assert two.n.nunique() == 1 and two.n.iloc[0] == len(ref)
    merged = two.merge(ref, on="c_custkey", suffixes=("", "_ref"))
    assert len(merged) == len(ref)
    assert (merged.rn == merged.rn_ref).all()


def test_global_cumsum_exclusive_matches_window(spark):
    o = T(spark, ORACLE_SF, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("p")
    )
    order = [("o_orderkey", "asc")]
    two = global_cumsum(o, order, F.col("p"), "prior").toPandas()
    w = Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, -1)
    ref = o.select(
        "o_orderkey", F.coalesce(F.sum("p").over(w), F.lit(0)).alias("prior")
    ).toPandas()
    merged = two.merge(ref, on="o_orderkey", suffixes=("", "_ref"))
    assert len(merged) == len(ref)
    assert (merged.prior == merged.prior_ref).all()


def test_global_cumsum_ties_on_leading_key(spark):
    # Heavy duplicate leading keys (o_orderpriority: 5 distinct values
    # across 15k orders) must all land in one bucket per value, so the
    # tie-breaking suffix stays bucket-local and the cumsum is exact.
    o = T(spark, ORACLE_SF, "orders").select(
        "o_orderkey", (F.col("o_orderkey") % 5).alias("grp")
    )
    order = [("grp", "asc"), ("o_orderkey", "asc")]
    two = global_row_number(o, order, "rn").toPandas()
    ref = o.select(
        "o_orderkey",
        F.row_number()
        .over(Window.orderBy(F.asc("grp"), F.asc("o_orderkey")))
        .alias("rn"),
    ).toPandas()
    merged = two.merge(ref, on="o_orderkey", suffixes=("", "_ref"))
    assert len(merged) == len(ref)
    assert (merged.rn == merged.rn_ref).all()


def test_ntile_formula_matches_engine_all_remainders(spark):
    # k=7 over n=1500 customers (1500 % 7 = 2: fat and thin tiles both
    # occur), plus k=4; and n < k via a filtered frame.
    c = T(spark, ORACLE_SF, "customer").select("c_custkey")
    order = [("c_custkey", "asc")]
    for k, frame in ((7, c), (4, c), (7, c.filter(F.col("c_custkey") <= 3))):
        two = (
            global_row_number(frame, order, "rn", total_col="n")
            .withColumn("t", ntile_from_rn("rn", "n", k))
            .toPandas()
        )
        ref = frame.select(
            "c_custkey",
            F.ntile(k).over(Window.orderBy(F.asc("c_custkey"))).alias("t"),
        ).toPandas()
        merged = two.merge(ref, on="c_custkey", suffixes=("", "_ref"))
        assert len(merged) == len(ref)
        assert (merged.t == merged.t_ref).all(), k


def test_global_row_number_desc_order(spark):
    c = T(spark, ORACLE_SF, "customer").select("c_custkey", "c_acctbal")
    order = [("c_acctbal", "desc"), ("c_custkey", "asc")]
    two = global_row_number(c, order, "rn").toPandas()
    ref = c.select(
        "c_custkey",
        F.row_number()
        .over(Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey")))
        .alias("rn"),
    ).toPandas()
    merged = two.merge(ref, on="c_custkey", suffixes=("", "_ref"))
    assert (merged.rn == merged.rn_ref).all()


def test_single_hash_exchange_no_join(spark):
    # THE plan contract that replaced round 7's range/_PID design: the
    # final plan moves the data exactly once — one hash exchange on the
    # deterministic bucket column that also satisfies the window's
    # clustering — with no range exchange, no broadcast join for the
    # offsets (they are literals), and no SinglePartition exchange over
    # the data stream.
    c = T(spark, ORACLE_SF, "customer").select("c_custkey")
    df = global_row_number(c, [("c_custkey", "asc")], "rn")
    plan = df._jdf.queryExecution().executedPlan().toString()
    low = plan.lower()
    assert low.count("exchange") == 1, plan
    assert "hashpartitioning(__go_bucket" in low, plan
    assert "rangepartitioning" not in low, plan
    assert "singlepartition" not in low, plan
    assert "join" not in low, plan


def test_build_actions_cached_within_session(spark):
    # The round-9 memo: re-invoking a substrate call with the SAME logical
    # input and signature must not re-run the two build actions (quantile
    # boundaries + per-bucket totals) — that re-computation was the whole
    # round-8 sf0.1 regression. A semantically DIFFERENT input must miss
    # and still be exact.
    import mdb_to_postgres_spark.functions.global_order as go

    c = T(spark, ORACLE_SF, "customer").select("c_custkey", "c_acctbal")
    order = [("c_acctbal", "asc"), ("c_custkey", "asc")]
    first = global_row_number(c, order, "rn").toPandas().sort_values("c_custkey")
    m0 = go._BUILD_MISSES
    # same builder path a registered query takes on a warm re-run: a fresh
    # DataFrame object with fresh expression ids but identical semantics
    c2 = T(spark, ORACLE_SF, "customer").select("c_custkey", "c_acctbal")
    again = global_row_number(c2, order, "rn").toPandas().sort_values("c_custkey")
    assert go._BUILD_MISSES == m0, "warm call re-ran the build actions"
    assert (first.rn.values == again.rn.values).all()
    # different logical input -> miss, and the result is exact for THAT input
    f = c.filter(F.col("c_acctbal") > 0)
    sub = global_row_number(f, order, "rn").toPandas()
    assert go._BUILD_MISSES > m0, "filtered input silently reused stale artifacts"
    ref = f.select(
        "c_custkey",
        F.row_number()
        .over(Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey")))
        .alias("rn"),
    ).toPandas()
    merged = sub.merge(ref, on="c_custkey", suffixes=("", "_ref"))
    assert len(merged) == len(ref) and (merged.rn == merged.rn_ref).all()


def test_plan_contract_and_exactness_at_1024_buckets(spark):
    # The module's own advice is to raise num_buckets with cluster
    # parallelism; the old when()-chain bucket id made that walk into the
    # measured Janino codegen cliff. The higher-order-filter form must keep
    # the exact results AND the one-exchange plan at B=1024 (codegen size
    # is constant in B).
    c = T(spark, ORACLE_SF, "customer").select("c_custkey", "c_acctbal")
    order = [("c_acctbal", "asc"), ("c_custkey", "asc")]
    df = global_row_number(c, order, "rn", num_buckets=1024)
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert plan.count("exchange") == 1, plan
    assert "hashpartitioning(__go_bucket" in plan, plan
    assert "singlepartition" not in plan and "join" not in plan, plan
    got = df.toPandas()
    ref = c.select(
        "c_custkey",
        F.row_number()
        .over(Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey")))
        .alias("rn"),
    ).toPandas()
    merged = got.merge(ref, on="c_custkey", suffixes=("", "_ref"))
    assert len(merged) == len(ref) and (merged.rn == merged.rn_ref).all()


def test_global_row_number_specs_matches_three_windows(spark):
    # The shared-build multi-spec form (the RFM shape): three INDEPENDENT
    # total orders over one entity table must each reproduce the engine's
    # single-partition row_number, while paying the quantile pass and the
    # per-bucket counts job ONCE for all three.
    from mdb_to_postgres_spark.functions.global_order import (
        global_row_number_specs,
    )

    c = T(spark, ORACLE_SF, "customer").select(
        "c_custkey", "c_acctbal", (F.col("c_custkey") % 7).alias("grp")
    )
    specs = [
        ([("c_acctbal", "desc"), ("c_custkey", "asc")], "rn_a"),
        ([("grp", "asc"), ("c_custkey", "asc")], "rn_b"),
        ([("c_custkey", "asc")], "rn_c"),
    ]
    got = global_row_number_specs(c, specs, total_col="n").toPandas()
    ref = c.select(
        "c_custkey",
        F.row_number()
        .over(Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey")))
        .alias("rn_a"),
        F.row_number()
        .over(Window.orderBy(F.asc("grp"), F.asc("c_custkey")))
        .alias("rn_b"),
        F.row_number().over(Window.orderBy(F.asc("c_custkey"))).alias("rn_c"),
    ).toPandas()
    assert got.n.nunique() == 1 and got.n.iloc[0] == len(ref)
    merged = got.merge(ref, on="c_custkey", suffixes=("", "_ref"))
    assert len(merged) == len(ref)
    for col in ("rn_a", "rn_b", "rn_c"):
        assert (merged[col] == merged[f"{col}_ref"]).all(), col


def test_global_row_number_specs_bucket_key_escape_hatch(spark):
    # ADVICE r8: a low-cardinality leading key (5 distinct values) collapses
    # most rows into a few buckets. The optional per-spec bucket_key — an
    # ascending-monotone composite of (key, tiebreak) — must spread buckets
    # WITHOUT changing results; mixing plain and bucket-keyed specs in one
    # call must also work.
    from mdb_to_postgres_spark.functions.global_order import (
        global_row_number_specs,
    )

    c = T(spark, ORACLE_SF, "customer").select(
        "c_custkey", "c_acctbal", (F.col("c_custkey") % 5).alias("grp")
    )
    composite = F.col("grp") * F.lit(2**42) + F.col("c_custkey")
    specs = [
        ([("grp", "asc"), ("c_custkey", "asc")], "rn_a", composite),
        ([("c_acctbal", "asc"), ("c_custkey", "asc")], "rn_b"),
    ]
    got = global_row_number_specs(c, specs).toPandas()
    ref = c.select(
        "c_custkey",
        F.row_number()
        .over(Window.orderBy(F.asc("grp"), F.asc("c_custkey")))
        .alias("rn_a"),
        F.row_number()
        .over(Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey")))
        .alias("rn_b"),
    ).toPandas()
    merged = got.merge(ref, on="c_custkey", suffixes=("", "_ref"))
    assert len(merged) == len(ref)
    for col in ("rn_a", "rn_b"):
        assert (merged[col] == merged[f"{col}_ref"]).all(), col
    # the composite actually spreads the exchange: >5 distinct buckets
    from mdb_to_postgres_spark.functions.global_order import _bucket_expr
    import mdb_to_postgres_spark.functions.global_order as go

    bounds = c.select(composite.cast("double").alias("k")).stat.approxQuantile(
        "k", [i / 64 for i in range(1, 64)], 0.001
    )
    n_buckets = (
        c.select(_bucket_expr(composite, False, bounds).alias("b"))
        .distinct()
        .count()
    )
    assert n_buckets > 5, n_buckets


def test_global_row_number_specs_plan_contract(spark):
    # S specs → exactly S hash exchanges on the bucket column in the final
    # plan (one per independent clustering), still no range exchange, no
    # join, no SinglePartition over the data stream.
    from mdb_to_postgres_spark.functions.global_order import (
        global_row_number_specs,
    )

    c = T(spark, ORACLE_SF, "customer").select("c_custkey", "c_acctbal")
    df = global_row_number_specs(
        c,
        [
            ([("c_acctbal", "asc"), ("c_custkey", "asc")], "rn_a"),
            ([("c_custkey", "desc")], "rn_b"),
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    low = plan.lower()
    assert low.count("exchange") == 2, plan
    assert low.count("hashpartitioning(__go_bucket") == 2, plan
    assert "rangepartitioning" not in low, plan
    assert "singlepartition" not in low, plan
    assert "join" not in low, plan
