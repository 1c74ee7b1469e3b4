"""Property-based laws for the clustered global-order substrate
(functions/global_order.py) — randomized equivalence against Spark's own
single-partition global window, which is the substrate's definitional
reference. Eleven registered queries route global ROW_NUMBER / running
sum / running max / NTILE through it, so the substrate must match the
engine bit-for-bit on ANY input, not just the bench tables the named
tests in test_global_order.py cover.

Deliberately hostile inputs: NULL leading keys (asc -> NULLS FIRST,
desc -> NULLS LAST), negative values, heavy duplicate keys (many rows
per bucket boundary value), inputs far smaller than the bucket count
(empty buckets, degenerate quantile bounds), and both directions. Four
buckets force multi-bucket paths even on tiny inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mdb_to_postgres_spark.functions.global_order import (
    global_cumsum,
    global_cumsum_multi,
    global_row_number,
    global_running_max,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# Leading keys: small domain (forces duplicates across bucket boundaries),
# NULLs included; values: signed ints (negative running sums).
_key = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
_val = st.integers(min_value=-100, max_value=100)
_rows = st.lists(st.tuples(_key, _val), min_size=0, max_size=40)

_SCHEMA = "k int, v int"


def _df(spark, rows):
    # id is the explicit unique tiebreak the substrate contract requires.
    return (
        spark.createDataFrame([(k, v, i) for i, (k, v) in enumerate(rows)],
                              _SCHEMA + ", id int")
        .repartition(4)
    )


def _merged(sub, ref, out):
    m = sub.toPandas().merge(ref.toPandas(), on="id", suffixes=("", "_ref"))
    return m, (m[out].astype("float64").fillna(-1e18)
               == m[f"{out}_ref"].astype("float64").fillna(-1e18)).all()


@given(rows=_rows, direction=st.sampled_from(["asc", "desc"]))
@settings(**SETTINGS)
def test_row_number_matches_global_window(spark, rows, direction):
    df = _df(spark, rows)
    order = [("k", direction), ("id", "asc")]
    sub = global_row_number(df, order, "rn", num_buckets=4)
    sort = [F.asc("k") if direction == "asc" else F.desc("k"), F.asc("id")]
    ref = df.select("id", F.row_number().over(Window.orderBy(*sort)).alias("rn"))
    m, ok = _merged(sub, ref, "rn")
    assert len(m) == len(rows) and ok


@given(rows=_rows, direction=st.sampled_from(["asc", "desc"]))
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_row_number_matches_at_1024_buckets(spark, rows, direction):
    # num_buckets >> rows: almost every bucket empty, degenerate repeated
    # quantile bounds, NULL keys — the constant-codegen bucket expression
    # must stay exact exactly where the old when()-chain would have been a
    # 1024-term codegen cliff.
    df = _df(spark, rows)
    order = [("k", direction), ("id", "asc")]
    sub = global_row_number(df, order, "rn", num_buckets=1024)
    sort = [F.asc("k") if direction == "asc" else F.desc("k"), F.asc("id")]
    ref = df.select("id", F.row_number().over(Window.orderBy(*sort)).alias("rn"))
    m, ok = _merged(sub, ref, "rn")
    assert len(m) == len(rows) and ok


@given(rows=_rows, inclusive=st.booleans())
@settings(**SETTINGS)
def test_cumsum_matches_global_window(spark, rows, inclusive):
    df = _df(spark, rows)
    order = [("k", "asc"), ("id", "asc")]
    sub = global_cumsum(
        df, order, F.col("v"), "cs", inclusive=inclusive, num_buckets=4
    )
    upper = 0 if inclusive else -1
    w = (
        Window.orderBy(F.asc("k"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    ref = df.select("id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("cs"))
    m, ok = _merged(sub, ref, "cs")
    assert len(m) == len(rows) and ok


@given(rows=_rows, inclusive=st.booleans())
@settings(**SETTINGS)
def test_running_max_matches_global_window(spark, rows, inclusive):
    df = _df(spark, rows)
    order = [("k", "asc"), ("id", "asc")]
    sub = global_running_max(
        df, order, F.col("v"), "rm", inclusive=inclusive, num_buckets=4
    )
    upper = 0 if inclusive else -1
    w = (
        Window.orderBy(F.asc("k"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    ref = df.select("id", F.max("v").over(w).alias("rm"))
    m, ok = _merged(sub, ref, "rm")  # NULL rm (first row, exclusive) == NULL ref
    assert len(m) == len(rows) and ok


@given(rows=_rows)
@settings(**SETTINGS)
def test_cumsum_multi_shares_one_exchange_and_matches(spark, rows):
    df = _df(spark, rows)
    order = [("k", "asc"), ("id", "asc")]
    sub = global_cumsum_multi(
        df,
        order,
        [(F.col("v"), "cs"), (F.lit(1), "rn")],
        inclusive=True,
        total_col="tot",
        num_buckets=4,
    )
    w = (
        Window.orderBy(F.asc("k"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref = df.select(
        "id",
        F.sum("v").over(w).alias("cs"),
        F.row_number().over(Window.orderBy(F.asc("k"), F.asc("id"))).alias("rn"),
    )
    m, ok_cs = _merged(sub, ref, "cs")
    _, ok_rn = _merged(sub, ref, "rn")
    assert len(m) == len(rows) and ok_cs and ok_rn
    pdf = sub.toPandas()
    if len(pdf):
        assert (pdf.tot == pdf.v.sum()).all()
    # Shape invariants that hold for EVERY input, degenerate ones
    # included: the offsets are literals (never a join), and there is no
    # range exchange. The strict one-hash-exchange contract is asserted
    # on real tables in test_global_order.py::test_single_hash_exchange_
    # no_join; on degenerate inputs (e.g. all-NULL keys -> empty quantile
    # bounds -> constant bucket) Catalyst legitimately folds the bucket
    # exchange to SinglePartition, which is also the correct physical
    # answer there: a NULL-only order key cannot split.
    plan = sub._jdf.queryExecution().executedPlan().toString().lower()
    assert "join" not in plan, plan
    assert "rangepartitioning" not in plan, plan
