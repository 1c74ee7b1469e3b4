"""Property-based laws (SURVEY.md §5.2 item 4), hypothesis-driven.

Each law runs a handful of examples (Spark job per example), generating
small typed tables that exercise the JET edge values the §1.2 matrix calls
out: empty strings vs NULL, the JET zero-date, negative/zero/extreme
numerics, duplicate rows.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mdb_to_postgres_spark.etl.pipeline import null_normalize, project_rename

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_text = st.one_of(st.none(), st.text(alphabet="ab c\tx'\"", max_size=8))
_ints = st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1))
_stamps = st.one_of(
    st.none(),
    st.datetimes(min_value=dt.datetime(1899, 12, 30), max_value=dt.datetime(2038, 1, 1)),
)
_row = st.tuples(st.integers(0, 99), _text, _ints, _stamps)
_rows = st.lists(_row, min_size=0, max_size=25)

_SCHEMA = "id int, txt string, num int, ts timestamp"


@given(rows=_rows)
@settings(**SETTINGS)
def test_copy_preserves_row_multiset(spark, rows):
    """copy(t) ≡ t: the tier-R pipeline (sanitize -> parquet round-trip)
    must preserve the exact row multiset, NULLs and edge values included."""
    import tempfile

    src = spark.createDataFrame(rows, _SCHEMA)
    staged = project_rename(src)
    with tempfile.TemporaryDirectory() as d:
        staged.write.mode("overwrite").parquet(f"{d}/t")
        back = spark.read.parquet(f"{d}/t")
        assert back.exceptAll(staged).count() == 0
        assert staged.exceptAll(back).count() == 0
        assert back.schema == staged.schema


@given(rows=_rows)
@settings(**SETTINGS)
def test_dedup_idempotent(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0
    assert once.count() <= df.count()


@given(rows=_rows)
@settings(**SETTINGS)
def test_filter_split_union_is_identity(spark, rows):
    """union(filter(p), filter(NOT p or p IS NULL)) ≡ id — the law that
    catches three-valued-logic mistakes in predicate handling."""
    df = spark.createDataFrame(rows, _SCHEMA)
    p = F.col("num") > 0
    left = df.filter(p)
    right = df.filter(~p | p.isNull())
    u = left.unionByName(right)
    assert u.exceptAll(df).count() == 0
    assert df.exceptAll(u).count() == 0


@given(rows=_rows)
@settings(**SETTINGS)
def test_null_normalize_idempotent(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    once = null_normalize(df, empty_string_cols=["txt"], zero_date_cols=["ts"])
    twice = null_normalize(once, empty_string_cols=["txt"], zero_date_cols=["ts"])
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0
    # '' never survives
    assert once.filter(F.col("txt") == "").count() == 0


@given(rows=_rows, salts=st.integers(min_value=2, max_value=8))
@settings(**SETTINGS)
def test_salted_agg_equals_plain_for_any_salt_count(spark, rows, salts):
    """Two-phase salted aggregation ≡ one-phase for ANY salt count —
    integer sums re-combine losslessly regardless of how keys scatter."""
    df = spark.createDataFrame(rows, _SCHEMA).withColumn(
        "salt", F.pmod(F.xxhash64("id", F.coalesce("num", F.lit(0))), F.lit(salts))
    )
    partial = df.groupBy("id", "salt").agg(
        F.sum("num").alias("p_sum"), F.count("*").alias("p_cnt")
    )
    two = partial.groupBy("id").agg(
        F.sum("p_sum").alias("total"), F.sum("p_cnt").alias("cnt")
    )
    one = df.groupBy("id").agg(F.sum("num").alias("total"), F.count("*").alias("cnt"))
    assert two.exceptAll(one).count() == 0
    assert one.exceptAll(two).count() == 0
