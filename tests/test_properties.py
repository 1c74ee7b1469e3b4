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


# as-of join law: our union+window formulation must agree with pandas
# merge_asof (an independent reference implementation) on arbitrary
# key/timestamp data — backward direction, ties match (>=).
_asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1_000)), min_size=1, max_size=20
)
_asof_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1_000), st.integers(-5, 5)),
    min_size=0,
    max_size=20,
)


@given(left=_asof_left, right=_asof_right)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    import pandas as pd

    from mdb_to_postgres_spark.operators.asof import asof_join

    # deterministic: dedupe (key, ts) on the right so "the matched row" is
    # unique (merge_asof picks the last of equal timestamps; our window
    # picks the one surviving row — identical only without ties)
    seen = set()
    right_u = []
    for k, ts, v in right:
        if (k, ts) not in seen:
            seen.add((k, ts))
            right_u.append((k, ts, v))
    lid = [(i, k, ts) for i, (k, ts) in enumerate(left)]
    ldf = spark.createDataFrame(lid, "lid int, k int, lts long")
    rdf = spark.createDataFrame(
        right_u or [(99, -1, 0)], "k int, rts long, payload int"
    )  # sentinel row for the empty case (key 99 never matches)
    got = {
        r.lid: (r.r_rts, r.r_payload)
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
            right_cols=["rts", "payload"],
        ).collect()
    }

    lpdf = pd.DataFrame(lid, columns=["lid", "k", "lts"]).sort_values("lts")
    rpdf = pd.DataFrame(
        right_u or [(99, -1, 0)], columns=["k", "rts", "payload"]
    ).sort_values("rts")
    merged = pd.merge_asof(
        lpdf, rpdf, left_on="lts", right_on="rts", by="k", direction="backward"
    )
    for row in merged.itertuples():
        want = (
            None if pd.isna(row.rts) else int(row.rts),
            None if pd.isna(row.payload) else int(row.payload),
        )
        assert got[row.lid] == want, (row.lid, got[row.lid], want)


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_sanitize_identifier_laws(name):
    """The Access->Postgres identifier convention, as laws: the output is
    always a legal lowercase SQL identifier, and the mapping is
    idempotent (re-sanitizing a sanitized name is a no-op — the property
    that makes re-running a migration safe)."""
    from mdb_to_postgres_spark.etl.typemap import sanitize_identifier as s

    out = s(name)
    import re
    assert re.fullmatch(r"[a-z_][a-z0-9_]*", out), (name, out)
    assert "__" not in out
    assert s(out) == out, (name, out, s(out))


@given(st.integers(min_value=0, max_value=65535), st.integers(min_value=0, max_value=65535))
@settings(max_examples=300, deadline=None)
def test_morton_interleave_is_bijective(x, y):
    """The Z-order bit interleave (operators/physical.py::_morton_sql) in
    pure-Python mirror form: deinterleaving recovers both coordinates
    exactly, so Morton sorting never conflates distinct key pairs."""
    m = sum(((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1) for b in range(16))
    rx = sum(((m >> (2 * b)) & 1) << b for b in range(16))
    ry = sum(((m >> (2 * b + 1)) & 1) << b for b in range(16))
    assert (rx, ry) == (x, y)
