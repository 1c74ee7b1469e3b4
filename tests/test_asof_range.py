"""Unit tests for the as-of and band join formulations (operators/asof.py)
on hand-built frames where the expected matches are enumerable."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mdb_to_postgres_spark.operators.asof import asof_join, range_join


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            Row(k="u1", lid=1, lts=100),
            Row(k="u1", lid=2, lts=205),
            Row(k="u1", lid=3, lts=50),   # before any right row
            Row(k="u2", lid=4, lts=999),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="u1", rid=10, rts=90),
            Row(k="u1", rid=11, rts=200),
            Row(k="u1", rid=12, rts=205),  # tie with lid=2: >= semantics match
        ]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", right_cols=["rid", "rts"]
    )
    got = {r.lid: (r.r_rid, r.r_rts) for r in out.collect()}
    assert got[1] == (10, 90)      # latest at-or-before 100
    assert got[2] == (12, 205)     # equal timestamp matches (>=)
    assert got[3] == (None, None)  # nothing before
    assert got[4] == (None, None)  # no right rows for key
    assert out.count() == 4        # left-join cardinality preserved


def test_asof_join_inner(spark):
    left = spark.createDataFrame([Row(k="a", lid=1, lts=5), Row(k="a", lid=2, lts=1)])
    right = spark.createDataFrame([Row(k="a", rid=9, rts=3)])
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", right_cols=["rid"], how="inner"
    )
    assert [(r.lid, r.r_rid) for r in out.collect()] == [(1, 9)]


def test_range_join_window_edges(spark):
    left = spark.createDataFrame([Row(k="a", lid=1, lts=1000)])
    right = spark.createDataFrame(
        [
            Row(k="a", rid=1, rts=1000),  # boundary: == lts, included
            Row(k="a", rid=2, rts=1300),  # boundary: == lts + width, included
            Row(k="a", rid=3, rts=1301),  # outside
            Row(k="a", rid=4, rts=999),   # before
            Row(k="b", rid=5, rts=1100),  # wrong key
        ]
    )
    out = range_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", width=F.lit(300)
    )
    assert sorted(r.rid for r in out.collect()) == [1, 2]


def test_range_join_no_duplicate_pairs(spark):
    # A right row in the second bucket of a left row must appear once.
    left = spark.createDataFrame([Row(k="a", lid=1, lts=299)])
    right = spark.createDataFrame([Row(k="a", rid=1, rts=301)])  # next bucket
    out = range_join(left, right, on=["k"], left_ts="lts", right_ts="rts", width=F.lit(300))
    assert out.count() == 1


def test_asof_join_nullable_right_payload(spark):
    """All payload fields must come from the SAME matched right row: a
    legitimately-NULL payload field must NOT be backfilled from an older
    right row (the per-column last(ignorenulls) formulation did exactly
    that; the struct-packed carry is the fix)."""
    left = spark.createDataFrame([Row(k="u1", lid=1, lts=300)])
    right = spark.createDataFrame(
        [
            Row(k="u1", rid=10, tag="old", rts=100),
            # newest match has tag=NULL — the joined row must carry it as
            # NULL, not resurrect 'old' from the earlier row
            Row(k="u1", rid=11, tag=None, rts=200),
        ]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rid", "tag", "rts"],
    )
    row = out.collect()[0]
    assert row.r_rid == 11
    assert row.r_tag is None
    assert row.r_rts == 200


def test_asof_join_inner_keeps_all_null_payload_match(spark):
    """how='inner' must distinguish 'matched a right row whose payload is
    NULL' from 'matched nothing' — the struct carry is non-null whenever a
    right row matched, even if every payload field is NULL."""
    left = spark.createDataFrame([Row(k="a", lid=1, lts=50), Row(k="b", lid=2, lts=50)])
    right = spark.createDataFrame(
        [("a", None, 10)], "k: string, tag: string, rts: long"
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["tag", "rts"], how="inner",
    )
    rows = out.collect()
    assert len(rows) == 1  # key 'b' (no match) dropped, key 'a' kept
    assert rows[0].lid == 1 and rows[0].r_tag is None and rows[0].r_rts == 10
