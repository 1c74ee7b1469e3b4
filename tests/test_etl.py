"""Tier R unit tests: type map, identifier sanitization, cast matrix,
null normalization, copy pipeline round-trip (SURVEY.md §5.2 items 3-4)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mdb_to_postgres_spark.etl.pipeline import (
    cast_frame,
    full_table_copy,
    null_normalize,
    project_rename,
)
from mdb_to_postgres_spark.etl.typemap import (
    JET_TO_POSTGRES,
    JET_TO_SPARK,
    postgres_ddl,
    sanitize_identifier,
)


@pytest.mark.parametrize(
    "raw,clean",
    [
        ("Customer Name", "customer_name"),
        ("  Order#ID  ", "order_id"),
        ("2024 Sales", "c_2024_sales"),
        ("weird!!chars%%", "weird_chars"),
        ("UPPER_CASE", "upper_case"),
        ("", "col"),
        ("___", "col"),
    ],
)
def test_sanitize_identifier(raw, clean):
    assert sanitize_identifier(raw) == clean


def test_type_map_covers_all_jet_types():
    # Every JET type named in SURVEY.md §1.2 maps to both targets.
    for jet in ("bool", "byte", "int", "longint", "float", "double", "currency",
                "numeric", "datetime", "text", "memo", "ole", "guid", "hyperlink"):
        assert jet in JET_TO_POSTGRES
        assert jet in JET_TO_SPARK


def test_postgres_ddl():
    ddl = postgres_ddl("My Table", [("Order ID", "longint"), ("Amount Due", "currency")])
    assert "CREATE TABLE my_table" in ddl
    assert "order_id INTEGER" in ddl
    assert "amount_due NUMERIC(19,4)" in ddl


def test_cast_matrix_edges(spark):
    # JET edge values: bad numerics -> NULL (permissive), currency keeps
    # exact fixed point, '' survives cast (null_normalize handles it).
    df = spark.createDataFrame(
        [
            Row(b="1", i="42", c="19.9999", t="2024-01-31 12:00:00", s="x"),
            Row(b="notbool", i="bad", c="bad", t="bad", s=""),
            Row(b=None, i=None, c=None, t=None, s=None),
        ]
    )
    out = cast_frame(df, {"b": "bool", "i": "longint", "c": "currency", "t": "datetime", "s": "memo"})
    rows = out.collect()
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "boolean", "int", "decimal(19,4)", "timestamp", "string",
    ]
    assert rows[0].i == 42
    assert str(rows[0].c) == "19.9999"
    assert rows[0].t == dt.datetime(2024, 1, 31, 12, 0, 0)
    assert rows[1].i is None and rows[1].c is None and rows[1].t is None
    assert rows[2].i is None


def test_null_normalize(spark):
    jet_zero = dt.datetime(1899, 12, 30)  # JET serial-0 date
    df = spark.createDataFrame(
        [Row(s="", d=jet_zero), Row(s="keep", d=dt.datetime(2024, 1, 1))]
    )
    out = null_normalize(df, empty_string_cols=["s"], zero_date_cols=["d"]).collect()
    assert out[0].s is None and out[0].d is None
    assert out[1].s == "keep" and out[1].d == dt.datetime(2024, 1, 1)


def test_project_rename_sanitizes(spark):
    df = spark.createDataFrame([Row(**{"Order ID": 1, "Total Due": 2.5})])
    out = project_rename(df)
    assert out.columns == ["order_id", "total_due"]


def test_full_table_copy_roundtrip(spark, tmp_path):
    # Round-trip law (§5.2 #4): copy preserves row multiset and schema.
    df = spark.createDataFrame(
        [Row(**{"Key": i, "Val": f"v{i}", "Amount": f"{i}.25"}) for i in range(50)]
    )
    dst = str(tmp_path / "copy_out")
    full_table_copy(df, dst, jet_types={"Amount": "currency"})
    back = spark.read.parquet(dst)
    assert back.columns == ["key", "val", "amount"]
    assert back.count() == 50
    assert back.schema["amount"].dataType == T.DecimalType(19, 4)
    vals = {(r.key, r.val, str(r.amount)) for r in back.collect()}
    assert (7, "v7", "7.2500") in vals
