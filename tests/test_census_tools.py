"""The census tooling is load-bearing evidence machinery (like the
registry rotation and the bench payload, both tested): a comparator bug
records false greens, a status bug records a real mismatch as
'did not complete'. So the round-12 additions — the banded full-value
comparator for >20M-row outputs and the consolidator's fail status — are
tested, not assumed."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import consolidate_sf10_census as census  # noqa: E402
from tools import driver_sim  # noqa: E402


# ---------------------------------------------------------------- status_of

def test_status_pass():
    assert census.status_of({"hash_match": True}) == "pass"


def test_status_rows_only():
    assert census.status_of({"err": "no_oracle", "spark_rows": 5}) == "rows-only"


def test_status_rows_schema():
    r = {"err": "hash_skipped_gt20000000: ...", "rows_match": True, "schema_match": True}
    assert census.status_of(r) == "rows+schema"


def test_status_fail_on_capped_mismatch():
    # Completed the rows+schema protocol but the counts disagree: a FAIL,
    # not a coverage gap (the round-11 advice finding — the old code fell
    # through to 'not-run' and the never-downgrade rank then let any
    # earlier pass permanently mask it).
    r = {"err": "hash_skipped_gt20000000: ...", "rows_match": False, "schema_match": True}
    assert census.status_of(r) == "fail"


def test_status_fail_on_hash_mismatch():
    # Both sides ran to completion (err empty), values differ.
    r = {"hash_match": False, "rows_match": True, "schema_match": True, "err": None}
    assert census.status_of(r) == "fail"


def test_status_not_run_on_exception():
    assert census.status_of({"err": "OutOfMemoryError: ..."}) == "not-run"
    assert census.status_of({}) == "not-run"


def test_fail_outranks_pass():
    # A surfaced fail must never be silently absorbed by an earlier green.
    assert census.RANK["fail"] > census.RANK["pass"]


# ---------------------------------------------------------------- dtypes

def test_norm_kind_classes():
    import numpy as np

    assert driver_sim._norm_kind(np.dtype("int64")) == "num"
    assert driver_sim._norm_kind(np.dtype("int32")) == "num"
    assert driver_sim._norm_kind(np.dtype("float64")) == "num"
    assert driver_sim._norm_kind(np.dtype("bool")) == "bool"
    assert driver_sim._norm_kind(np.dtype("datetime64[us]")) == "ts"
    assert driver_sim._norm_kind(np.dtype("object")) == "obj"


# ---------------------------------------------------------------- banded

@pytest.fixture()
def band_table(tmp_path):
    # 5k rows, keyed by an int column both engines cast identically.
    pdf = pd.DataFrame(
        {
            "l_orderkey": range(5000),
            "val": [i * 0.5 for i in range(5000)],
            "tag": [f"t{i % 7}" for i in range(5000)],
        }
    )
    path = str(tmp_path / "band.parquet")
    pdf.to_parquet(path)
    return path


def test_banded_compare_matches(spark, band_table):
    con = duckdb.connect()
    sdf = spark.read.parquet(band_table)
    row = driver_sim._banded_compare(
        spark, con,
        sdf, f"SELECT * FROM read_parquet('{band_table}')",
        "l_orderkey", 5000,
    )
    assert row["hash_match"] is True
    assert row["rows_match"] is True
    assert row["schema_match"] is True
    assert row["oracle_rows"] == 5000
    assert row["err"] is None


def test_banded_compare_catches_value_drift(spark, band_table, tmp_path):
    # Same cardinality and schema, ONE value differs — the banded path
    # must still catch it (this is exactly what rows+schema could not).
    pdf = pd.read_parquet(band_table)
    pdf.loc[1234, "val"] = -1.0
    drifted = str(tmp_path / "drift.parquet")
    pdf.to_parquet(drifted)
    con = duckdb.connect()
    sdf = spark.read.parquet(band_table)
    row = driver_sim._banded_compare(
        spark, con,
        sdf, f"SELECT * FROM read_parquet('{drifted}')",
        "l_orderkey", 5000,
    )
    assert row["rows_match"] is True  # cardinality agrees...
    assert row["hash_match"] is False  # ...values do not


def test_banded_compare_catches_missing_rows(spark, band_table, tmp_path):
    pdf = pd.read_parquet(band_table).iloc[:-10]
    short = str(tmp_path / "short.parquet")
    pdf.to_parquet(short)
    con = duckdb.connect()
    sdf = spark.read.parquet(band_table)
    row = driver_sim._banded_compare(
        spark, con,
        sdf, f"SELECT * FROM read_parquet('{short}')",
        "l_orderkey", 5000,
    )
    assert row["rows_match"] is False
    assert row["hash_match"] is False
