"""Local mirror of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle, compare row count, column names and
values (order-insensitive, column-name-sorted) — strictly, including float
bit-equality, which is what the driver's value-hash implies.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from mdb_to_postgres_spark import registry
from tests.conftest import ORACLE_SF

registry.load_all()
ORACLE_NAMES = sorted(registry.ORACLES)
ROWS_ONLY_NAMES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, dtypes normalized, rows
    sorted by a stable string key."""
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "<null>"
            # bit-exact float repr
            return v.hex()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            # The driver's canonicalizer sort_values() dies on list cells
            # (round-1 agg_collect: TypeError unhashable type 'list'), so an
            # oracle-checked query must never emit one — fail loudly here
            # instead of silently normalizing and diverging from the driver.
            raise AssertionError(
                "list-valued cell in oracle-checked result; serialize with "
                "concat_ws/array_sort (see agg_collect)"
            )
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    out = df.map(norm_cell)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def _assert_match(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        sample = pd.concat(
            {"spark": a[diff_mask].head(5), "duckdb": b[diff_mask].head(5)}, axis=1
        )
        raise AssertionError(f"{name}: value mismatch; first differing rows:\n{sample}")


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, duck):
    from pyspark.sql.types import ArrayType, MapType, StructType

    fn = registry.QUERIES[name]
    df = fn(spark, ORACLE_SF)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: oracle-checked query returns complex-typed columns "
        f"{complex_cols}; the driver canonicalizer cannot sort them"
    )
    # Systemic anti-pattern guard: row-at-a-time Python UDFs
    # (BatchEvalPython) are banned engine-wide — every Python crossing must
    # be Arrow-vectorized (ArrowEvalPython / mapInPandas / applyInPandas).
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in physical plan"
    )
    spark_pdf = df.toPandas()
    duck_pdf = duck.execute(registry.ORACLES[name]).fetchdf()
    _assert_match(name, spark_pdf, duck_pdf)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(name, spark):
    from pyspark.sql.types import ArrayType, MapType, StructType

    fn = registry.QUERIES[name]
    df = fn(spark, ORACLE_SF)
    # The driver canonicalizes rows-only results with the same pandas sort
    # as oracle-checked ones (round-4 x_multimodal_decode_stub: ndarray
    # cells crashed it), so the complex-type ban applies here too.
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: rows-only query returns complex-typed columns "
        f"{complex_cols}; the driver canonicalizer cannot sort them"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in physical plan"
    )
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
