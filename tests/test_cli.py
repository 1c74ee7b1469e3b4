"""The python -m mdb_to_postgres_spark CLI: the reference tool's
one-command migration UX (tables / schema / migrate) driven end-to-end."""

from __future__ import annotations

import pytest

from mdb_to_postgres_spark.__main__ import main
from tests.conftest import SMOKE_SF


def test_cli_tables_and_schema(spark, capsys):
    assert main(["tables", "--source", SMOKE_SF, "--tables", "region,nation"]) == 0
    out = capsys.readouterr().out
    assert "region\t5 rows" in out and "nation\t25 rows" in out

    assert main(["schema", "--source", SMOKE_SF, "--tables", "region"]) == 0
    out = capsys.readouterr().out
    assert "region.r_regionkey\tint" in out


def test_cli_rejects_unknown_table():
    with pytest.raises(SystemExit):
        main(["tables", "--source", SMOKE_SF, "--tables", "nope"])


def test_cli_migrate_parquet_roundtrip(spark, tmp_path, capsys):
    dest = str(tmp_path / "out")
    assert main(["migrate", "--source", SMOKE_SF, "--dest", dest,
                 "--tables", "region,nation"]) == 0
    got = spark.read.parquet(f"{dest}/nation")
    src = spark.read.parquet(f"{SMOKE_SF}/nation.parquet")
    assert got.count() == src.count()
    assert sorted(got.columns) == sorted(src.columns)


def test_cli_migrate_jdbc_roundtrip(spark, tmp_path, capsys):
    url = f"jdbc:derby:{tmp_path}/clidb;create=true"
    assert main(["migrate", "--source", SMOKE_SF, "--dest", url,
                 "--tables", "region"]) == 0
    back = (
        spark.read.format("jdbc").option("url", url).option("dbtable", "region").load()
    )
    assert back.count() == 5
