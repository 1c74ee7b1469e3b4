"""JDBC source/sink tests against embedded Derby — the only JDBC engine in
the image (Derby ships with Spark). Exercises the reference's actual
shape: typed table -> JDBC sink -> partitioned JDBC scan -> compare
(SURVEY.md §2.1 #1/#4/#5)."""

from __future__ import annotations

import pytest

from mdb_to_postgres_spark.sources import jdbc


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def _nation(spark):
    return spark.read.parquet("/root/testdata/sf0.001/nation.parquet")


def test_jdbc_write_and_read(spark, derby_url):
    src = _nation(spark)
    jdbc.write_table(src, derby_url, "nation_copy")
    back = jdbc.read_table(spark, derby_url, "nation_copy")
    assert back.count() == src.count()
    assert sorted(c.lower() for c in back.columns) == sorted(c.lower() for c in src.columns)
    a = {(r.N_NATIONKEY if hasattr(r, "N_NATIONKEY") else r.n_nationkey,
          r.N_NAME if hasattr(r, "N_NAME") else r.n_name) for r in back.collect()}
    b = {(r.n_nationkey, r.n_name) for r in src.collect()}
    assert a == b


def test_jdbc_partitioned_read(spark, derby_url):
    src = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    jdbc.write_table(src, derby_url, "customer_copy")
    back = jdbc.read_partitioned(
        spark, derby_url, "customer_copy", partition_column="c_custkey", num_partitions=4
    )
    # Parallel scan: 4 range-predicate partitions, same content.
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == src.count()


def test_jdbc_full_table_copy(spark, derby_url):
    jdbc.write_table(_nation(spark), derby_url, "nation_src")
    jdbc.full_table_copy_jdbc(
        spark, derby_url, "nation_src", derby_url, "nation_dst",
        partition_column="n_nationkey", num_partitions=2,
    )
    src = jdbc.read_table(spark, derby_url, "nation_src")
    dst = jdbc.read_table(spark, derby_url, "nation_dst")
    assert src.count() == dst.count()
    assert src.subtract(dst).count() == 0 and dst.subtract(src).count() == 0


def test_jdbc_mod_predicates():
    preds = jdbc.predicates_for_mod("hash_col", 4)
    assert len(preds) == 4
    assert preds[0] == "MOD(ABS(hash_col), 4) = 0"
