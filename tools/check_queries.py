#!/usr/bin/env python
"""Spot-check named queries against their DuckDB oracles the way the
verification driver does (plain session, sf0.01, pandas canonicalizer +
md5 value hash). Usage: python tools/check_queries.py name [name ...]

tools/driver_sim.py sweeps ALL queries; this is the per-query inner loop
for iterating on one operator without paying the full sweep.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vhash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(pdf.to_csv(index=False, float_format="%.9g").encode()).hexdigest()


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: check_queries.py name [name ...]", file=sys.stderr)
        return 2
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = SparkSession.builder.master("local[8]").appName("check-queries").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = E.queries(), E.oracle_sql()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    rc = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            rc = 1
            continue
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            rc = 1
            continue
        dt = time.perf_counter() - t0
        # the real driver canonicalizes EVERY result — complex-typed cells
        # crash its pandas sort, so surface that here too
        try:
            sh = vhash(sdf)
        except TypeError as e:
            print(f"{name}: CANONICALIZER CRASH ({e})")
            rc = 1
            continue
        if name not in osql:
            print(f"{name}: rows-only, {len(sdf)} rows, {dt:.2f}s")
            continue
        odf = con.execute(osql[name]).df()
        oh = vhash(odf)
        ok = sh == oh and len(sdf) == len(odf)
        status = "OK" if ok else "HASH MISMATCH"
        print(f"{name}: {status} spark={len(sdf)} oracle={len(odf)} {dt:.2f}s")
        if not ok:
            rc = 1
            cols = sorted(sdf.columns)
            print("  spark head:\n", sdf[cols].sort_values(cols).head(5).to_string())
            print("  oracle head:\n", odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).head(5).to_string())
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
