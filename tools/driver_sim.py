#!/usr/bin/env python
"""Local mirror of the verification driver's correctness sweep.

Runs every registered query on a PLAIN SparkSession (driver-style: no
factory tuning — the registry wrapper must do that) against sf0.01, runs
the DuckDB oracle side-by-side, compares rows/schema/value-hash with a
driver-style pandas canonicalizer (which dies on list cells, as the real
one does), and prints per-query wall time so the registration-order
budget can be audited. Usage: python tools/driver_sim.py [sf_dir]
[--only name1,name2] (or a name substring) to check a subset.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


_MULTISET_THRESHOLD = 2_000_000

# Above this, skip the value hash at the sweep's scale point and record
# cardinality + schema only (row-for-row projections; full-hash proof at
# sf1). 20M rows keeps the multiset path under ~1 min/side.
_HASH_ROW_CAP = 20_000_000


def vhash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf) <= _MULTISET_THRESHOLD:
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
        return hashlib.md5(pdf.to_csv(index=False, float_format="%.9g").encode()).hexdigest()
    # Table-sized outputs (sf10 census): the driver-style global sort +
    # one giant CSV string is O(n log n) and >3x frame memory — observed
    # grinding a single 180M-row compare for 30+ minutes at 41 GB RSS.
    # Chunked ORDER-INSENSITIVE multiset hash instead: same row
    # serialization (sorted columns, %.9g floats), then a uint64 sum of
    # pd.util.hash_pandas_object row hashes mod 2^64. Multiset equality
    # == sorted-CSV equality given rows_match checks cardinality
    # separately; only the hash VALUE differs, flagged by the "multiset:"
    # prefix so records are honest about which comparator ran. NOTE:
    # hash_pandas_object's output is an implementation detail — both
    # sides of a census run must hash under the SAME pandas version (they
    # do here: one process), and multiset hashes are not comparable
    # across environments.
    import numpy as np
    import pandas as pd

    total = np.uint64(0)
    for i in range(0, len(pdf), 1_000_000):
        csv = pdf.iloc[i : i + 1_000_000].to_csv(
            index=False, header=False, float_format="%.9g"
        )
        # C-speed deterministic per-row hash over the canonical CSV lines
        # (a Python-level md5 loop ran ~2 us/row — 12+ min for one 180M-row
        # side); uint64 sum wraps mod 2^64, which is the multiset combine.
        with np.errstate(over="ignore"):
            total += pd.util.hash_pandas_object(
                pd.Series(csv.splitlines(), dtype=object), index=False
            ).to_numpy(dtype=np.uint64).sum()
    return f"multiset:{int(total):016x}"


def _norm_kind(dtype) -> str:
    """Collapse a pandas dtype into a comparison class so the giant-path
    schema check can compare TYPES, not just names (round-11 advice: a
    name-only check would let an int-vs-string drift at sf10 record
    rows+schema). Classes are deliberately coarse — nullable ints come
    back float64 from one engine and int64 from the other."""
    k = getattr(dtype, "kind", "O")
    if k in "iuf":
        return "num"
    if k == "b":
        return "bool"
    if k in "mM":
        return "ts"
    return "obj"


# Banded full-value comparator for outputs over the hash cap (round-12,
# verdict item 3): band both sides by the first hex char of
# md5(cast(key)) — md5 is bit-identical across Spark and DuckDB for the
# same string, and integer->string casts agree — then run the ordinary
# vhash comparator per band (each band lands well under the cap, so the
# >20M-row projections get a TRUE value hash at sf10 instead of
# rows+schema). Key must be an integer/string column in the OUTPUT.
_BAND_KEYS = {
    "cast_types": "l_orderkey",
    "join_bucketed_colocated": "l_orderkey",
    "join_skew_salted": "l_orderkey",
    "reshape_unpivot": "l_orderkey",
}
_BAND_CHARS = "0123456789abcdef"


def _banded_compare(spark, con, sdf_lazy, oracle_sql: str, key: str,
                    spark_rows: int) -> dict:
    from pyspark.sql import functions as F

    from mdb_to_postgres_spark import scratch

    row: dict = {"comparator": "banded_md5_16"}
    out_dir = scratch.scratch_dir("bandcmp_")
    try:
        # ONE engine execution, spilled banded to parquet; 16 cheap
        # partition reads after (16 re-executions of the full plan was
        # the naive alternative).
        (
            sdf_lazy.withColumn(
                "_band",
                F.substring(
                    F.md5(F.coalesce(F.col(key).cast("string"), F.lit(""))), 1, 1
                ),
            )
            .write.partitionBy("_band")
            .mode("overwrite")
            .parquet(out_dir)
        )
        con.execute(
            "CREATE OR REPLACE TEMP TABLE _bandcmp AS "
            f"SELECT *, substr(md5(coalesce(CAST({key} AS VARCHAR), '')), 1, 1) AS _band "
            f"FROM ({oracle_sql})"
        )
        oracle_rows = con.execute("SELECT COUNT(*) FROM _bandcmp").fetchone()[0]
        row["oracle_rows"] = oracle_rows
        row["rows_match"] = spark_rows == oracle_rows
        spark_seen = 0
        all_match = True
        schema_ok = True
        for h in _BAND_CHARS:
            part = os.path.join(out_dir, f"_band={h}")
            if os.path.isdir(part):
                spdf = spark.read.parquet(part).toPandas()
            else:
                import pandas as pd

                spdf = pd.DataFrame()
            opdf = con.execute(
                f"SELECT * EXCLUDE (_band) FROM _bandcmp WHERE _band = '{h}'"
            ).df()
            spark_seen += len(spdf)
            if len(spdf) != len(opdf):
                all_match = False
                continue
            if len(spdf) == 0:
                continue
            if sorted((c, _norm_kind(spdf[c].dtype)) for c in spdf.columns) != sorted(
                (c, _norm_kind(opdf[c].dtype)) for c in opdf.columns
            ):
                schema_ok = False
            if sorted(spdf.columns) != sorted(opdf.columns) or vhash(spdf) != vhash(opdf):
                all_match = False
        con.execute("DROP TABLE IF EXISTS _bandcmp")
        # Every spark row must appear in exactly one band (a NULL key
        # lands in the coalesce('') band on both sides).
        row["schema_match"] = schema_ok
        row["hash_match"] = all_match and spark_seen == spark_rows and row["rows_match"]
        row["err"] = None
    finally:
        scratch.release(out_dir)
    return row


def main() -> None:
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    # Reclaim scratch dirs stranded by killed prior runs before launching
    # the JVM (round-10 verdict item 1: leaked ckpt_* dirs + sf10 spill on
    # one filesystem is the ENOSPC class that crashed the official bench).
    from mdb_to_postgres_spark import scratch

    swept = scratch.sweep_stale(min_age_sec=60)
    if swept:
        print(f"swept {swept} stale scratch dirs", file=sys.stderr)
    # Plain session like the driver's, but with an explicit heap: Spark's
    # 1g default survives sf0.01 (the driver's gate) yet OOMs on the sf10
    # census's heavy tail (UNABLE_TO_ACQUIRE_MEMORY -> stopped context ->
    # cascading ConnectionRefused for the rest of the sweep).
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_SIM_MEM", "20g"))
        # The 1g default maxResultSize aborts the driver-side collect of
        # the big-output queries at sf10 (cast_types & co. return
        # table-sized results) and the failed Arrow batch iterator then
        # wedges the scheduler — raise it; the census compare IS a full
        # result materialization by design.
        .config("spark.driver.maxResultSize", os.environ.get("SPARK_GRAFT_SIM_MAXRES", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    if only is not None:
        qs = {n: f for n, f in qs.items() if n in only or any(s in n for s in only)}
    con = duckdb.connect()
    # Bound the oracle: DuckDB's default memory_limit is 80% of RAM, and
    # a 24 g Spark driver + an unbounded DuckDB on the same box is how
    # the sf1 sweep's heavy-CTE oracles died (pagerank round 10, LPA this
    # session) and how late-run memory pressure can poison neighbors.
    # With an explicit limit DuckDB spills to disk instead of fighting
    # the JVM for the last gigabytes.
    con.execute(
        f"SET memory_limit='{os.environ.get('SPARK_GRAFT_ORACLE_MEM', '16GB')}'"
    )
    con.execute("SET threads=16")
    # Give DuckDB somewhere to spill: without a temp_directory the bounded
    # oracle fails with bad_alloc instead of spilling once the sweep's
    # cumulative footprint (JVM + Arrow collects + buffer pool high-water)
    # approaches the box — seen as 14 memory-error rows in one sf10 chunk.
    con.execute("SET temp_directory='/tmp/duckdb_sim_spill'")
    for t in TABLES:
        # a table may be a single file (driver testdata) or a directory of
        # part files (the scale_corpus replicas) — glob the latter
        path = f"{sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    t_start = time.perf_counter()
    results: dict[str, dict] = {}
    for i, (name, fn) in enumerate(qs.items(), 1):
        t0 = time.perf_counter()
        row: dict = {}
        try:
            sdf_lazy = fn(spark, sf)
            # Probe with a LIMIT: results under the cap come back whole
            # (semantically identical to a plain toPandas, and we hash
            # order-insensitively); results OVER it switch to the
            # cardinality+schema protocol — a >20M-row output is a
            # row-for-row projection whose full-hash evidence lives at
            # sf1 (315/316 census), and string-heavy pandas CSV
            # canonicalization of 180M rows measured 30+ min per side.
            sdf = sdf_lazy.limit(_HASH_ROW_CAP + 1).toPandas()
            giant = len(sdf) > _HASH_ROW_CAP
            row["spark_rows"] = sdf_lazy.count() if giant else len(sdf)
            if name in osql and giant and _BAND_KEYS.get(name) in sdf.columns:
                # Full value proof despite the cap: release the probe
                # frame first (it is 20M rows of ballast), then compare
                # band-by-band.
                import gc as _gc

                sdf = None
                _gc.collect()
                row.update(
                    _banded_compare(
                        spark, con, sdf_lazy, osql[name],
                        _BAND_KEYS[name], row["spark_rows"],
                    )
                )
            elif name in osql and giant:
                n_oracle = con.execute(
                    f"SELECT COUNT(*) FROM ({osql[name]})"
                ).fetchone()[0]
                osample = con.execute(
                    f"SELECT * FROM ({osql[name]}) LIMIT 10000"
                ).df()
                row["oracle_rows"] = n_oracle
                row["rows_match"] = row["spark_rows"] == n_oracle
                # Names AND coarse dtype classes (round-11 advice): a
                # name-only check would record rows+schema through an
                # int-vs-string drift.
                row["schema_match"] = sorted(
                    (c, _norm_kind(sdf[c].dtype)) for c in sdf.columns
                ) == sorted((c, _norm_kind(osample[c].dtype)) for c in osample.columns)
                row["err"] = f"hash_skipped_gt{_HASH_ROW_CAP}: sf1 census holds the full-hash proof"
            elif name in osql:
                odf = con.execute(osql[name]).df()
                row["oracle_rows"] = len(odf)
                row["rows_match"] = len(sdf) == len(odf)
                row["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                row["hash_match"] = vhash(sdf) == vhash(odf)
                if not row["hash_match"]:
                    # Preserve the evidence: a flipped query re-run
                    # standalone often passes (sweep-order effects are a
                    # real failure class), so the mismatching frames must
                    # survive the run for post-mortem.
                    sdf.head(20000).to_csv(f"/tmp/driver_sim_fail_{name}_spark.csv", index=False)
                    odf.head(20000).to_csv(f"/tmp/driver_sim_fail_{name}_oracle.csv", index=False)
            else:
                # The real driver canonicalizes rows-only results too (its
                # round-4 decode_stub row crashed INSIDE _canon), so take
                # the same path here or this sim under-reports.
                vhash(sdf)
                row["err"] = "no_oracle"
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"[:200]
        row["sec"] = round(time.perf_counter() - t0, 2)
        results[name] = row
        # Release the per-query frames before the next collect: at sf10 a
        # single retained 20M-row frame is gigabytes, and peak overlap
        # across iterations is what exhausted the process in the first
        # sf10 chunk runs.
        import gc

        sdf = odf = sdf_lazy = None  # drop frame refs, then collect
        gc.collect()
        # Incremental dump (atomic): a sweep killed by a timeout or a hung
        # query keeps every completed row's evidence instead of losing the
        # whole run's JSON.
        with open("/tmp/driver_sim_results.json.tmp", "w") as f:
            json.dump(results, f, indent=1)
        os.replace("/tmp/driver_sim_results.json.tmp", "/tmp/driver_sim_results.json")
        err = row.get("err") or ""
        if row.get("hash_match"):
            status = "PASS"
        elif err == "no_oracle":
            status = "rows-only"
        elif err.startswith("hash_skipped") and row.get("rows_match") and row.get("schema_match"):
            status = "rows+schema"
        else:
            status = "FAIL"
        print(f"[{i:3d}/{len(qs)} {time.perf_counter() - t_start:7.1f}s] "
              f"{row['sec']:6.2f}s  {status:9s} {name}", flush=True)

    bad = {
        n: r
        for n, r in results.items()
        if not r.get("hash_match")
        and r.get("err") != "no_oracle"
        and not (
            (r.get("err") or "").startswith("hash_skipped")
            and r.get("rows_match")
            and r.get("schema_match")
        )
    }
    print(f"\nTOTAL {time.perf_counter() - t_start:.1f}s; "
          f"fail={len(bad)}: {sorted(bad)}")
    with open("/tmp/driver_sim_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
