#!/usr/bin/env python
"""Benchmark harness: runs the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with a count() (no driver-side materialization of
results, no collect of wide rows) after a shared-session warmup; the
session is reused across all queries (BASELINE.md tuning notes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# sf0.1 is small: 8 shuffle partitions beat 32 on task-scheduling overhead
# (AQE coalesces below this anyway). Respect an explicit override.
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

from mdb_to_postgres_spark import registry  # noqa: E402
from mdb_to_postgres_spark.session import get_session  # noqa: E402

# Queries that exist to exercise a surface (round-trips, streaming engine,
# stub decoders) rather than measure engine throughput. Excluded from the
# headline number; everything else runs.
_EXCLUDE = {
    "stream_foreach_sink",  # spins the streaming engine + temp sinks
    "x_multimodal_binaryfile",  # re-reads raw files, measures IO of env
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_session("mdb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.all_queries()
    names = [n for n in sorted(queries) if n not in _EXCLUDE]

    # Warmup: JVM/codegen/parquet-footer caches on the smallest query.
    queries["scan_parquet"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
