#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1: measure first).

For each selected query, in one shared warm session (bench-identical conf):
  - build_s : driver-side DataFrame construction time (plan building,
              including any eager substrate work such as localCheckpoint
              builds on first call; measured warm = after one full warmup
              call, so session-cached substrates are already materialized)
  - count_s : the bench's timed action (df.count()), min of N reps
  - noop_s  : full-column materialization via the noop sink (guide §1.4),
              min of N reps — separates "count let Catalyst prune" effects
  - jobs    : number of Spark jobs the count() action launched
  - explain : .explain(formatted) dumped to plans/r12/<name>_before.txt
              (or _after.txt with --after)

Usage:
  python tools/profile_queries.py [--top N | --only a,b,c] [--after]
                                  [--reps 3] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")  # bench parity

from mdb_to_postgres_spark import registry  # noqa: E402
from mdb_to_postgres_spark.session import get_session  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "plans", "r12")


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 3
    only: list[str] | None = None
    top_n: int | None = None
    suffix = "_before"
    out_json = os.path.join("/tmp", "profile_r12.json")
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--only":
            only = argv[i + 1].split(",")
            i += 2
        elif a == "--top":
            top_n = int(argv[i + 1])
            i += 2
        elif a == "--reps":
            reps = int(argv[i + 1])
            i += 2
        elif a == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        elif a == "--after":
            suffix = "_after"
            i += 1
        elif a == "--out":
            out_json = argv[i + 1]
            i += 2
        elif a == "--plans-dir":
            # survey runs (full-registry sweeps) dump explains to a scratch
            # dir so the committed before/after evidence is never clobbered
            global PLANS
            PLANS = argv[i + 1]
            i += 2
        else:
            raise SystemExit(f"unknown arg {a}")

    os.makedirs(PLANS, exist_ok=True)
    spark = get_session("mdb-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    queries = registry.all_queries()
    names = sorted(queries)
    if only is not None:
        names = [n for n in names if n in only or any(s in n for s in only)]
    if top_n is not None:
        # rank by a quick single timed pass (after warmup)
        pass

    results: dict[str, dict] = {}
    for k, name in enumerate(names, 1):
        fn = queries[name]
        sc.setJobDescription(f"profile:{name}")
        try:
            # warmup: codegen + any lazy substrate builds
            fn(spark, sf_dir).count()

            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            build_s = time.perf_counter() - t0

            count_s = []
            jobs_n = None
            for _ in range(reps):
                jobs_before = len(sc.statusTracker().getJobIdsForGroup(None))
                t0 = time.perf_counter()
                df.count()
                count_s.append(time.perf_counter() - t0)
                if jobs_n is None:
                    jobs_n = len(sc.statusTracker().getJobIdsForGroup(None)) - jobs_before

            noop_s = []
            for _ in range(reps):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                noop_s.append(time.perf_counter() - t0)

            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLANS, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)

            results[name] = {
                "build_s": round(build_s, 4),
                "count_s": round(min(count_s), 4),
                "noop_s": round(min(noop_s), 4),
                "total_s": round(build_s + min(count_s), 4),
                "jobs": jobs_n,
                "exchanges": plan.count("Exchange"),
                "plan_lines": plan.count("\n"),
            }
            r = results[name]
            print(
                f"[{k}/{len(names)}] {name}: build {r['build_s']:.3f}s "
                f"count {r['count_s']:.3f}s noop {r['noop_s']:.3f}s "
                f"jobs {r['jobs']} exch {r['exchanges']}",
                flush=True,
            )
        except Exception as e:  # keep profiling the rest
            results[name] = {"err": repr(e)[:300]}
            print(f"[{k}/{len(names)}] {name}: ERROR {e!r}", flush=True)
        finally:
            sc.setJobDescription(None)
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)

    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
