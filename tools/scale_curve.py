#!/usr/bin/env python
"""Three-point scale curve (round-10 verdict item 3): run the 12 heaviest
data-bound queries (tools/plan_shapes.HEAVY_SF1) at sf0.1 (driver
testdata), the 10x replica (.cache/sf1) and the 100x replica (.cache/sf10,
regenerate via `python tools/scale_corpus.py 100 --out .cache/sf10`), in
ONE session, and report per-query wall times plus per-decade ratios.

Two points fit any line — the r9 "1.57x per 10x" claim needs a third.
A query is flagged SUPER-LINEAR when its sf1 -> sf10 warm ratio exceeds
12x for 10x data (slack over linear for shuffle-width effects); the exit
code is nonzero if any query is flagged, so this doubles as a gate.

Also re-checks the sf1 plan-shape goldens AT the 100x point: an AQE
decision that flips between 10x and 100x (broadcast that stops fitting,
skew split appearing) shows up as signature drift, reported per query
(informational — the committed goldens stay the sf1 ones).

Protocol per point: 1 cold + 2 warm passes per query (count()-forced),
headline = min of warm. Shuffle partitions per point mirror the recorded
anchors: 8 at sf0.1, 32 at sf1, 64 at sf10. Output: a markdown table on
stderr, one JSON line on stdout, full record in bench_scale_curve.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")

from tools.plan_shapes import GOLDEN_SF1, HEAVY_SF1, shape_signature  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POINTS = [
    ("sf0.1", "/root/testdata/sf0.1", 8),
    ("sf1", os.path.join(REPO, ".cache", "sf1"), 32),
    ("sf10", os.path.join(REPO, ".cache", "sf10"), 64),
]
OUT = os.path.join(REPO, "bench_scale_curve.json")
SUPER_LINEAR_RATIO = 12.0  # per 10x data; > this between sf1 and sf10 fails


def main() -> int:
    from mdb_to_postgres_spark.registry import QUERIES, load_all
    from mdb_to_postgres_spark.session import get_session, tune_session

    load_all()

    for _, path, _ in POINTS:
        if not os.path.exists(os.path.join(path, "lineitem.parquet")):
            print(f"missing corpus: {path}", file=sys.stderr)
            return 2

    spark = get_session("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    tune_session(spark)

    record: dict[str, dict] = {name: {} for name in HEAVY_SF1}
    for tag, sf_dir, parts in POINTS:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        for name in HEAVY_SF1:
            runs = []
            for _ in range(3):  # 1 cold (includes substrate builds) + 2 warm
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).count()
                runs.append(round(time.perf_counter() - t0, 3))
            record[name][tag] = {"cold": runs[0], "warm": min(runs[1:])}
            print(f"{tag} {name}: cold={runs[0]} warm={min(runs[1:])}", file=sys.stderr)

    # sf1 golden signatures re-checked at the 100x point
    with open(GOLDEN_SF1) as f:
        golden = json.load(f)["shapes"]
    drift = {}
    for name in HEAVY_SF1:
        plan = (
            QUERIES[name](spark, POINTS[2][1])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        sig = shape_signature(plan)
        if sig != golden.get(name):
            drift[name] = {"sf1_golden": golden.get(name), "sf10": sig}

    flagged = []
    lines = [
        "| query | sf0.1 warm | sf1 warm | sf10 warm | r(0.1->1) | r(1->10) |",
        "|---|---|---|---|---|---|",
    ]
    for name in HEAVY_SF1:
        w01 = record[name]["sf0.1"]["warm"]
        w1 = record[name]["sf1"]["warm"]
        w10 = record[name]["sf10"]["warm"]
        r01 = round(w1 / w01, 2) if w01 else None
        r1 = round(w10 / w1, 2) if w1 else None
        if r1 is not None and r1 > SUPER_LINEAR_RATIO:
            flagged.append(name)
        lines.append(f"| {name} | {w01} | {w1} | {w10} | {r01}x | {r1}x |")
    t01 = round(sum(record[n]["sf0.1"]["warm"] for n in HEAVY_SF1), 2)
    t1 = round(sum(record[n]["sf1"]["warm"] for n in HEAVY_SF1), 2)
    t10 = round(sum(record[n]["sf10"]["warm"] for n in HEAVY_SF1), 2)
    lines.append(
        f"| **total** | **{t01}** | **{t1}** | **{t10}** |"
        f" **{round(t1 / t01, 2)}x** | **{round(t10 / t1, 2)}x** |"
    )
    print("\n".join(lines), file=sys.stderr)
    if drift:
        print(f"plan drift at sf10 vs sf1 goldens: {json.dumps(drift)}", file=sys.stderr)
    summary = {
        "metric": "heavy12_scale_curve",
        "unit": "sec",
        "totals": {"sf0.1": t01, "sf1": t1, "sf10": t10},
        "ratio_per_10x": [round(t1 / t01, 2), round(t10 / t1, 2)],
        "super_linear": flagged,
        "plan_drift_at_sf10": sorted(drift),
    }
    with open(OUT, "w") as f:
        json.dump({"summary": summary, "queries": record, "drift": drift}, f, indent=1)
    print(json.dumps(summary, separators=(",", ":")))
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
