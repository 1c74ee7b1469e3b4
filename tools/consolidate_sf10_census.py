#!/usr/bin/env python
"""Consolidate the sf10 census evidence into one committed record.

Round-11 inputs were the chunked driver_sim runs in /tmp (r11* prefixes);
round 12 seeds from the committed tools/sf10_census_r11.json (the /tmp
chunks are gone) and absorbs the r12 sweep chunks (/tmp/r12*_*.json).
Output: tools/sf10_census_r12.json with per-query status:
  pass          — full order-insensitive value-hash match at sf10
                  (including the round-12 banded comparator for >20M-row
                  outputs — see driver_sim._banded_compare)
  fail          — ran to completion on BOTH sides with a genuine
                  rows/schema/hash MISMATCH. Ranked ABOVE pass so it can
                  never be silently absorbed by an earlier green
                  (round-11 advice: a mismatch must not be recorded as
                  'did not complete').
  rows+schema   — >20M-row output: cardinality+schema (names + dtype
                  classes) proven at sf10, full-hash proof at sf1
  rows-only     — no oracle by design (impl-specific values)
  sf1-only      — oracle INFEASIBLE at sf10 (DuckDB's pairwise/recursive
                  CTE twin exceeds the box's spill headroom while the
                  engine side completes); the full-hash proof stands at
                  the sf1 census. Explicit verdict, not a sweep gap.
  not-run       — did not complete inside the round window
Statuses upgrade by rank except fail, which always surfaces; a fail
overwritten by nothing, conflicts (pass+fail across runs) are listed in
the output for adjudication.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RANK = {"fail": 5, "pass": 4, "rows+schema": 3, "sf1-only": 2, "rows-only": 1, "not-run": 0}

# The oracle-infeasible twins (round-11 verdict item 1b): DuckDB's CTE
# oracle exceeds the 75 GB spill headroom at sf10; engine side returns in
# seconds-to-minutes and the full-hash proof stands at sf1. Populated
# from the round-12 sweep's observed failures — each entry cites the
# observed oracle failure mode.
INFEASIBLE: dict[str, str] = {}
_INFEASIBLE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "sf10_oracle_infeasible.json"
)
if os.path.exists(_INFEASIBLE_PATH):
    INFEASIBLE = json.load(open(_INFEASIBLE_PATH))


def status_of(r: dict) -> str:
    if r.get("hash_match"):
        return "pass"
    e = r.get("err") or ""
    if e == "no_oracle":
        return "rows-only"
    if e.startswith("hash_skipped"):
        # Completed the rows+schema protocol; a mismatch there is a FAIL,
        # not a coverage gap (round-11 advice).
        if r.get("rows_match") and r.get("schema_match"):
            return "rows+schema"
        return "fail"
    if not e and ("hash_match" in r or "rows_match" in r):
        # Ran to completion on both sides, no exception, no hash match:
        # a genuine mismatch.
        return "fail"
    return "not-run"


def main() -> None:
    from mdb_to_postgres_spark import registry

    registry.load_all()

    best: dict[str, dict] = {}
    conflicts: dict[str, list[str]] = {}

    def absorb(name: str, status: str, sec: float | None, src: str) -> None:
        cur = best.get(name)
        if cur is not None and {status, cur["status"]} >= {"pass", "fail"}:
            conflicts.setdefault(name, []).append(f"{cur['status']}@{cur['source']}")
        if cur is None or RANK[status] > RANK[cur["status"]]:
            best[name] = {"status": status, "sec": sec, "source": src}

    # Seed: the committed round-11 census (its not-run rows stay not-run
    # unless a round-12 chunk upgrades them).
    r11_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "sf10_census_r11.json"
    )
    if os.path.exists(r11_path):
        r11 = json.load(open(r11_path))
        for n, r in r11["queries"].items():
            if r["status"] != "not-run":
                absorb(n, r["status"], r.get("sec"), r.get("source") or "r11-census")

    # Round-12 sweep chunks: the live /tmp dumps plus the committed
    # copies under tools/r12_census_chunks/ (evidence survives a reboot).
    chunk_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "r12_census_chunks"
    )
    for f in sorted(
        glob.glob("/tmp/r12*_*.json")
        + glob.glob("/tmp/r12*.json")
        + glob.glob(os.path.join(chunk_dir, "*.json"))
    ):
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if not isinstance(d, dict):
            continue
        for n, r in d.items():
            if isinstance(r, dict):
                absorb(n, status_of(r), r.get("sec"), os.path.basename(f))

    allq = sorted(registry.QUERIES)
    record = {
        n: best.get(n, {"status": "not-run", "sec": None, "source": None})
        for n in allq
    }
    # Queries without an oracle are rows-only BY DESIGN at every sf —
    # an absent sf10 oracle row is their contract, not a coverage gap.
    for n in allq:
        if n not in registry.ORACLES and record[n]["status"] == "not-run":
            record[n] = {"status": "rows-only", "sec": None, "source": "by-design"}
    # Explicit sf1-only verdicts for the oracle-infeasible twins: only
    # applied where no stronger sf10 evidence exists (a pass wins).
    for n, why in INFEASIBLE.items():
        if n in record and RANK[record[n]["status"]] < RANK["sf1-only"]:
            record[n] = {
                "status": "sf1-only",
                "sec": None,
                "source": "oracle-infeasible",
                "why": why,
            }
    counts: dict[str, int] = {}
    for r in record.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    out = {
        "scale": "sf10 (.cache/sf10, 100x the driver's sf0.1)",
        "protocol": (
            "driver_sim at 20g sim heap, 16GB spill-bounded DuckDB oracle; "
            "full order-insensitive value-hash for results <= 20M rows, "
            "banded md5 full-value hash above (16 bands, each under the "
            "cap); sf1-only rows carry an explicit oracle-infeasible "
            "verdict with the observed failure mode"
        ),
        "counts": counts,
        "conflicts": conflicts,
        "queries": record,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "sf10_census_r12.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(counts, indent=1))
    if conflicts:
        print("CONFLICTS (pass+fail across runs, adjudicate):", conflicts)
    print("fail:", sorted(n for n, r in record.items() if r["status"] == "fail"))
    print("not-run:", sorted(n for n, r in record.items() if r["status"] == "not-run"))
    print("->", path)


if __name__ == "__main__":
    main()
