#!/usr/bin/env python
"""Refresh tools/fingerprints.json — the source-fingerprint sidecar behind
the registry's self-rotating check order.

The file holds three keys:
  "pending"  — fingerprint of EVERY registered query as of the last run of
               this tool (i.e. the tree the NEXT driver round will check);
  "green"    — per query, the fingerprint that was pending when the query's
               most recent hash-green driver row was produced (this is what
               registry._check_rank compares against: current != green means
               the green row is stale evidence and the query re-verifies);
  "promoted_through" — the newest CORRECTNESS_r*.json already folded into
               "green".

Run this as the LAST step of every round, after all edits:
  1. any CORRECTNESS file newer than promoted_through promotes its
     hash-green rows' pending fingerprints into "green";
  2. "pending" is rewritten from the current tree.
On first run (no sidecar), "green" is seeded from the current tree for
historically-green queries — the assume-unchanged bootstrap.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdb_to_postgres_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "tools", "fingerprints.json")


def main() -> None:
    current = registry.current_fingerprints()
    state: dict = {"pending": {}, "green": {}, "promoted_through": ""}
    try:
        with open(PATH) as f:
            prev = json.load(f)
        if "pending" in prev and "green" in prev:
            state = prev
        else:  # legacy flat {name: fp} format: treat as pending snapshot
            state["pending"] = {k: v for k, v in prev.items() if isinstance(v, str)}
    except (OSError, ValueError):
        pass

    corr = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    new_files = [p for p in corr if os.path.basename(p) > state["promoted_through"]]
    promoted = 0
    for path in new_files:
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                # The fingerprint the driver checked is the pending one if
                # recorded, else (bootstrap) the current tree's.
                fp = state["pending"].get(name, current.get(name))
                if fp:
                    state["green"][name] = fp
                    promoted += 1
        state["promoted_through"] = os.path.basename(path)

    state["pending"] = current
    with open(PATH, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"promoted {promoted} green fingerprints through {state['promoted_through']}; "
        f"pending snapshot = {len(current)} queries -> {PATH}"
    )


if __name__ == "__main__":
    main()
