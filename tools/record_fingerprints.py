#!/usr/bin/env python
"""Refresh tools/fingerprints.json — the source-fingerprint sidecar behind
the registry's self-rotating check order.

Records the md5(source + oracle) of EVERY registered query as of the
current tree. Run this as the last step of a round (after all edits): the
driver then verifies exactly this source, so a green row in the next
CORRECTNESS file is evidence FOR these fingerprints. If a query is later
edited without re-running the driver, its current fingerprint diverges
from the recorded one and registry._check_rank demotes it to rank 2
(re-verify) instead of letting the stale green row stand indefinitely.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdb_to_postgres_spark import registry


def main() -> None:
    fps = registry.current_fingerprints()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fingerprints.json")
    old: dict = {}
    try:
        with open(path) as f:
            old = json.load(f)
    except (OSError, ValueError):
        pass
    changed = sorted(n for n in fps if old.get(n) != fps[n])
    with open(path, "w") as f:
        json.dump(fps, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"recorded {len(fps)} fingerprints -> {path}")
    if old:
        print(f"changed since last record ({len(changed)}): {', '.join(changed[:40])}")


if __name__ == "__main__":
    main()
