"""bench.py's single-JSON-line stdout contract is what the per-round
driver parses; round 2's bench died unparsed, so the emit path is guarded
here without spinning up Spark."""

from __future__ import annotations

import json

import bench


def test_payload_parses_and_has_contract_keys():
    timings = {"q1": 0.394849, "q2": 1.0, "x_dedup_minhash_lsh": 3.91}
    line = bench.build_payload(timings, "0.1")
    parsed = json.loads(line)
    assert parsed["metric"] == "steady_state_query_wall_time"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["value"] == round(sum(timings.values()), 2)
    assert set(parsed["queries"]) == set(timings)
    assert "\n" not in line  # ONE line
    assert " " not in line  # compact separators: truncation headroom


def test_payload_handles_odd_sf_dir_names():
    parsed = json.loads(bench.build_payload({}, "custom-dir"))
    assert parsed["sf"] == "custom-dir"
    assert parsed["value"] == 0
