"""The self-rotating registry IS the path to full driver coverage — its
ordering and fingerprint-demotion rules are load-bearing, so they are
tested, not assumed."""

from __future__ import annotations

import json
import os

from mdb_to_postgres_spark import registry

registry.load_all()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _history_names() -> set[str]:
    names: set[str] = set()
    import glob

    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            names |= set(json.load(f))
    return names


def test_never_checked_queries_lead_the_window():
    # Visible failures (rank 0: crashed rows, oracle-backed non-green rows)
    # lead the window; every query without any driver row follows. The
    # 50-entry window must be packed with (failures + unchecked) — no green
    # query may occupy a slot one of those needs; overflow drains on the
    # next rotation.
    order = list(registry.QUERIES)
    checked = _history_names()
    failed = [
        n
        for n in order
        if registry._check_rank(
            n, n in registry.ORACLES,
            registry._fingerprint(registry.QUERIES[n], registry.ORACLES.get(n)),
        ) == 0
    ]
    unchecked = [n for n in order if n not in checked]
    assert unchecked, "all queries have driver rows — rotation converged"
    needy = set(failed) | set(unchecked)
    # failures first: every rank-0 entry precedes every rank-1 entry
    if failed and unchecked:
        assert max(order.index(n) for n in failed) < min(
            order.index(n) for n in unchecked
        ), (failed, order[:5])
    if len(needy) <= 50:
        worst = max(order.index(n) for n in needy)
        assert worst < 50, (worst, sorted(needy))
    else:
        assert all(n in needy for n in order[:50]), [
            n for n in order[:50] if n not in needy
        ]
        # and the overflow is contiguous right behind the window
        worst = max(order.index(n) for n in needy)
        assert worst < len(needy), (worst, len(needy))


def test_rank_scale():
    checked = _history_names()
    hist = registry._correctness_history()
    greens = [n for n, st in hist.items() if st == "green" and n in registry.QUERIES]
    assert greens, "no greens in history?"
    # Unchanged green -> back of the queue (rank 4).
    g = greens[0]
    fp = registry._fingerprint(registry.QUERIES[g], registry.ORACLES.get(g))
    assert registry._check_rank(g, g in registry.ORACLES, fp) in (2, 4)
    # Never-checked -> rank 1.
    unchecked = [n for n in registry.QUERIES if n not in checked]
    if unchecked:
        n = unchecked[0]
        assert registry._check_rank(n, n in registry.ORACLES, "x") == 1


def test_crashed_row_ranks_zero(monkeypatch):
    # A driver row whose err is a traceback (not 'no_oracle') is a visible
    # failure and must re-verify in the NEXT window even without an oracle
    # — under the old rules x_multimodal_decode_stub's round-4 crash would
    # have ranked 3 and waited ~2 rounds behind the never-checked backlog.
    monkeypatch.setattr(
        registry, "_HISTORY",
        {"q_crash": "crashed", "q_clean": "clean", "q_green": "green"},
    )
    assert registry._check_rank("q_crash", False, "x") == 0
    assert registry._check_rank("q_crash", True, "x") == 0
    # rows-only clean record without an oracle stays rank 3; with one, 0
    assert registry._check_rank("q_clean", False, "x") == 3
    assert registry._check_rank("q_clean", True, "x") == 0
    monkeypatch.setattr(registry, "_RECORDED_FP", {})
    assert registry._check_rank("q_green", True, "x") == 4


def test_history_latest_row_wins():
    # Latest-row semantics over FIXED inputs (not the mutable repo-root
    # glob, which grows a new file every round): the round-4 file records
    # x_multimodal_decode_stub's canonicalizer traceback; the round-5 file
    # records its fixed, hash-green row. Parsed alone, round 4 must surface
    # it as crashed; parsed together, the round-5 row must win.
    r4 = os.path.join(REPO, "CORRECTNESS_r04.json")
    r5 = os.path.join(REPO, "CORRECTNESS_r05.json")
    hist4 = registry._parse_history([r4])
    assert hist4.get("x_multimodal_decode_stub") == "crashed"
    assert hist4.get("x_multimodal_ingest") == "green"
    assert hist4.get("x_sim_ann_lsh") == "clean"  # err == 'no_oracle'
    both = registry._parse_history([r4, r5])
    assert both.get("x_multimodal_decode_stub") == "green"
    # and order of the input list must not matter (sorted internally)
    assert registry._parse_history([r5, r4]) == both


def test_fingerprint_mismatch_demotes_green(monkeypatch):
    hist = registry._correctness_history()
    greens = [n for n, st in hist.items() if st == "green" and n in registry.QUERIES]
    g = greens[0]
    real_fp = registry._fingerprint(registry.QUERIES[g], registry.ORACLES.get(g))
    monkeypatch.setattr(registry, "_RECORDED_FP", {g: real_fp})
    assert registry._check_rank(g, True, real_fp) == 4
    monkeypatch.setattr(registry, "_RECORDED_FP", {g: "different"})
    assert registry._check_rank(g, True, real_fp) == 2
    # Absent sidecar entry = assume unchanged (lazy seeding must not dump
    # a hundred greens in front of the never-checked queue).
    monkeypatch.setattr(registry, "_RECORDED_FP", {})
    assert registry._check_rank(g, True, real_fp) == 4


def test_fingerprint_stable_under_reformat():
    g = next(iter(registry.QUERIES))
    fn = registry.QUERIES[g]
    fp1 = registry._fingerprint(fn, "SELECT 1")
    fp2 = registry._fingerprint(fn, "SELECT 1")
    assert fp1 == fp2
    assert registry._fingerprint(fn, "SELECT 2") != fp1


def test_sidecar_pending_matches_current_tree():
    # The "pending" snapshot must describe the current source tree — it is
    # the fingerprint set the next driver round's green rows will vouch
    # for, so an out-of-date snapshot breaks the green-time promotion.
    # Regenerate with tools/record_fingerprints.py after editing any
    # registered query (the last step of every round).
    path = os.path.join(REPO, "tools", "fingerprints.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        state = json.load(f)
    pending = state.get("pending", state)
    current = registry.current_fingerprints()
    stale = sorted(n for n in current if pending.get(n) != current[n])
    assert not stale, f"stale pending snapshot (rerun tools/record_fingerprints.py): {stale}"
