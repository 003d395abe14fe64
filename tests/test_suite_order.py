"""Pins the driver-facing queries() ordering.

The correctness harness records exactly the FIRST 50 entries of queries()
in dict-iteration order (observed r01: 52 declared / first 50 recorded,
r02: 65 declared / first 50 recorded).  These tests keep the window
budgeted: every query must either sit inside the current window or hold a
hash-green row from a previous round's CORRECTNESS file — derived
dynamically from the recorded files, so the guard stays correct as new
rounds land new evidence and new queries."""

from __future__ import annotations

import json
from pathlib import Path

from chess_lakehouse_spark import suite

REPO = Path(__file__).resolve().parent.parent


def _records() -> list[dict]:
    return [
        json.loads(p.read_text()) for p in sorted(REPO.glob("CORRECTNESS_r*.json"))
    ]


def _green() -> set[str]:
    out: set[str] = set()
    for data in _records():
        out |= {k for k, v in data.items() if v.get("hash_match")}
    return out


def _rows_only_by_design() -> set[str]:
    out: set[str] = set()
    for data in _records():
        out |= {k for k, v in data.items() if v.get("err") == "no_oracle"}
    # declared rows-only: queries with no oracle entry at all
    out |= {k for k in suite.QUERIES if k not in suite.ORACLES}
    return out


def test_never_verified_queries_inside_window() -> None:
    """A query with no hash-green row in ANY recorded round must occupy one
    of the 50 driver slots (rows-only-by-design queries excepted)."""
    window = set(list(suite.QUERIES)[:50])
    exempt = _rows_only_by_design()
    missing = [
        n
        for n in suite.QUERIES
        if n not in _green() and n not in window and n not in exempt
    ]
    assert not missing, f"never-driver-verified queries outside window: {missing}"


def test_every_query_verified_somewhere() -> None:
    """Each query is in the 50-entry window OR already hash-green in a
    recorded round OR rows-only by design."""
    green = _green()
    window = set(list(suite.QUERIES)[:50])
    exempt = _rows_only_by_design()
    uncovered = [
        n
        for n in suite.QUERIES
        if n not in window and n not in green and n not in exempt
    ]
    assert not uncovered, f"queries with no driver coverage path: {uncovered}"


def test_window_is_exactly_declared_order() -> None:
    """queries() iteration order must start with the budgeted window list —
    a refactor that reorders the dict silently reallocates driver slots."""
    names = list(suite.QUERIES)
    assert len(names) == len(set(names))
    assert len(names) >= 50
    assert names[: len(suite._WINDOW_ORDER)] == suite._WINDOW_ORDER
    assert set(names) == set(suite._ALL_QUERIES)


def _newest_green_round() -> dict[str, int]:
    out: dict[str, int] = {}
    for rnd, data in enumerate(_records(), start=1):
        for k, v in data.items():
            if v.get("hash_match"):
                out[k] = rnd
    return out


def test_no_query_goes_stale() -> None:
    """Rotation policy, two-phase on suite.WINDOW_BUDGETED_FOR so the suite
    is green on BOTH sides of a driver run (r5 postmortem: the one-phase
    form asserted against the latest recorded round unconditionally, which
    is satisfiable only at commit time — the moment the driver lands the
    round the window was budgeted for, every out-of-window query green
    only in the previous round went red by construction).

    - Pre-run (no CORRECTNESS file for the budgeted round yet): STRICT —
      every out-of-window query must be hash-green in the latest recorded
      round, forcing the commit-time rotation.
    - Post-run (the budgeted round's file has landed, window not yet
      re-planned): every out-of-window query was green at budget time —
      require green in the budgeted round or the one before. A window
      query that FAILED its budgeted run stays visible through the
      driver's red row itself, not this ratchet.
    - A budget more than one round behind the recorded files is a missed
      rotation and fails loudly."""
    records = _records()
    latest = len(records)
    budgeted = suite.WINDOW_BUDGETED_FOR
    assert budgeted in (latest, latest + 1), (
        f"WINDOW_BUDGETED_FOR={budgeted} but {latest} rounds are recorded — "
        "plan a fresh window (rotate stale queries in, bump the budget)"
    )
    newest = _newest_green_round()
    window = set(list(suite.QUERIES)[:50])
    exempt = _rows_only_by_design()
    floor = latest if budgeted == latest + 1 else budgeted - 1
    stale = [
        n
        for n in suite.QUERIES
        if n not in window and newest.get(n, 0) < floor and n not in exempt
    ]
    assert not stale, f"queries going >1 round without driver evidence: {stale}"


def test_all_oracle_queries_have_matching_columns_contract() -> None:
    """Every query has an oracle unless deliberately rows-only."""
    missing = [n for n in suite.QUERIES if n not in suite.ORACLES]
    assert missing == ["approx_stats"]
