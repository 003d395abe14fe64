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
    """Rotation policy: every query must either sit in the upcoming window
    or have been hash-green in the latest recorded round — i.e. after the
    upcoming round completes, no query's newest green row is older than two
    rounds. Rows-only-by-design queries are exempt from the hash criterion
    but still must rotate through the window to accumulate rows-only rows
    (enforced only when they have never been recorded)."""
    records = _records()
    latest = len(records)
    newest = _newest_green_round()
    window = set(list(suite.QUERIES)[:50])
    exempt = _rows_only_by_design()
    stale = [
        n
        for n in suite.QUERIES
        if n not in window and newest.get(n, 0) < latest and n not in exempt
    ]
    assert not stale, f"queries going >1 round without driver evidence: {stale}"


def test_all_oracle_queries_have_matching_columns_contract() -> None:
    """Every query has an oracle unless deliberately rows-only."""
    missing = [n for n in suite.QUERIES if n not in suite.ORACLES]
    assert missing == ["approx_stats"]
