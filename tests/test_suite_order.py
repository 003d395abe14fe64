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


def _revisit_period() -> int:
    """P = ceil(N / 50) for N non-rows-only registered queries: the number
    of driver rounds a round-robin rotation needs to touch every query
    once. P was 2 through r7 (<= 100 gated queries) and became 3 at r8
    (104). The staleness bound derives from P, so the ratchet tightens
    back automatically if the suite ever shrinks."""
    n = len([q for q in suite.QUERIES if q not in _rows_only_by_design()])
    return -(-n // 50)


def test_no_query_goes_stale() -> None:
    """Rotation policy, two-phase on suite.WINDOW_BUDGETED_FOR so the suite
    is green on BOTH sides of a driver run (r5 postmortem: the one-phase
    form asserted against the latest recorded round unconditionally, which
    is satisfiable only at commit time — the moment the driver lands the
    round the window was budgeted for, every out-of-window query green
    only in the previous round went red by construction).

    With revisit period P = ceil(N/50) (see _revisit_period; P=2 through
    r7, P=3 from r8), the enforced bound is: no out-of-window query's
    newest hash-green row may age more than P-1 recorded rounds behind
    the reference round — the provable guarantee that every registered
    query holds a driver row from the last P recorded rounds once the
    budgeted round lands (in-window queries are refreshed by that run
    itself; a window query that FAILS its run stays visible through the
    driver's red row, not this ratchet).

    - Pre-run (no CORRECTNESS file for the budgeted round yet): floor =
      latest - (P - 2) — at P=2 this is the strict same-round form that
      forces the commit-time rotation.
    - Post-run (the budgeted round's file has landed, window not yet
      re-planned): floor = budgeted - (P - 1), one round looser because
      every query aged one round while the window stood still.
    - A budget more than one round behind the recorded files is a missed
      rotation and fails loudly."""
    records = _records()
    latest = len(records)
    budgeted = suite.WINDOW_BUDGETED_FOR
    assert budgeted in (latest, latest + 1), (
        f"WINDOW_BUDGETED_FOR={budgeted} but {latest} rounds are recorded — "
        "plan a fresh window (rotate stale queries in, bump the budget)"
    )
    period = _revisit_period()
    newest = _newest_green_round()
    window = set(list(suite.QUERIES)[:50])
    exempt = _rows_only_by_design()
    floor = (
        latest - (period - 2) if budgeted == latest + 1 else budgeted - (period - 1)
    )
    stale = [
        n
        for n in suite.QUERIES
        if n not in window and newest.get(n, 0) < floor and n not in exempt
    ]
    assert not stale, (
        f"queries aging beyond the {period - 1}-round staleness bound "
        f"(floor=r{floor}): {stale}"
    )


def test_every_query_within_revisit_bound() -> None:
    """The whole-suite guarantee the window plan must deliver: EVERY
    non-exempt query either sits in the current window (refreshed by the
    budgeted run) or holds a hash-green row no older than P-1 rounds
    behind the latest recorded file — i.e. every query provably gets a
    driver row within the last P+1 recorded rounds at any commit point."""
    latest = len(_records())
    period = _revisit_period()
    newest = _newest_green_round()
    window = set(list(suite.QUERIES)[:50])
    exempt = _rows_only_by_design()
    aged = [
        n
        for n in suite.QUERIES
        if n not in exempt
        and n not in window
        and newest.get(n, 0) < latest - (period - 1)
    ]
    assert not aged, f"queries outside both the window and the P-round bound: {aged}"


def test_all_oracle_queries_have_matching_columns_contract() -> None:
    """Every registered query has an oracle — the last rows-only query
    (approx_stats) was gated through the checked-projection pattern at
    the r11 re-plan, so the missing list must stay empty."""
    missing = [n for n in suite.QUERIES if n not in suite.ORACLES]
    assert missing == []


def test_staged_candidates_manifest_is_registration_ready():
    """The STAGED_CANDIDATES manifest (suite/llm.py) is what a window
    re-plan promotes verbatim into QUERIES/ORACLES: names must be FREE
    (an entry in both would double-claim verification state), callables
    must be suite-shaped, and oracles must be non-trivial SQL touching at
    least one driver-registered view (full referential validity — no
    unregistered tables — is proven by each candidate's two-scale parity
    test, which EXECUTES the oracle against a connection registering only
    the driver views)."""
    import inspect

    from chess_lakehouse_spark import suite
    from chess_lakehouse_spark.suite.llm import STAGED_CANDIDATES

    registered_views = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    assert STAGED_CANDIDATES, "manifest must not silently empty out"
    for name, (fn, oracle) in STAGED_CANDIDATES.items():
        assert name not in suite.QUERIES, f"{name} staged AND registered"
        assert name not in suite.ORACLES, f"{name} staged AND registered"
        assert callable(fn), name
        params = list(inspect.signature(fn).parameters)
        assert params[:2] == ["spark", "sf_dir"], (name, params)
        assert isinstance(oracle, str) and len(oracle.strip()) > 50, name
        tokens = {
            t.strip("(),;") for t in oracle.replace("\n", " ").lower().split()
        }
        froms = tokens & registered_views
        assert froms, f"{name} oracle references no registered view"


def test_staged_candidate_plans_have_no_forbidden_shapes(spark):
    """Every staged candidate's PHYSICAL plan is free of the two
    categorically bad shapes (CartesianProduct, row-at-a-time Python via
    BatchEvalPython) BEFORE it can ever be registered — the plan_audit.py
    sweep, machine-enforced for the staging manifest the way
    tests/test_plans.py enforces it for registered queries."""
    from chess_lakehouse_spark.suite.llm import STAGED_CANDIDATES

    sf = "/root/testdata/sf0.001"
    for name, (fn, _) in STAGED_CANDIDATES.items():
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
