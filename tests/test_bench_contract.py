"""Bench output contract: ONE JSON line the harness can always parse.

Round-4 postmortem: the harness keeps only a ~2000-char tail of bench
stdout; the 85-query JSON line outgrew it and BENCH_r04.json recorded
``parsed: null``. These tests pin the compaction logic without running
Spark (the expensive path is covered by the driver itself)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_line_fits_tail_budget_at_current_query_count():
    """Simulate bench's final serialization with the CURRENT suite size and
    worst-case (long) query names: the printed line must stay <= 1800."""
    sys.path.insert(0, str(REPO))
    from chess_lakehouse_spark import suite

    timings = {name: 123.4567 for name in suite.QUERIES}
    out = {
        "metric": "suite_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "n_queries": len(timings),
        "warmup_sec": 12.3456,
    }
    budget = 1800
    compact = dict(out)
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    line = None
    for keep in range(len(ranked), -1, -1):
        shown = dict(ranked[:keep])
        rest = round(sum(t for _, t in ranked[keep:]), 4)
        if rest:
            shown["_other"] = rest
        compact["queries"] = shown
        if keep < len(ranked):
            compact["queries_omitted"] = len(ranked) - keep
            compact["full_timings"] = "BENCH_FULL.json"
        line = json.dumps(compact)
        if len(line) <= budget:
            break
    assert line is not None and len(line) <= budget
    parsed = json.loads(line)
    # the rollup conserves the total: shown + _other == all timings
    shown_sum = sum(v for k, v in parsed["queries"].items())
    assert abs(shown_sum - sum(timings.values())) < 1e-6
    assert parsed["n_queries"] == len(suite.QUERIES)


def test_bench_py_compaction_code_matches_budget():
    """The real bench.py must carry the budget constant and the _other
    rollup — a refactor that drops either regresses the r4 truncation."""
    src = (REPO / "bench.py").read_text()
    assert "budget = 1800" in src
    assert "_other" in src
    assert "BENCH_FULL.json" in src
