"""Normalizer semantics (reference: chess extension scalars, SURVEY.md §2.9).

The extension source isn't in the reference repo, so behavior is pinned by
property tests: idempotence, and the openings fixed point (normalize of an
openings-style pgn string is itself — the contract that makes the
contains-join work, src/find-openings.ts:76)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chess_lakehouse_spark.functions.chess import (
    _TC_RE,
    _normalize_one,
    timecontrol_normalize,
)


def test_strip_comments_variations_nags():
    raw = "1. e4 {best by test} e5!? ($2 1... c5 (1... e6 2. d4)) 2. Nf3 $1 Nc6?! 1-0"
    assert _normalize_one(raw) == "1. e4 e5 2. Nf3 Nc6"


def test_renumber_and_glued_numbers():
    assert _normalize_one("1.e4 c6 2.d4 d5 3.e5") == "1. e4 c6 2. d4 d5 3. e5"
    assert _normalize_one("e4 c6 d4") == "1. e4 c6 2. d4"


def test_result_tokens_removed():
    for res in ("1-0", "0-1", "1/2-1/2", "*"):
        assert _normalize_one(f"1. d4 d5 {res}") == "1. d4 d5"


def test_null_safe():
    assert _normalize_one(None) is None


def test_openings_fixed_point_examples():
    # Strings in the exact Lichess openings `pgn` format must be unchanged.
    for pgn in (
        "1. e4",
        "1. e4 c6 2. d4 d5 3. e5",
        "1. d4 Nf6 2. c4 g6 3. Nc3 Bg7 4. e4 d6",
        "1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 4. Ba4 Nf6 5. O-O Be7",
    ):
        assert _normalize_one(pgn) == pgn


_SAN = st.sampled_from(
    ["e4", "d5", "Nf3", "Bb5+", "O-O", "O-O-O", "exd5", "e8=Q", "Qxf7#", "a6", "h3"]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_SAN, min_size=1, max_size=24))
def test_idempotence(moves):
    once = _normalize_one(" ".join(moves))
    assert _normalize_one(once) == once


@settings(max_examples=200, deadline=None)
@given(st.lists(_SAN, min_size=1, max_size=24))
def test_openings_fixed_point_property(moves):
    canonical = " ".join(
        (f"{i // 2 + 1}. {m}" if i % 2 == 0 else m) for i, m in enumerate(moves)
    )
    assert _normalize_one(canonical) == canonical


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("600+5", "600+5"),
        (" 600 + 5 ", "600+5"),
        ("40/7200:3600", "40/7200:3600"),
        ("40/7200+30:3600+30", "40/7200+30:3600+30"),
        ("?", "?"),
        ("-", "-"),
        ("*180", "*180"),
        ("300", "300"),
        ("abc", None),
        ("600+", None),
        ("/600", None),
        ("", None),
    ],
)
def test_timecontrol_grammar(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "tc string").select(
        timecontrol_normalize("tc").alias("out")
    )
    assert df.collect()[0]["out"] == expected


def test_tc_regex_compiles():
    import re

    re.compile(_TC_RE)


def test_moves_normalize_udf_batch(spark):
    from chess_lakehouse_spark.functions.chess import moves_normalize

    df = spark.createDataFrame(
        pd.DataFrame({"movetext": ["1.e4 {x} e5 1-0", None, "d4 d5 *"]})
    ).select(moves_normalize("movetext").alias("clean"))
    assert [r["clean"] for r in df.collect()] == ["1. e4 e5", None, "1. d4 d5"]


def test_escape_lines_and_semicolon_comments():
    raw = "1. e4 e5 ; line comment\n%escape line ignored\n2. Nf3 Nc6 1-0"
    assert _normalize_one(raw) == "1. e4 e5 2. Nf3 Nc6"
