"""Chess scalar functions — the Spark surface of the reference's DuckDB
`chess` extension (LOAD chess; version pin params.yaml:2), which provides
`chess_moves_normalize` and `chess_timecontrol_normalize`
(declared src/read-pgn.ts:48, consumed src/find-openings.ts:76 and
src/export-to-parquet.ts:85).

The extension's source is not in the reference repo, so the semantics are
pinned by their observable contract (SURVEY.md §2.9):

- ``moves_normalize``: raw PGN movetext → canonical SAN stream such that every
  openings-dataset ``pgn`` string (e.g. ``1. e4 e5 2. Nf3``) is a substring of
  a normalized game that begins with that line. Strips comments ``{...}``,
  recursive variations ``(...)``, NAGs ``$n``, annotation glyphs ``!?``,
  result tokens; renumbers moves from scratch in the openings format
  (white-move numbers only, ``N. `` separated, single spaces). NULL-safe.
  Property tests (tests/test_chess_functions.py) pin idempotence and the
  openings fixed point.

- ``timecontrol_normalize``: PGN TimeControl tag → compact canonical form;
  NULL when the value doesn't match the PGN TimeControl grammar (hence the
  reference's COALESCE fallback at src/export-to-parquet.ts:85).

``timecontrol_normalize`` is a pure Column expression (Catalyst-visible,
whole-stage codegen). ``moves_normalize`` must handle NESTED variations —
not expressible with a fixed regex pipeline — so it is an Arrow-batched
pandas UDF with a linear single-pass scanner (the idiomatic slow path:
one python call per ~10k-row batch, not per row).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from chess_lakehouse_spark._pickle import register_module_by_value

register_module_by_value(__name__)

# --- moves_normalize -------------------------------------------------------

_RESULT_TOKENS = {"1-0", "0-1", "1/2-1/2", "*"}
# SAN-ish token: moves (Nf3, exd5, e8=Q+, O-O-O#), allowing trailing +/#.
_MOVE_NUM_RE = re.compile(r"^\d+\.*$")
_NAG_RE = re.compile(r"^\$\d+$")
_ANNOT_RE = re.compile(r"[!?]+$")


def _strip_blocks(text: str) -> str:
    """Remove `{...}` comments (non-nesting) and `(...)` variations
    (nesting) in one linear scan; also drops `;` rest-of-line comments."""
    out: list[str] = []
    brace = 0
    paren = 0
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if brace:
            if ch == "}":
                brace = 0
            i += 1
            continue
        if ch == "{":
            brace = 1
            i += 1
            continue
        if paren:
            if ch == "(":
                paren += 1
            elif ch == ")":
                paren -= 1
            i += 1
            continue
        if ch == "(":
            paren = 1
            i += 1
            continue
        if ch == ";":  # line comment
            j = text.find("\n", i)
            i = n if j < 0 else j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _normalize_one(raw: str | None) -> str | None:
    if raw is None:
        return None
    # PGN escape mechanism: a line whose FIRST char is '%' is ignored wholesale
    if "%" in raw:
        raw = "\n".join(line for line in raw.split("\n") if not line.startswith("%"))
    stripped = _strip_blocks(raw)
    plies: list[str] = []
    for tok in stripped.split():
        if tok in _RESULT_TOKENS or _MOVE_NUM_RE.match(tok) or _NAG_RE.match(tok):
            continue
        # '1.e4' / '12...Nf6' glued forms
        m = re.match(r"^(\d+)\.+(.+)$", tok)
        if m:
            tok = m.group(2)
        tok = _ANNOT_RE.sub("", tok)
        if tok:
            plies.append(tok)
    parts: list[str] = []
    for k, ply in enumerate(plies):
        if k % 2 == 0:
            parts.append(f"{k // 2 + 1}.")
        parts.append(ply)
    return " ".join(parts)


@F.pandas_udf(StringType())
def moves_normalize(s: pd.Series) -> pd.Series:
    return s.map(_normalize_one)


# --- timecontrol_normalize -------------------------------------------------

# PGN TimeControl grammar, per field ':'-separated:
#   '?' unknown | '-' none | '*'secs sandclock | secs sudden-death
#   | moves'/'secs | base'+'inc | moves'/'secs'+'inc
_TC_FIELD = r"(\?|-|\*\d+|\d+(/\d+)?(\+\d+)?)"
_TC_RE = f"^{_TC_FIELD}(:{_TC_FIELD})*$"


def timecontrol_normalize(col: Column | str) -> Column:
    """Canonical TimeControl: whitespace stripped; NULL unless the compacted
    value matches the PGN grammar. Pure Column expr — stays in codegen."""
    c = F.col(col) if isinstance(col, str) else col
    from chess_lakehouse_spark.functions.text import WS_SPLIT

    compact = F.regexp_replace(c, WS_SPLIT, "")
    return F.when(compact.rlike(_TC_RE), compact).otherwise(F.lit(None).cast("string"))


def opening_ply(uci_col: Column | str) -> Column:
    """Ply count of an opening line = length of its UCI move list
    (reference: array_length(string_split(uci, ' ')) at src/find-openings.ts:65)."""
    c = F.col(uci_col) if isinstance(uci_col, str) else uci_col
    return F.size(F.split(c, " ", -1))
