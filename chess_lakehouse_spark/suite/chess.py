"""Chess-domain queries: the reference's actual pipeline semantics, gated
against the DuckDB oracle with inline fixture data (FIXTURES.md §B) so the
exact LATERAL-argmax / normalizer / export semantics are hash-compared —
not just the part-table surrogate.

The Spark side runs the REAL engine code (moves_normalize pandas UDF,
enrich(), export_combined()); the oracle recomputes the same result in pure
SQL from the same literals, with the normalizer's expected outputs inlined
(the UDF itself is pinned by tests/test_chess_functions.py property tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chess_lakehouse_spark.functions.chess import moves_normalize, timecontrol_normalize
from chess_lakehouse_spark.plans.pipeline import enrich, export_combined
from chess_lakehouse_spark.session import apply_runtime_conf, local_df

# (Event, raw movetext, pre-set ECO, pre-set Opening)
_GAMES = [
    # multi-opening match: B10 (2 ply) vs B12 (5 ply) → longest wins
    ("g1", "1. e4 {best by test} c6!? 2. d4 d5 3. e5 e6 1-0", None, None),
    # dirty movetext: variations + glued numbers; matches C20 vs C40 → C40
    ("g2", "1.e4 e5 2.Nf3 Nc6 (2... d6 3. d4) 0-1", None, None),
    # equal-ply tie A40/A41 → A40 by eco ASC
    ("g3", "1. d4 d5 2. c4 *", None, None),
    # no match → NULLs preserved
    ("g4", "1. h4 h5 *", None, None),
    # pre-enriched row: must NOT be touched (src/find-openings.ts:68)
    ("g5", "1. e4 c6 1-0", "E00", "Existing Opening"),
]

# Expected clean_movetext per game — the oracle's copy of what the
# normalizer must produce (hash-compared against the UDF output).
_CLEAN = {
    "g1": "1. e4 c6 2. d4 d5 3. e5 e6",
    "g2": "1. e4 e5 2. Nf3 Nc6",
    "g3": "1. d4 d5 2. c4",
    "g4": "1. h4 h5",
    "g5": "1. e4 c6",
}

_OPENINGS = [
    ("B10", "Caro-Kann Defense", "1. e4 c6", "e2e4 c7c6"),
    ("B12", "Caro-Kann Defense: Advance Variation", "1. e4 c6 2. d4 d5 3. e5", "e2e4 c7c6 d2d4 d7d5 e4e5"),
    ("C20", "King's Pawn Game", "1. e4 e5", "e2e4 e7e5"),
    ("C40", "King's Knight Opening", "1. e4 e5 2. Nf3", "e2e4 e7e5 g1f3"),
    ("A40", "Queen's Pawn Game", "1. d4 d5", "d2d4 d7d5"),
    ("A41", "Queen's Pawn Game: Alt", "1. d4 d5", "d2d4 d7d5"),
]


def _sql_quote(v: str | None) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + v.replace("'", "''") + "'"


def _games_values() -> str:
    return ",\n            ".join(
        f"({_sql_quote(e)}, {_sql_quote(_CLEAN[e])}, {_sql_quote(eco)}, {_sql_quote(op)})"
        for e, _raw, eco, op in _GAMES
    )


def _openings_values() -> str:
    return ",\n            ".join(
        f"({_sql_quote(a)}, {_sql_quote(b)}, {_sql_quote(c)}, {_sql_quote(d)})"
        for a, b, c, d in _OPENINGS
    )


def q_chess_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline's enrichment stage end-to-end on fixture games:
    normalize raw movetext (chess_moves_normalize, src/read-pgn.ts:48), then
    fill eco/Opening for NULL-Opening rows via the argmax contains-join
    (src/find-openings.ts:58-82) with deterministic tie-break."""
    apply_runtime_conf(spark)
    games = local_df(
        spark, _GAMES, "Event string, movetext string, ECO string, Opening string"
    ).withColumn("clean_movetext", moves_normalize("movetext"))
    openings = local_df(spark, _OPENINGS, "eco string, name string, pgn string, uci string")
    out = enrich(games, openings, "FixtureSource")
    return out.select("Event", "clean_movetext", "ECO", "Opening", "DataSource")


ORACLE_CHESS_ENRICH = f"""
    WITH games(Event, clean_movetext, ECO0, Opening0) AS (VALUES
            {{games}}),
         openings(eco, name, pgn, uci) AS (VALUES
            {{openings}}),
         ply AS (
            SELECT eco, name, pgn,
                   CAST(len(string_split(uci, ' ')) AS INT) AS ply
            FROM openings),
         matched AS (
            SELECT g.Event, g.clean_movetext,
                   CASE WHEN g.Opening0 IS NULL THEN COALESCE(o.eco, g.ECO0) ELSE g.ECO0 END AS ECO,
                   CASE WHEN g.Opening0 IS NULL THEN o.name ELSE g.Opening0 END AS Opening
            FROM games g
            LEFT JOIN LATERAL (
                SELECT p.eco, p.name FROM ply p
                WHERE contains(g.clean_movetext, p.pgn)
                ORDER BY p.ply DESC, p.eco ASC, p.name ASC
                LIMIT 1
            ) o ON TRUE)
    SELECT Event, clean_movetext, ECO, Opening, 'FixtureSource' AS DataSource FROM matched
"""

# (Event, UTCDate, WhiteElo, TimeControl, DataSource) — export-stage fixture:
# NULL date and pre-1500 date must drop; '?' Elo casts to NULL; bad TC falls
# back to the raw tag (COALESCE, src/export-to-parquet.ts:85).
_EXPORT_ROWS = [
    ("e1", "2021.01.31", "2700", "600+5", "SrcA"),
    ("e2", "2021.02.01", "?", "bogus tc", "SrcA"),
    ("e3", None, "2500", "300", "SrcA"),
    ("e4", "1475.06.15", "2400", "-", "SrcB"),
    ("e5", "1997.12.09", "2100", " 40/7200 : 3600 ", "SrcB"),
]


def q_chess_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export stage's projection semantics on fixture rows: date parse +
    hygiene filter (src/export-to-parquet.ts:92-93), Elo int cast, TimeControl
    normalize-or-fallback, year/month derivation (:89-90)."""
    apply_runtime_conf(spark)
    games = local_df(
        spark,
        _EXPORT_ROWS,
        "Event string, UTCDate string, WhiteElo string, TimeControl string, DataSource string",
    ).withColumn("clean_timecontrol", timecontrol_normalize("TimeControl"))
    # NULL-fill the rest of the games schema (additive evolution, §2.4).
    for c in (
        "Site", "White", "Black", "Result", "WhiteTitle", "BlackTitle",
        "BlackElo", "UTCTime", "ECO", "Opening", "Termination", "Source", "movetext",
    ):
        games = games.withColumn(c, F.lit(None).cast("string"))
    exported = export_combined([games])
    return exported.select(
        "Event",
        F.col("UTCDate").cast("string").alias("UTCDate"),
        "WhiteElo",
        "TimeControl",
        "DataSource",
        "year",
        "month",
    )


def _export_values() -> str:
    return ",\n            ".join(
        f"({_sql_quote(e)}, {_sql_quote(d)}, {_sql_quote(w)}, {_sql_quote(tc)}, {_sql_quote(src)})"
        for e, d, w, tc, src in _EXPORT_ROWS
    )


_TC_FIELD_SQL = r"(\?|-|\*\d+|\d+(/\d+)?(\+\d+)?)"
_TC_RE_SQL = f"^{_TC_FIELD_SQL}(:{_TC_FIELD_SQL})*$"

ORACLE_CHESS_EXPORT = f"""
    WITH games(Event, UTCDate, WhiteElo, TimeControl, DataSource) AS (VALUES
            {{rows}}),
         parsed AS (
            SELECT *,
                   CAST(try_strptime(UTCDate, '%Y.%m.%d') AS DATE) AS d,
                   regexp_replace(TimeControl, '[ \t\n\r\f\x0B]+', '', 'g') AS tc_compact
            FROM games)
    SELECT Event,
           CAST(d AS VARCHAR) AS UTCDate,
           TRY_CAST(WhiteElo AS INT) AS WhiteElo,
           CASE WHEN regexp_matches(tc_compact, '{{tc_re}}') THEN tc_compact ELSE TimeControl END AS TimeControl,
           DataSource,
           CAST(year(d) AS INT) AS year,
           strftime(d, '%m') AS month
    FROM parsed
    WHERE d IS NOT NULL AND year(d) >= 1500
"""


QUERIES = {
    "chess_enrich": q_chess_enrich,
    "chess_export": q_chess_export,
}

ORACLES = {
    "chess_enrich": ORACLE_CHESS_ENRICH.format(
        games=_games_values(), openings=_openings_values()
    ),
    "chess_export": ORACLE_CHESS_EXPORT.format(rows=_export_values(), tc_re=_TC_RE_SQL),
}
