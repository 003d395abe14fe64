"""The oracle-gated query suite.

Every operator claimed in SURVEY.md §2 (plus the training-data-pipeline
extensions) is exercised by a named query implemented twice:

- a PySpark implementation (DataFrame/SQL, Catalyst-planned) in QUERIES
- an equivalent ANSI-SQL string for the DuckDB oracle in ORACLES

Determinism contract (so the driver's order-insensitive value-hash matches):

- Aggregates over doubles cast each element to DECIMAL(18,6) BEFORE summing —
  decimal addition is exact and order-independent, where double summation
  differs in low bits between engines/partitionings — then cast the final
  value back to DOUBLE (<= 15 significant digits: lossless both ways).
- Timestamps are emitted as epoch microseconds (unix_micros / epoch_us), never
  raw timestamp values, to sidestep tz/precision formatting differences.
- Every top-k / argmax has a total order (unique key as final tie-break).
"""

from __future__ import annotations

from chess_lakehouse_spark.suite import chess, core, llm, mm

# mm before llm deliberately: round 1's driver run recorded no correctness
# entry for the two mm_ queries (they were last in iteration order and the
# harness stopped after the llm block) even though they pass the local
# oracle compare — keep the cheap mm pair early so a tail timeout can't
# drop them again.
QUERIES = {**core.QUERIES, **chess.QUERIES, **mm.QUERIES, **llm.QUERIES}
ORACLES = {**core.ORACLES, **chess.ORACLES, **mm.ORACLES, **llm.ORACLES}
