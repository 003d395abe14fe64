"""Chess-domain queries: the reference's actual pipeline semantics, gated
against the oracle with inline fixture data (FIXTURES.md §B) so the exact
LATERAL-argmax / export semantics are hash-compared, not just a surrogate.

Filled in with the chess domain layer (SURVEY.md §7 step 6).
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
