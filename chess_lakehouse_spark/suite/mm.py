"""Multimodal-column queries: binary payload plumbing (decode/feature
stubs over mapInPandas). Filled in per SURVEY.md §7 step 8."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
