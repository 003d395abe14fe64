"""Training-data-pipeline queries: dedup, similarity search, text analysis
over documents/embeddings. Filled in per SURVEY.md §7 step 8."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
