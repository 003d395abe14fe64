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

_ALL_QUERIES = {**core.QUERIES, **chess.QUERIES, **mm.QUERIES, **llm.QUERIES}
_ALL_ORACLES = {**core.ORACLES, **chess.ORACLES, **mm.ORACLES, **llm.ORACLES}

# The driver's correctness harness records exactly the FIRST 50 entries of
# queries() in dict-iteration order, so the window must be budgeted like a
# scarce resource.  Priority (see VERDICT r02 "Next round #1"):
#   1. the 7 queries that have never had a driver oracle row in any round,
#   2. the 8 queries that were green in r01 but fell outside r02's window,
#   3. the 9 queries whose only green row is r02, plus the rows-only
#      approx_stats check,
#   4. 25 of the 40 queries already hash-green in BOTH r01 and r02.
# The 15 left outside the window are all double-verified (r01 AND r02)
# simple relational queries; scripts/verify_local.py still runs the full
# suite and its output is committed per round as VERIFY_LOCAL_r{N}.txt.
_WINDOW_ORDER = [
    # never driver-verified (r01, r02)
    "text_normalize",
    "tfidf_cosine",
    "contamination_ngram",
    "pack_sequences",
    "lm_score",
    "doc_chunks",
    "knn_quantized",
    # green in r01 only (fell outside r02's window)
    "doc_fingerprint",
    "source_stats_pandas",
    "text_langid",
    "text_quality",
    "tfidf",
    "token_count",
    "udaf_gmean",
    "udtf_bigrams",
    # green in r02 only
    "collect_set",
    "mm_decode_meta",
    "mm_frame_sample",
    "dedup_incremental",
    "knn_ivf_kmeans",
    "sample_hash",
    "sample_mix",
    "split_contamination",
    "repetition_metrics",
    "approx_stats",  # rows-only by design (no SQL-expressible oracle)
    # double-green (r01 and r02); the intricate operators stay in-window
    "enrich_argmax",
    "lateral_topk",
    "chess_enrich",
    "chess_export",
    "merge_update",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "pipeline_clean_corpus",
    "knn_brute_force",
    "knn_lsh",
    "knn_ivf",
    "asof_join",
    "join_star",
    "supplier_revenue",
    "groupby_agg",
    "scalar_kitchen",
    "events_hourly",
    "json_extract",
    "export_projection",
    "filter_null_predicate",
]

QUERIES = {name: _ALL_QUERIES[name] for name in _WINDOW_ORDER}
QUERIES.update(
    (name, fn) for name, fn in sorted(_ALL_QUERIES.items()) if name not in QUERIES
)
ORACLES = {name: _ALL_ORACLES[name] for name in QUERIES if name in _ALL_ORACLES}
