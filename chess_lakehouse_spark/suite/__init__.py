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
# scarce resource. Round-4 priority:
#   1. the 21 queries new this round (never driver-verified),
#   2. the 15 simple relational queries that fell outside r03's window
#      (their newest green row is r02 — rotate them back in),
#   3. as many r03-only single-green operators as fit the remaining slots.
# Every query outside the window is hash-green in at least two prior
# driver rounds (tests/test_suite_order.py derives and enforces this from
# the recorded CORRECTNESS files) AND in scripts/verify_local.py's
# full-suite run, committed per round as VERIFY_LOCAL_r{N}.txt.
_WINDOW_ORDER = [
    # new in r04 — never driver-verified
    "dedup_semantic",
    "boilerplate_strip",
    "vocab_topk",
    "quality_buckets",
    "label_centroids",
    "sample_per_group",
    "dedup_priority",
    "chunk_dedup",
    "lm_score_bigram",
    "corpus_delta",
    "event_outliers",
    "pmi_topk",
    "dq_check",
    "shipping_priority",
    "budget_sample",
    "embedding_drift",
    "user_retention",
    "event_funnel",
    "sample_weighted",
    "split_leakage_safe",
    # outside r03's window (newest green row: r02) — rotate back in
    "anti_join",
    "cube",
    "distinct_agg",
    "except",
    "intersect",
    "pivot",
    "qc_count",
    "range_join",
    "rollup",
    "running_sum",
    "semi_join",
    "sessionize",
    "sort_limit",
    "union_append",
    "window_topk",
    # single-green (r03 only) — keep evidence accumulating
    "text_normalize",
    "tfidf_cosine",
    "contamination_ngram",
    "pack_sequences",
    "lm_score",
    "doc_chunks",
    "knn_quantized",
    "dedup_incremental",
    "knn_ivf_kmeans",
    "sample_hash",
    "sample_mix",
    "split_contamination",
    "repetition_metrics",
    "collect_set",
    "mm_decode_meta",
    "mm_frame_sample",
    "doc_fingerprint",
    "source_stats_pandas",
    "text_langid",
    "text_quality",
    "tfidf",
    "token_count",
    "udaf_gmean",
    "udtf_bigrams",
    "approx_stats",  # rows-only by design (no SQL-expressible oracle)
    # multi-green intricate operators, cost-descending
    "dedup_ngram_jaccard",
    "pipeline_clean_corpus",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_simhash_pairs",
    "dedup_simhash",
    "knn_ivf",
    "knn_lsh",
    "knn_brute_force",
    "enrich_argmax",
    "chess_enrich",
]

QUERIES = {name: _ALL_QUERIES[name] for name in _WINDOW_ORDER}
QUERIES.update(
    (name, fn) for name, fn in sorted(_ALL_QUERIES.items()) if name not in QUERIES
)
ORACLES = {name: _ALL_ORACLES[name] for name in QUERIES if name in _ALL_ORACLES}
