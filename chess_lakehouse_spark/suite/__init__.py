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
- Oracle outputs must be explicitly cast: DuckDB widens integer SUM (plain
  AND windowed) to HUGEINT (int128), which the driver's value-hasher
  represents differently from Spark's BIGINT even when values are equal —
  wrap every integer SUM in CAST(... AS BIGINT). The full allowlist of
  driver-safe oracle output types is {BIGINT, INTEGER, DOUBLE, VARCHAR,
  BOOLEAN}, enforced by tests/test_oracle_types.py (r4 postmortem:
  chunk_dedup / dq_check / budget_sample).

The three cross-engine portability pillars these rules rest on are each
sweep-tested in tests/test_llm_ops.py: the md5-derived 60-bit hash
(Spark conv == DuckDB CAST hex), the sequential double fold
(F.aggregate == list_dot_product, bit-identical), and ROUND(ln(int
ratio), 6).
"""

from __future__ import annotations

from chess_lakehouse_spark.suite import chess, core, llm, mm

_ALL_QUERIES = {**core.QUERIES, **chess.QUERIES, **mm.QUERIES, **llm.QUERIES}
_ALL_ORACLES = {**core.ORACLES, **chess.ORACLES, **mm.ORACLES, **llm.ORACLES}

# The driver's correctness harness records exactly the FIRST 50 entries of
# queries() in dict-iteration order, so the window must be budgeted like a
# scarce resource. Round-5 priority:
#   1. the 3 queries driver-red in r04 (oracle HUGEINT, fixed this round
#      with explicit CAST ... AS BIGINT) — they lead the window,
#   2. approx_stats, rows-only by design and never yet in a recorded window,
#   3. all 34 queries whose newest green row is r03 (out of r04's window) —
#      rotated back in so no query's newest green falls >1 round behind,
#   4. the 9 queries NEW this round (sample_temperature, winsorize,
#      canary_scan, source_kl, knn_two_stage, rolling_avg,
#      activity_islands, token_entropy, dup_matrix) — never
#      driver-verified,
#   5. 3 of the 17 r04-new single-green queries (dedup_priority /
#      split_leakage_safe gained the components= reuse path this round so
#      they must re-verify; dedup_semantic is the most intricate); the
#      remaining 14 single-green-r04 queries rotate in next round —
#      allowed out-of-window because r04 (the latest recorded round) has
#      them green.
# Every query outside the window is hash-green in the LATEST recorded
# driver round or in >=2 prior rounds (tests/test_suite_order.py derives
# and enforces this from the recorded CORRECTNESS files) AND in
# scripts/verify_local.py's full-suite run, committed per round as
# VERIFY_LOCAL_r{N}.txt.
# r6 window planning (for the next round's rotation): (1) the 14 queries
# whose only green row is r04 (they sat out r5's window) rotate in first;
# (2) this round's 12 window debutants (the 3 HUGEINT re-verifies, the 9
# r5-new) need their r5 rows confirmed before rotating out; (3) candidate
# NEW oracle-gated queries with implementations already pytest-pinned this
# round: dsir_topk and bm25_topk — their DuckDB oracles are ALREADY
# written and parity-pinned (tests/test_dsir.py:_DSIR_ORACLE_TPL,
# tests/test_bm25.py:_BM25_ORACLE_TPL — lift verbatim, parametrized);
# also rrf_fuse (trivial SQL), zorder/cluster layout reads
# (operators/publish.py), bpe_train merge list (functions/bpe.py —
# unrolled-CTE oracle like knn_ivf_kmeans's).
_WINDOW_ORDER = [
    # driver-red in r04 (oracle HUGEINT) — fixed, re-verify first
    "chunk_dedup",
    "dq_check",
    "budget_sample",
    # rows-only by design; never yet inside a recorded window
    "approx_stats",
    # newest green row r03 — rotate back in
    "supplier_revenue",
    "chess_export",
    "dedup_exact",
    "events_hourly",
    "export_projection",
    "filter_null_predicate",
    "groupby_agg",
    "join_star",
    "json_extract",
    "lateral_topk",
    "merge_update",
    "scalar_kitchen",
    "asof_join",
    "text_langid",
    "text_quality",
    "tfidf",
    "token_count",
    "udaf_gmean",
    "udtf_bigrams",
    "source_stats_pandas",
    "doc_fingerprint",
    "mm_frame_sample",
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
    # new in r05 — never driver-verified
    "sample_temperature",
    "winsorize",
    "canary_scan",
    "source_kl",
    "knn_two_stage",
    "rolling_avg",
    "activity_islands",
    "token_entropy",
    "dup_matrix",
    # single-green (r04 only): changed this round / most intricate
    "dedup_priority",
    "split_leakage_safe",
    "dedup_semantic",
]

QUERIES = {name: _ALL_QUERIES[name] for name in _WINDOW_ORDER}
QUERIES.update(
    (name, fn) for name, fn in sorted(_ALL_QUERIES.items()) if name not in QUERIES
)
ORACLES = {name: _ALL_ORACLES[name] for name in QUERIES if name in _ALL_ORACLES}
