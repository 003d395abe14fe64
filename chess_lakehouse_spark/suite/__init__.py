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
- MEANS of decimal sums must round in exact integer arithmetic
  (functions/exact.py sum6_long + mean6; SQL twins _sum6_sql/_mean6_sql
  in suite/llm.py), never ``ROUND(double_sum / n, 6)``: a quotient
  landing exactly on a half at the 7th decimal (data-dependent; first hit
  at sf0.1 in label_centroids) is resolved differently by Spark's
  BigDecimal-HALF_UP and DuckDB's floating round(). Every sum-then-divide
  mean in the suite uses the integer form (centroids, lm scores, rolling
  time mean, z-score group means, avg_chars, pandas source stats).
  Residual accepted risk: ROUND of a transcendental output (ln/sqrt/pow
  chains) can still diverge if the double lands within an ulp of a
  6-decimal half — not integer-izable; measure-near-zero and unobserved
  at either verified scale.
- Oracle outputs must be explicitly cast: DuckDB widens integer SUM (plain
  AND windowed) to HUGEINT (int128), which the driver's value-hasher
  represents differently from Spark's BIGINT even when values are equal —
  wrap every integer SUM in CAST(... AS BIGINT). The full allowlist of
  driver-safe oracle output types is {BIGINT, INTEGER, DOUBLE, VARCHAR,
  BOOLEAN}, enforced by tests/test_oracle_types.py (r4 postmortem:
  chunk_dedup / dq_check / budget_sample).

The cross-engine portability pillars these rules rest on are each
sweep-tested: the md5-derived 60-bit hash (Spark conv == DuckDB CAST
hex), the sequential double fold (F.aggregate == list_dot_product,
bit-identical), ROUND(ln(int ratio), 6) (tests/test_llm_ops.py), and
whitespace tokenization via the EXPLICIT class functions/text.py:WS_SPLIT
— never ``\s``, whose Java-vs-RE2 definitions diverge on exactly U+000B
(full-codepoint sweep in tests/test_tokenization_parity.py).
"""

from __future__ import annotations

from chess_lakehouse_spark.suite import chess, core, llm, mm

_ALL_QUERIES = {**core.QUERIES, **chess.QUERIES, **mm.QUERIES, **llm.QUERIES}
_ALL_ORACLES = {**core.ORACLES, **chess.ORACLES, **mm.ORACLES, **llm.ORACLES}

# The driver's correctness harness records exactly the FIRST 50 entries of
# queries() in dict-iteration order, so the window must be budgeted like a
# scarce resource. WINDOW_BUDGETED_FOR names the driver round this window
# plans for (the staleness ratchet in tests/test_suite_order.py is
# two-phase on it: strict latest-round evidence before that round's
# CORRECTNESS file lands, latest-or-previous after, so pytest is green on
# both sides of a driver run). Round-7 priority:
#   1. the 2 queries NEW to the gate, never driver-verified —
#      paragraph_dedup (C4/RefinedWeb first-occurrence pass; window-rank
#      oracle promoted from tests/test_shuffle_paragraphs.py, which now
#      imports the suite template so they cannot diverge) and
#      shard_assignments (deterministic md5-permutation shard/pos layout —
#      the same portable-hash pillar as every sampling oracle),
#   2. all 48 queries whose newest green row is r05 (the 49-query r5
#      window minus approx_stats, rows-only by design) — rotated back in
#      so no query's newest green evidence falls more than one recorded
#      round behind.
# Every query outside the window is hash-green in the LATEST recorded
# driver round (r06: 50/50 hash-green) AND in scripts/verify_local.py's
# full-suite run, committed per round as VERIFY_LOCAL_r{N}.txt (r7: both
# sf0.01 and sf0.1).
# r8 window planning — FIRST bump WINDOW_BUDGETED_FOR to 8 when
# re-planning (the ratchet asserts it is never more than one round ahead
# of the recorded CORRECTNESS files): (1) the 48 queries green only in r6
# (the 50-query r6 window minus paragraph_dedup/shard_assignments' slots'
# donors — i.e. the r6 window) rotate in; (2) the remaining slots go to
# new gated queries. Candidates with oracles ALREADY written and
# parity-pinned, in priority order:
#   1. bm25_batch (tests/test_bm25.py:_BM25_BATCH_ORACLE_TPL; its
#      query-vocabulary broadcast hint was dropped in r7 ahead of gating),
#   2. dedup_span — duplicate_span_dedup, the ExactSubstr pass
#      (tests/test_span_dedup.py:SPAN_DEDUP_ORACLE_TPL),
#   3. quality_gopher — gopher_rules with the fixture-tuned thresholds
#      (tests/test_gopher.py:GOPHER_ORACLE / gopher_oracle()).
# All three templates were additionally exercised against the engine at
# sf0.1 in r7 (5000-row corpora; bm25_batch with 20 queries) — MATCH.
# The query FUNCTIONS (q_dedup_span / q_quality_gopher / q_bm25_batch)
# are already in suite/llm.py with GATING-FORM oracles proven in
# tests/test_r8_candidates.py (self-contained SQL, driver-safe types,
# exact value parity at sf0.001): registration is a dict+window edit.
WINDOW_BUDGETED_FOR = 7

_WINDOW_ORDER = [
    # new to the gate in r07 — never driver-verified
    "paragraph_dedup",
    "shard_assignments",
    # newest green row r05 — rotate back in
    "chunk_dedup",
    "dq_check",
    "budget_sample",
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
    "dedup_embedding_cosine",
    "dedup_simhash_pairs",
    "dedup_simhash",
    "knn_ivf",
    "knn_lsh",
    "knn_brute_force",
    "enrich_argmax",
    "chess_enrich",
    "sample_temperature",
    "winsorize",
    "canary_scan",
    "source_kl",
    "knn_two_stage",
    "rolling_avg",
    "activity_islands",
    "token_entropy",
    "dup_matrix",
    "dedup_priority",
    "split_leakage_safe",
    "dedup_semantic",
]

QUERIES = {name: _ALL_QUERIES[name] for name in _WINDOW_ORDER}
QUERIES.update(
    (name, fn) for name, fn in sorted(_ALL_QUERIES.items()) if name not in QUERIES
)
ORACLES = {name: _ALL_ORACLES[name] for name in QUERIES if name in _ALL_ORACLES}
