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
# both sides of a driver run). Round-6 priority:
#   1. the 5 queries NEW this round, never driver-verified — bm25_topk /
#      rrf_fuse (oracles promoted verbatim from the r5 parity pins in
#      tests/test_bm25.py), dsir_topk (tests/test_dsir.py),
#      lake_skipping_read (clustered write -> skipping manifest -> pruned
#      read, values vs the raw table; pruning pinned by
#      tests/test_clustering.py inputFiles() asserts), and bpe_train
#      (unrolled-CTE oracle replaying every merge round, pinned vs both
#      Spark and pure Python in tests/test_bpe.py),
#   2. dedup_minhash_lsh — re-verify: its code changed this round (LSH
#      bucket cap default). tfidf's broadcast-hint drop is plan-level
#      only (values re-verified in VERIFY_LOCAL_r06.txt); it stays out,
#      green in r5,
#   3. all 44 queries whose newest green row is r04 (they sat out r5's
#      window) — rotated back in so no query's newest green evidence falls
#      more than one recorded round behind.
# Every query outside the window is hash-green in the LATEST recorded
# driver round (r05: 49 hash-green + approx_stats rows-only) AND in
# scripts/verify_local.py's full-suite run, committed per round as
# VERIFY_LOCAL_r{N}.txt.
# r7 window planning — FIRST bump WINDOW_BUDGETED_FOR to 7 when
# re-planning (the ratchet asserts it is never more than one round ahead
# of the recorded CORRECTNESS files): (1) the 48 queries green only in r5 (the 49-query
# r5 window minus dedup_minhash_lsh, which re-verifies in r6) rotate in;
# (2) that leaves 2 slots for new gated queries. Standing candidates with
# oracles ALREADY written and parity-pinned this round
# (tests/test_shuffle_paragraphs.py): paragraph_dedup (window-rank
# first-occurrence oracle) and shard_assignments (md5-permutation
# shard/pos — SELECT over the same portable hash pillar); also
# bm25_batch (tests/test_bm25.py:_BM25_BATCH_ORACLE_TPL, parity-pinned
# on the fixture corpus) if a slot frees up.
WINDOW_BUDGETED_FOR = 6

_WINDOW_ORDER = [
    # new in r06 — never driver-verified
    "bm25_topk",
    "rrf_fuse",
    "dsir_topk",
    "lake_skipping_read",
    "bpe_train",
    # re-verify: implementation changed in r06 (LSH bucket cap default)
    "dedup_minhash_lsh",
    # newest green row r04 — rotate back in
    "anti_join",
    "boilerplate_strip",
    "collect_set",
    "contamination_ngram",
    "corpus_delta",
    "cube",
    "dedup_incremental",
    "distinct_agg",
    "doc_chunks",
    "embedding_drift",
    "event_funnel",
    "event_outliers",
    "except",
    "intersect",
    "knn_ivf_kmeans",
    "knn_quantized",
    "label_centroids",
    "lm_score",
    "lm_score_bigram",
    "mm_decode_meta",
    "pack_sequences",
    "pivot",
    "pmi_topk",
    "qc_count",
    "quality_buckets",
    "range_join",
    "repetition_metrics",
    "rollup",
    "running_sum",
    "sample_hash",
    "sample_mix",
    "sample_per_group",
    "sample_weighted",
    "semi_join",
    "sessionize",
    "shipping_priority",
    "sort_limit",
    "split_contamination",
    "text_normalize",
    "tfidf_cosine",
    "union_append",
    "user_retention",
    "vocab_topk",
    "window_topk",
]

QUERIES = {name: _ALL_QUERIES[name] for name in _WINDOW_ORDER}
QUERIES.update(
    (name, fn) for name, fn in sorted(_ALL_QUERIES.items()) if name not in QUERIES
)
ORACLES = {name: _ALL_ORACLES[name] for name in QUERIES if name in _ALL_ORACLES}
