r"""The oracle-gated query suite.

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
# two-phase on it: evidence within the revisit bound before that round's
# CORRECTNESS file lands, one round looser after, so pytest is green on
# both sides of a driver run).
#
# Revisit-period math (r8, the first round the suite exceeds 100 gated
# queries): with N non-rows-only registered queries and a 50-slot window,
# round-robin rotation revisits every query within P = ceil(N / 50)
# rounds. At N = 105 (106 registered minus approx_stats) P = 3, so the
# ratchet bound — enforced by tests/test_suite_order.py dynamically from
# the recorded CORRECTNESS files — is: NO query's newest hash-green row
# may age more than P - 1 = 2 recorded rounds behind the latest file
# (out-of-window queries strictly; in-window queries are refreshed by the
# budgeted run itself).
#
# Round-8 window priority:
#   1. the 5 queries NEW to the gate, never driver-verified — dedup_span
#      (ExactSubstr, Lee et al. 2021), quality_gopher (Rae et al. 2021
#      rule battery with stop-hit case/punct normalization), bm25_batch
#      (one-pass batch scoring), corpus_sketch_counts (HLL sketch path,
#      exact-column projection), url_canonical (C4/RefinedWeb URL
#      canonicalize + host cap, built new in r8). The first four oracles
#      were promoted from tests/ into suite/llm.py at registration (the
#      bm25_topk anti-divergence pattern: tests import the suite
#      template) after exact value parity in tests/test_r8_candidates.py;
#      url_canonical's oracle is generated from the SAME regex constants
#      the Spark chain compiles (suite/llm.py:_URL_CANON_CORE) and
#      parity-pinned in tests/test_urls.py.
#   2. 45 of the 50 queries whose newest green row is r06 — rotated back
#      in. The remaining 5 r6-green queries (qc_count, semi_join,
#      sort_limit, union_append, window_topk — the five cheapest,
#      most-stable relational ops) defer to the FRONT of the r9 window;
#      their age at r8-commit time is latest - 1 = within the P - 1 bound.
# Every query outside the window is hash-green in r07 or r06 (within the
# bound) AND in scripts/verify_local.py's full-suite run, committed per
# round as VERIFY_LOCAL_r{N}.txt at both sf0.01 and sf0.1.
#
# r9 window planning — FIRST bump WINDOW_BUDGETED_FOR to 9 when
# re-planning: (1) any never-verified queries registered at the re-plan
# go first — three staged candidates are ready, each with a suite-defined
# oracle, two-scale exact parity, a cold-JVM ANSI run, and the
# type-allowlist guard: q_lm_staged / LM_STAGED_ORACLE (register as
# `lm_staged`; tests/test_lm_staged.py), q_pii_scan / PII_SCAN_ORACLE
# (register as `pii_scan`; tests/test_pii_scan.py), and q_html_strip /
# HTML_STRIP_ORACLE (register as `html_strip`; tests/test_strip_html.py);
# (2) then the 5 deferred r6-green queries (listed above) — they will be
# at the P - 1 age bound; (3) then the stalest r7-green queries to fill
# the window; the youngest r7-green queries defer to r10 exactly as this
# round's 5 defer to r9.
WINDOW_BUDGETED_FOR = 8

_WINDOW_ORDER = [
    # new to the gate in r08 — never driver-verified
    "dedup_span",
    "quality_gopher",
    "bm25_batch",
    "corpus_sketch_counts",
    "url_canonical",
    # newest green row r06 — rotate back in
    "bm25_topk",
    "rrf_fuse",
    "dsir_topk",
    "lake_skipping_read",
    "bpe_train",
    "dedup_minhash_lsh",
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
    "quality_buckets",
    "range_join",
    "repetition_metrics",
    "rollup",
    "running_sum",
    "sample_hash",
    "sample_mix",
    "sample_per_group",
    "sample_weighted",
    "sessionize",
    "shipping_priority",
    "split_contamination",
    "text_normalize",
    "tfidf_cosine",
    "user_retention",
    "vocab_topk",
]

QUERIES = {name: _ALL_QUERIES[name] for name in _WINDOW_ORDER}
QUERIES.update(
    (name, fn) for name, fn in sorted(_ALL_QUERIES.items()) if name not in QUERIES
)
ORACLES = {name: _ALL_ORACLES[name] for name in QUERIES if name in _ALL_ORACLES}
